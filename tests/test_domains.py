"""Round-11 domain-tier unit tests (verdict item 7): URL canonicalization
spec edges, registered-domain label logic, gating in both literal-IN and
broadcast-join forms, and URL-canonical dedup determinism. The corpus-level
rollup is driver-strength checked by ``domain_stats_docs``' DuckDB hash;
these cover the branches a 40-group rollup can't isolate."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from etl_data_transformer_spark.functions.urls import (
    canonicalize_url,
    registered_domain,
    url_host,
)
from etl_data_transformer_spark.operators.domains import (
    domain_gate,
    domain_stats,
    url_dedup,
    url_dedup_groups,
)

CANON_CASES = [
    # (raw, canonical) — one per spec clause in functions/urls.py
    ("HTTPS://WWW.Example.COM/a/", "https://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    ("https://example.com/a#frag", "https://example.com/a"),
    ("https://example.com/a?utm_source=x&b=2&a=1", "https://example.com/a?a=1&b=2"),
    ("https://example.com/a?gclid=z&fbclid=y&ref=h", "https://example.com/a"),
    ("https://example.com/", "https://example.com"),
    ("https://example.com///", "https://example.com"),
    ("https://example.com/a?z=9&utm_campaign=c&a=1#f", "https://example.com/a?a=1&z=9"),
]


def test_canonicalize_spec(spark):
    df = spark.createDataFrame([(r,) for r, _ in CANON_CASES], ["url"])
    got = [r[0] for r in df.select(canonicalize_url("url")).collect()]
    assert got == [c for _, c in CANON_CASES]


@pytest.mark.parametrize(
    ("url", "host", "dom"),
    [
        ("https://www.news.example.co.uk/x", "news.example.co.uk", "example.co.uk"),
        ("https://a.b.example.com/x", "a.b.example.com", "example.com"),
        ("https://example.com/x", "example.com", "example.com"),
        ("https://localhost:8080/x", "localhost", "localhost"),
        ("https://WWW.EXAMPLE.COM/x", "example.com", "example.com"),
    ],
)
def test_host_and_registered_domain(spark, url, host, dom):
    row = (
        spark.createDataFrame([(url,)], ["url"])
        .select(url_host("url").alias("h"), registered_domain("url").alias("d"))
        .first()
    )
    assert (row["h"], row["d"]) == (host, dom)


def _urls_df(spark):
    rows = [
        (1, "https://good.example.com/a"),
        (2, "https://spam.example.net/b"),
        (3, "https://www.mirror.example.co.uk/c"),
        (4, "https://good.example.com/d"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "url"])


def test_domain_gate_literal_lists(spark):
    df = _urls_df(spark)
    kept = domain_gate(df, blocklist=["example.net"])
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 3, 4]
    kept = domain_gate(df, blocklist=["example.net"], allowlist=["example.com"])
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 4]
    # schema passes through untouched
    assert kept.columns == df.columns


def test_domain_gate_dataframe_lists_broadcast(spark):
    df = _urls_df(spark)
    # mixed-case table rows must match the (always-lowercase) extracted
    # domain — DataFrame lists are normalized like literal lists
    bl = spark.createDataFrame([("Example.NET",)], ["domain"])
    kept = domain_gate(df, blocklist=bl)
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 3, 4]
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan
    al = spark.createDataFrame([("example.co.uk",)], ["domain"])
    kept = domain_gate(df, blocklist=bl, allowlist=al)
    assert [r["doc_id"] for r in kept.collect()] == [3]


def test_url_dedup_collapses_aliases(spark):
    rows = [
        (10, "https://www.example.com/p?utm_source=a"),
        (11, "https://example.com:443/p/"),
        (12, "HTTPS://EXAMPLE.COM/p#top"),
        (13, "https://example.com/q"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    kept = url_dedup(df)
    got = {r["doc_id"]: r["canonical_url"] for r in kept.collect()}
    # the three aliases collapse to one keeper: the lowest id
    assert set(got) == {10, 13}
    assert got[10] == "https://example.com/p"
    groups = {r["canonical_url"]: (r["n_copies"], r["keeper_id"])
              for r in url_dedup_groups(df).collect()}
    assert groups["https://example.com/p"] == (3, 10)
    assert groups["https://example.com/q"] == (1, 13)


def test_ingest_domain_gate_and_alias_collapse(spark, tmp_path):
    """Round-11 ingest gate e2e (verdict item 7): the domain tier runs
    before every other gate/tier, blocklisted domains never land or index,
    in-batch canonical aliases collapse to the lowest id, the audit row
    carries both counts, and a rerun is deterministic."""
    from etl_data_transformer_spark.plans.ingest import run_incremental_ingest

    kw = dict(
        exact_store=str(tmp_path / "ex"),
        survivors_path=str(tmp_path / "landed"),
        audit_path=str(tmp_path / "audit"),
        url_col="url",
        domain_blocklist=["spam.example"],
        collapse_url_aliases=True,
    )
    b1 = spark.createDataFrame(
        [
            (1, "one unique document body", "https://www.Good.example/p?utm_source=x"),
            (2, "second unique document body", "https://good.example:443/p/"),  # alias of 1
            (3, "third unique document body", "https://spam.example/z"),        # blocked
            (4, "fourth unique document body", "https://other.example/q"),
            (5, "fifth unique document body", None),                            # NULL passes
        ],
        "doc_id long, text string, url string",
    )
    r1 = run_incremental_ingest(b1, **kw)
    assert r1.n_domain_dropped == 1          # doc 3
    assert r1.n_url_alias_dropped == 1       # doc 2 collapses into doc 1
    assert r1.n_batch == 5 and r1.n_landed == 3
    landed = spark.read.parquet(str(tmp_path / "landed"))
    assert sorted(x["doc_id"] for x in landed.collect()) == [1, 4, 5]
    # blocked/aliased docs never reached the exact store
    ex = spark.read.parquet(str(tmp_path / "ex"))
    assert sorted(x["doc_id"] for x in ex.collect()) == [1, 4, 5]
    # audit row carries the tier counts
    audit = spark.read.parquet(str(tmp_path / "audit")).collect()[0]
    assert audit["n_domain_dropped"] == 1 and audit["n_url_alias_dropped"] == 1

    # cross-batch: same canonical URL, DIFFERENT bytes is deliberately NOT
    # dropped by the URL tier (freshness belongs to CDC, not dedup); same
    # bytes is caught by the content store as usual
    b2 = spark.createDataFrame(
        [
            (10, "one unique document body", "https://other.example/r"),  # exact content dup of 1
            (11, "a recrawl with changed text", "https://good.example/p"),  # landed 1's URL, new bytes
        ],
        "doc_id long, text string, url string",
    )
    r2 = run_incremental_ingest(b2, **kw)
    assert r2.n_domain_dropped == 0 and r2.n_url_alias_dropped == 0
    assert r2.n_after_exact == 1 and r2.n_landed == 1  # 10 dropped, 11 lands


def test_ingest_domain_gate_dataframe_allowlist(spark, tmp_path):
    from etl_data_transformer_spark.plans.ingest import run_incremental_ingest

    allow = spark.createDataFrame([("keep.example",)], ["domain"])
    b = spark.createDataFrame(
        [
            (1, "first document body", "https://a.keep.example/x"),
            (2, "second document body", "https://drop.example/y"),
        ],
        "doc_id long, text string, url string",
    )
    r = run_incremental_ingest(
        b,
        exact_store=str(tmp_path / "ex"),
        survivors_path=str(tmp_path / "landed"),
        url_col="url",
        domain_allowlist=allow,
    )
    assert r.n_domain_dropped == 1 and r.n_landed == 1
    assert r.n_url_alias_dropped is None  # collapse not enabled
    landed = spark.read.parquet(str(tmp_path / "landed"))
    assert [x["doc_id"] for x in landed.collect()] == [1]


def test_ingest_txn_domain_gate_parity(spark, tmp_path):
    """The atomic (manifest) runner shares _domain_gate with the parquet
    runner: same drops, same audit columns, through the journaled commit."""
    from etl_data_transformer_spark.plans.ingest import run_incremental_ingest_txn
    from etl_data_transformer_spark.sources import manifest as MF

    b = spark.createDataFrame(
        [
            (1, "first unique body", "https://good.example/p?utm_source=x"),
            (2, "second unique body", "https://www.good.example/p#top"),  # alias of 1
            (3, "third unique body", "https://spam.example/z"),           # blocked
        ],
        "doc_id long, text string, url string",
    )
    r = run_incremental_ingest_txn(
        b,
        corpus_table=str(tmp_path / "corpus"),
        exact_table=str(tmp_path / "exact"),
        txn_dir=str(tmp_path / "txn"),
        audit_table=str(tmp_path / "audit"),
        url_col="url",
        domain_blocklist=["spam.example"],
        collapse_url_aliases=True,
    )
    assert r.n_domain_dropped == 1 and r.n_url_alias_dropped == 1
    assert r.n_landed == 1
    assert [x["doc_id"] for x in MF.read_table(spark, str(tmp_path / "corpus")).collect()] == [1]
    audit = MF.read_table(spark, str(tmp_path / "audit")).collect()[0]
    assert audit["n_domain_dropped"] == 1 and audit["n_url_alias_dropped"] == 1


def test_stream_ingest_domain_gate_parity(spark, tmp_path):
    """The streaming twin shares _domain_gate too: one drained micro-batch
    lands the gated survivors with the audit columns in its batch
    partition."""
    from etl_data_transformer_spark.streaming.pipeline import stream_ingest

    src = str(tmp_path / "src")
    schema = "doc_id long, text string, url string"
    spark.createDataFrame(
        [
            (1, "first unique body", "https://good.example/p?utm_source=x"),
            (2, "second unique body", "https://good.example:443/p/"),  # alias of 1
            (3, "third unique body", "https://spam.example/z"),        # blocked
            (4, "fourth unique body", "https://other.example/q"),
        ],
        schema,
    ).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    stream_ingest(
        stream,
        str(tmp_path / "landed"),
        str(tmp_path / "ckpt"),
        exact_store=str(tmp_path / "ex"),
        audit_path=str(tmp_path / "audit"),
        url_col="url",
        domain_blocklist=["spam.example"],
        collapse_url_aliases=True,
    )
    landed = spark.read.parquet(str(tmp_path / "landed"))
    assert sorted(x["doc_id"] for x in landed.collect()) == [1, 4]
    audit = spark.read.parquet(str(tmp_path / "audit")).collect()[0]
    assert audit["n_domain_dropped"] == 1 and audit["n_url_alias_dropped"] == 1


def test_corpus_stats_store_incremental_equals_full(spark, tmp_path):
    """Round-11 incremental dataset-card store: per-batch partials merged
    on read == corpus_stats over the concatenated corpus; compaction
    preserves the profile; a group-cols mismatch rejects."""
    import pytest

    from etl_data_transformer_spark.plans.quality import (
        compact_stats_store,
        corpus_stats,
        read_corpus_stats,
        write_stats_store,
    )

    schema = "doc_id long, text string, lang string, source string"
    b1 = spark.createDataFrame(
        [(1, "alpha beta gamma", "en", "web"),
         (2, "delta epsilon", "en", "books"),
         (3, "zeta eta theta iota", "de", "web")],
        schema,
    )
    b2 = spark.createDataFrame(
        [(10, "kappa", "en", "web"),
         (11, "lambda mu nu xi omicron pi", "de", "web")],
        schema,
    )
    store = str(tmp_path / "stats")
    write_stats_store(b1, store)
    write_stats_store(b2, store)

    def key(df):
        return {
            (r["lang"], r["source"]): (r["n_docs"], r["tok_sum"], r["char_sum"], r["max_tokens"])
            for r in df.collect()
        }

    want = key(corpus_stats(b1.unionByName(b2)))
    assert key(read_corpus_stats(spark, store)) == want
    compact_stats_store(spark, store)
    assert key(read_corpus_stats(spark, store)) == want
    assert spark.read.parquet(store).count() == len(want)  # one row per group
    with pytest.raises(ValueError, match="corpus-stats store parameter mismatch"):
        read_corpus_stats(spark, store, group_cols=("source",))


def test_canonicalize_idempotent_over_combination_grid(spark):
    """Canonicalization must be IDEMPOTENT — canonical(canonical(u)) ==
    canonical(u) — over the full combination grid of spec-relevant URL
    features (scheme case x www x port x trailing slash x query orderings
    with/without tracking params x fragment). A second pass that changes
    anything means the first pass emitted a non-canonical form."""
    import itertools

    rows = []
    for scheme, www, host, port, trail, query, frag in itertools.product(
        ("https://", "HTTPS://", "http://"),
        ("", "www.", "WWW."),
        ("Example.COM", "a.b.example.co.uk"),
        ("", ":443", ":80", ":8080"),
        ("", "/", "///"),
        ("", "?utm_source=x", "?b=2&a=1", "?utm_ref=1&z=9&a=1", "?ref=h&gclid=g"),
        ("", "#frag"),
    ):
        rows.append((scheme + www + host + port + "/path" + trail + query + frag,))
    df = spark.createDataFrame(rows, ["url"])
    twice = df.select(
        canonicalize_url("url").alias("c1"),
        canonicalize_url(canonicalize_url("url")).alias("c2"),
    )
    bad = twice.filter(F.col("c1") != F.col("c2"))
    assert bad.count() == 0, bad.limit(5).collect()


def test_malformed_urls_never_collapse_or_gate(spark, tmp_path):
    """Round-11 review: canonicalize_url maps every non-URL-shaped string
    to the same '://' residue, so URL identity only exists for
    scheme://-shaped values — malformed rows must pass the gate ungated
    and the dedup uncollapsed (NULL canonical), in the operators AND
    through the ingest tier."""
    from etl_data_transformer_spark.plans.ingest import run_incremental_ingest

    rows = [
        (1, "doc body one", "//proto.relative.example/x"),   # protocol-relative
        (2, "doc body two", "bare-host.example/page"),        # no scheme
        (3, "doc body three", "N/A"),                          # junk
        (4, "doc body four", "https://real.example/p/"),
        (5, "doc body five", "https://real.example/p#frag"),  # alias of 4
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, url string")
    kept = url_dedup(df)
    got = {r["doc_id"]: r["canonical_url"] for r in kept.collect()}
    # 1-3 pass through uncollapsed with NULL canonical; 5 collapses into 4
    assert set(got) == {1, 2, 3, 4}
    assert got[1] is None and got[2] is None and got[3] is None
    assert got[4] == "https://real.example/p"
    # groups: only URL-shaped rows contribute
    groups = {r["canonical_url"] for r in url_dedup_groups(df).collect()}
    assert groups == {"https://real.example/p"}
    # gate: malformed rows pass an allowlist they could never match
    gated = domain_gate(df, allowlist=["real.example"])
    assert sorted(r["doc_id"] for r in gated.collect()) == [1, 2, 3, 4, 5]
    # ingest tier end to end
    r = run_incremental_ingest(
        df,
        exact_store=str(tmp_path / "ex"),
        survivors_path=str(tmp_path / "landed"),
        url_col="url",
        domain_blocklist=["blocked.example"],
        collapse_url_aliases=True,
    )
    assert r.n_domain_dropped == 0 and r.n_url_alias_dropped == 1  # only 5
    landed = spark.read.parquet(str(tmp_path / "landed"))
    assert sorted(x["doc_id"] for x in landed.collect()) == [1, 2, 3, 4]


def test_jaccard_store_rerun_heals_and_is_duplicate_neutral(spark, tmp_path):
    """Round-11 review: a crashed append's rerun must recompute identical
    pairs (heal-on-read excludes the prior attempt's store rows) and the
    duplicate appended rows must not fan out the verify join or change
    later batches' results; compaction prunes the copies."""
    from etl_data_transformer_spark.operators.dedup import (
        compact_jaccard_store,
        jaccard_join_incremental,
        write_jaccard_store,
    )

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    b1 = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zetas")], "doc_id long, text string"
    )
    store = str(tmp_path / "jstore")
    write_jaccard_store(corpus, store, threshold=0.5)
    first = {(r["id_a"], r["id_b"]) for r in jaccard_join_incremental(b1, store).collect()}
    # simulate the crashed-then-rerun batch: run the SAME batch again
    rerun = {(r["id_a"], r["id_b"]) for r in jaccard_join_incremental(b1, store).collect()}
    assert first == rerun == {(1, 10)}
    # duplicates landed by the rerun are result-neutral for later batches
    b2 = spark.createDataFrame(
        [(20, "alpha beta gamma delta epsilon zetas")], "doc_id long, text string"
    )
    pairs = jaccard_join_incremental(b2, store, append=False).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 20), (10, 20)}
    assert len(pairs) == 2  # no duplicate pair rows from duplicate gramsets
    compact_jaccard_store(spark, store)
    assert spark.read.parquet(store + "/gramsets").count() == 2  # copies pruned
    after = {(r["id_a"], r["id_b"])
             for r in jaccard_join_incremental(b2, store, append=False).collect()}
    assert after == {(1, 20), (10, 20)}


# ------------------------------ PSL algorithm (round 12) --------------------


def test_registered_domain_psl_splits(spark):
    """The PSL data file upgrade (round-11 verdict item 3): github.io /
    blogspot / amazonaws-class private registries split per tenant,
    wildcard and exception rules behave per the publicsuffix.org
    algorithm, and unlisted TLDs keep the naive eTLD+1."""
    from etl_data_transformer_spark.functions.urls import (
        NAIVE_RULES,
        registered_domain,
    )

    cases = [
        ("https://a.b.co.uk/x", "b.co.uk"),
        ("https://tenant.github.io/x", "tenant.github.io"),
        ("https://deep.sub.tenant.github.io/x", "tenant.github.io"),
        ("https://user.blogspot.com.au/p", "user.blogspot.com.au"),
        ("https://bucket.s3.amazonaws.com/k", "bucket.s3.amazonaws.com"),
        (
            "https://vm.eu-west-1.compute.amazonaws.com/x",
            "vm.eu-west-1.compute.amazonaws.com",
        ),
        ("https://www.example.com/", "example.com"),
        ("https://foo.www.ck/", "www.ck"),  # !www.ck exception
        ("https://shop.anything.ck/", "shop.anything.ck"),  # *.ck wildcard
        ("https://x.city.kawasaki.jp/", "city.kawasaki.jp"),  # !city.* exception
        ("https://a.b.kawasaki.jp/", "a.b.kawasaki.jp"),  # *.kawasaki.jp
        ("https://co.uk/", "co.uk"),  # host IS a suffix -> identity
        ("https://example.de/", "example.de"),  # implicit '*' rule
        ("https://sub.example.de/", "example.de"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["url"])
    got = [r[0] for r in df.select(registered_domain("url")).collect()]
    assert got == [want for _, want in cases]
    # the naive fallback reproduces the pre-round-12 behavior
    naive = [
        r[0] for r in df.select(registered_domain("url", rules=NAIVE_RULES)).collect()
    ]
    assert naive[1] == "github.io"  # one unit under the old subset
    assert naive[0] == "b.co.uk"  # multipart subset entries unchanged


def test_load_psl_reads_official_format_and_falls_back(spark, tmp_path):
    """load_psl parses the upstream file format (comments, blanks,
    wildcard and exception lines); absent path falls back to the bundled
    snapshot; swapping the data swaps the behavior with no code change."""
    from etl_data_transformer_spark.functions.urls import (
        PSL_RULES,
        load_psl,
        registered_domain,
    )

    dat = tmp_path / "public_suffix_list.dat"
    dat.write_text(
        "// ===BEGIN ICANN DOMAINS===\n"
        "com\n"
        "co.uk\n"
        "*.custom\n"
        "!keep.custom\n"
        "\n"
        "// ===END ICANN DOMAINS===\n"
    )
    rules = load_psl(str(dat))
    assert "co.uk" in rules.normals[2]
    assert "custom" in rules.wildcards[1]
    assert "keep.custom" in rules.exceptions[2]
    df = spark.createDataFrame(
        [("https://x.tenant.custom/a",), ("https://x.keep.custom/a",)], ["url"]
    )
    got = [
        r[0] for r in df.select(registered_domain("url", rules=rules)).collect()
    ]
    assert got == ["x.tenant.custom", "keep.custom"]
    # None -> bundled snapshot; an EXPLICIT missing path raises (silent
    # degradation to the snapshot would corrupt domain gates unnoticed)
    assert load_psl(None) == PSL_RULES
    import pytest

    with pytest.raises(FileNotFoundError):
        load_psl(str(tmp_path / "nope.dat"))


def test_psl_oracle_sql_mirrors_spark_expression(spark):
    """The DuckDB CASE generated from the loaded rules must agree with the
    Spark expression host-for-host — the lockstep the domain_stats_docs
    hash relies on."""
    import duckdb

    from etl_data_transformer_spark.functions.urls import (
        psl_registered_sql,
        psl_slen_sql,
        registered_domain,
    )

    hosts = [
        "a.b.co.uk", "tenant.github.io", "deep.sub.tenant.github.io",
        "user.blogspot.com.au", "bucket.s3.amazonaws.com",
        "vm.eu-west-1.compute.amazonaws.com", "example.com", "foo.www.ck",
        "shop.anything.ck", "x.city.kawasaki.jp", "a.b.kawasaki.jp",
        "co.uk", "example.de", "sub.example.de", "localhost",
    ]
    df = spark.createDataFrame([(h,) for h in hosts], ["host"])
    spark_side = [
        r[0]
        for r in df.select(registered_domain("host", is_host=True)).collect()
    ]
    con = duckdb.connect()
    sql = f"""
        WITH h AS (SELECT unnest({hosts!r}) AS host),
        l AS (SELECT host, string_split(host, '.') AS labels FROM h),
        s AS (SELECT *, {psl_slen_sql("labels")} AS __slen FROM l)
        SELECT {psl_registered_sql("host", "labels", "__slen")} FROM s
    """
    duck_side = [r[0] for r in con.execute(sql).fetchall()]
    assert spark_side == duck_side


# --------------------- canonical-URL keeper store (round 12) ----------------


def test_url_keeper_two_batch_recrawl_e2e(spark, tmp_path):
    """The cross-batch URL tier (round-11 verdict item 4): batch-2
    re-crawls of batch-1 URLs never re-land as near-dup work — a
    same-content alias drops, a changed-content re-crawl routes to a CDC
    update of the keeper document in place; genuinely new URLs land."""
    import os

    from etl_data_transformer_spark.operators.domains import (
        apply_url_updates,
        url_keeper_ingest,
        url_keeper_merge,
    )
    from etl_data_transformer_spark.sources.writers import atomic_swap_write

    store = str(tmp_path / "keeper")
    corpus_path = str(tmp_path / "corpus")
    b1 = spark.createDataFrame(
        [
            (1, "https://a.example.com/page1", "original content one"),
            (2, "https://a.example.com/page2?utm_source=x", "original content two"),
            (3, None, "un-attributable row"),
        ],
        "doc_id long, url string, text string",
    )
    new1, upd1, drop1 = url_keeper_ingest(b1, store)
    assert upd1.count() == 0 and drop1 == 0
    assert sorted(r.doc_id for r in new1.collect()) == [1, 2, 3]
    atomic_swap_write(new1, corpus_path)

    b2 = spark.createDataFrame(
        [
            # same-content re-crawl of page1 under a tracking alias -> drop
            (10, "https://a.example.com/page1?fbclid=zz", "original content one"),
            # CHANGED content re-crawl of page2 -> CDC update of keeper 2
            (11, "https://a.example.com/page2", "revised content two"),
            # genuinely new URL -> lands
            (12, "https://a.example.com/page3", "brand new page"),
        ],
        "doc_id long, url string, text string",
    )
    new2, upd2, drop2 = url_keeper_ingest(b2, store)
    assert sorted(r.doc_id for r in new2.collect()) == [12]
    assert drop2 == 1  # the same-content alias (id 10)
    ups = upd2.collect()
    assert len(ups) == 1 and ups[0].keeper_id == 2 and ups[0].doc_id == 11

    # apply the CDC update in place + land the new doc
    corpus = spark.read.parquet(corpus_path)
    updated = apply_url_updates(corpus, upd2).unionByName(new2)
    atomic_swap_write(updated, corpus_path)

    landed = spark.read.parquet(corpus_path)
    assert sorted(r.doc_id for r in landed.collect()) == [1, 2, 3, 12]  # alias never re-lands
    assert (
        landed.filter("doc_id = 2").collect()[0].text == "revised content two"
    )  # updated in place, keeper id stable

    # merged store view: keeper ids stable, fp follows the re-crawl
    merged = {
        r.canonical_url: (r.keeper_id, r.batch_seq)
        for r in url_keeper_merge(spark.read.parquet(store)).collect()
    }
    assert merged["https://a.example.com/page1"] == (1, 1)
    assert merged["https://a.example.com/page2"] == (2, 2)  # updated row won
    assert merged["https://a.example.com/page3"][0] == 12

    # rerun of batch 2 is a no-op: everything classifies as known
    new2b, upd2b, _ = url_keeper_ingest(b2, store)
    assert new2b.count() == 0 and upd2b.count() == 0

    # compaction bounds growth to one row per canonical, results unchanged
    from etl_data_transformer_spark.operators.domains import (
        compact_url_keeper_store,
    )

    compact_url_keeper_store(spark, store)
    rows = spark.read.parquet(store)
    assert rows.count() == rows.select("canonical_url").distinct().count() == 3
    assert {
        r.canonical_url: (r.keeper_id, r.batch_seq)
        for r in url_keeper_merge(rows).collect()
    } == merged
    assert os.path.exists(os.path.join(store, "_url_keeper_params.json"))


# --------------------- round-13: expanded PSL snapshot + vendoring ----------


def test_registered_domain_r13_registry_splits(spark):
    """Round-13 snapshot expansion: the new registry families split
    tenants per the publicsuffix.org algorithm — .jp prefectures, US
    state locality space, letter registries (.bg), the new wildcard TLDs
    (*.bd / *.fk / *.jm), European second-levels and the added private
    registries."""
    from etl_data_transformer_spark.functions.urls import registered_domain

    cases = [
        ("https://blog.shinjuku.tokyo.jp/x", "shinjuku.tokyo.jp"),
        ("https://x.pref.hokkaido.jp/x", "pref.hokkaido.jp"),
        ("https://portal.city.ca.us/x", "city.ca.us"),
        ("https://deep.portal.city.ny.us/x", "city.ny.us"),
        ("https://site.a.bg/x", "site.a.bg"),
        ("https://shop.grameen.bd/x", "shop.grameen.bd"),  # *.bd wildcard
        ("https://www.gov.fk/x", "gov.fk"),  # *.fk wildcard (host IS suffix)
        ("https://org.asso.fr/x", "org.asso.fr"),
        ("https://x.gouv.sn/x", "x.gouv.sn"),
        ("https://me.notion.site/page", "me.notion.site"),
        ("https://app-x.run.app/", "app-x.run.app"),
        ("https://shop.myshopify.com/", "shop.myshopify.com"),
        # unchanged r12 behaviors still hold after the expansion
        ("https://a.b.co.uk/x", "b.co.uk"),
        ("https://foo.www.ck/", "www.ck"),
        ("https://sub.example.de/", "example.de"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["url"])
    got = [r[0] for r in df.select(registered_domain("url")).collect()]
    assert got == [want for _, want in cases]


def test_fetch_psl_validate_rejects_bad_files():
    """tools/fetch_psl.py must refuse to vendor a truncated file, an HTML
    error page, or anything missing the decade-old sentinel rules — a bad
    vendored file would silently corrupt every domain gate."""
    import pytest as _pytest

    from tools.fetch_psl import MIN_RULES, SENTINELS, validate

    good = "\n".join(
        ["// comment", *SENTINELS]
        + [f"rule{i}.example" for i in range(MIN_RULES)]
    )
    assert validate(good) >= MIN_RULES
    with _pytest.raises(SystemExit, match="truncated"):
        validate("\n".join(SENTINELS))  # far below MIN_RULES
    no_sentinel = "\n".join(f"rule{i}.example" for i in range(MIN_RULES + 10))
    with _pytest.raises(SystemExit, match="sentinel"):
        validate(no_sentinel)
    html = "<html><body>404</body></html>\n" + good
    with _pytest.raises(SystemExit, match="HTML"):
        validate(html)


def test_vendored_psl_auto_discovery(tmp_path, monkeypatch):
    """load_psl(None) picks up a PLAUSIBLE vendored public_suffix_list.dat
    at VENDORED_PSL_PATH (what tools/fetch_psl.py writes), REJECTS an
    implausible one loudly (round-13 advice: a truncated or hand-copied
    file that bypassed fetch_psl's checks must not silently replace the
    snapshot — same sentinel/size validation, at import), and falls back
    to the bundled snapshot when none exists."""
    import pytest as _pytest

    import etl_data_transformer_spark.functions.urls as U

    dat = tmp_path / "public_suffix_list.dat"
    # a full-looking file: every sentinel plus enough filler rules
    dat.write_text(
        "\n".join(
            ["// vendored", *U.PSL_SENTINELS, "*.custom", "!keep.custom"]
            + [f"rule{i}.example" for i in range(U.PSL_MIN_RULES)]
        )
    )
    monkeypatch.setattr(U, "VENDORED_PSL_PATH", str(dat))
    rules = U.load_psl()
    assert "custom" in rules.wildcards[1]
    assert "keep.custom" in rules.exceptions[2]
    assert "co.uk" in rules.normals[2]
    # a hand-copied fragment at the vendored path fails LOUDLY instead of
    # silently replacing the snapshot for every domain gate
    dat.write_text("// vendored\nco.uk\n*.custom\n!keep.custom\n")
    with _pytest.raises(ValueError, match="failed validation"):
        U.load_psl()
    # an explicit path skips the plausibility gate: deliberately small
    # custom rule files remain a supported input there
    small = U.load_psl(str(dat))
    assert "custom" in small.wildcards[1]
    monkeypatch.setattr(U, "VENDORED_PSL_PATH", str(tmp_path / "absent.dat"))
    assert U.load_psl() == U.parse_psl_rules(U.PSL_SNAPSHOT)


def test_nested_exception_precedence_consistent_across_all_forms(spark):
    """Round-13 advice: with a (synthetic) rule file whose exception
    rules NEST, all three PSL twins — the expression form, the broadcast
    frame form, and the DuckDB CASE chain — must pick the SAME winner:
    the DEEPEST matching exception (the PSL's longest-match principle).
    Upstream exceptions never nest, so only a custom/vendored file can
    reach this path — which is exactly when silent divergence would go
    unnoticed."""
    import duckdb

    from etl_data_transformer_spark.functions.urls import (
        parse_psl_rules,
        psl_registered_sql,
        psl_slen_sql,
        registered_domain,
        registered_domain_frame,
    )

    rules = parse_psl_rules(
        ["*.example", "*.a.example", "!a.example", "!b.a.example"]
    )
    hosts = [
        "x.b.a.example",  # both !a.example and !b.a.example match -> deepest
        "b.a.example",    # ditto (host IS the deep exception)
        "y.a.example",    # only !a.example matches
        "q.w.example",    # wildcard, no exception
    ]
    df = spark.createDataFrame([(h,) for h in hosts], ["host"])
    expr_got = {
        r["host"]: r["rd"]
        for r in df.select(
            "host", registered_domain("host", is_host=True, rules=rules).alias("rd")
        ).collect()
    }
    frame_got = {
        r["host"]: r["reg_domain"]
        for r in registered_domain_frame(df, rules=rules).collect()
    }
    con = duckdb.connect()
    sql_got = {}
    slen = psl_slen_sql("labels", rules=rules)
    reg = psl_registered_sql("host", "labels", "__slen", rules=rules)
    for h in hosts:
        sql_got[h] = con.execute(
            f"SELECT {reg} FROM (SELECT host, labels, {slen} AS __slen FROM "
            f"(SELECT '{h}' AS host, string_split('{h}', '.') AS labels))"
        ).fetchone()[0]
    want = {
        "x.b.a.example": "b.a.example",
        "b.a.example": "b.a.example",
        "y.a.example": "a.example",
        "q.w.example": "q.w.example",
    }
    assert expr_got == want
    assert frame_got == want
    assert sql_got == want


def test_domain_stats_and_gate_host_first_equivalence(spark):
    """Round-13 perf rewrite equivalence pins: domain_stats grouping by
    host alone (reg_domain computed post-agg) and domain_gate's
    distinct-host DataFrame path must produce exactly the per-(host,
    reg_domain) rows / gated ids the per-row forms did."""
    rows = [
        (1, "https://www.a.example.co.uk/x?utm_source=t", "hello world"),
        (2, "https://a.example.co.uk/x", "hello"),
        (3, "https://b.example.com/y", None),
        (4, "https://tenant.github.io/z", "zz"),
        (5, "not a url", "junk"),
        (6, None, "null url"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url", "text"])
    stats = {r["host"]: r for r in domain_stats(df).collect()}
    assert stats["a.example.co.uk"]["reg_domain"] == "example.co.uk"
    assert stats["a.example.co.uk"]["n_docs"] == 2
    assert stats["a.example.co.uk"]["n_urls"] == 1  # canonical collapse
    assert stats["tenant.github.io"]["reg_domain"] == "tenant.github.io"
    assert stats["b.example.com"]["tok_sum"] == 0  # NULL text counts zero
    bl = spark.createDataFrame([("example.co.uk",)], ["domain"])
    kept = domain_gate(df, blocklist=bl)
    assert sorted(r["doc_id"] for r in kept.collect()) == [3, 4, 5, 6]
    assert kept.columns == df.columns
    al = spark.createDataFrame([("tenant.github.io",)], ["domain"])
    strict = domain_gate(df, blocklist=bl, allowlist=al, strict=True)
    assert sorted(r["doc_id"] for r in strict.collect()) == [4]


# ------------- round-13: URL keeper in the journaled-txn runner -------------


def _uk_txn_kw(tmp_path):
    return dict(
        corpus_table=str(tmp_path / "corpus"),
        exact_table=str(tmp_path / "exact"),
        audit_table=str(tmp_path / "audit"),
        txn_dir=str(tmp_path / "txn"),
        url_col="url",
        url_keeper_table=str(tmp_path / "uk"),
    )


def _uk_b1(spark):
    return spark.createDataFrame(
        [
            (1, "https://www.example.com/p?utm_source=x", "alpha content"),
            (2, "https://example.com/p/", "beta content"),  # in-batch alias of 1
            (3, "https://example.com/q", "gamma content"),
        ],
        "doc_id long, url string, text string",
    )


def _uk_b2(spark):
    return spark.createDataFrame(
        [
            (11, "https://example.com/p", "alpha content"),  # same-content re-crawl
            (12, "https://example.com/q#frag", "gamma REVISED"),  # changed content
            (13, "https://example.com/r", "delta content"),  # new URL
            (14, "not a url", "epsilon content"),  # no URL identity
        ],
        "doc_id long, url string, text string",
    )


def _uk_state(spark, kw):
    from etl_data_transformer_spark.operators.domains import url_keeper_merge
    from etl_data_transformer_spark.sources import manifest as MF

    corpus = {
        r.doc_id: r.text for r in MF.read_table(spark, kw["corpus_table"]).collect()
    }
    exact = sorted(
        (r.doc_id, r.fp)
        for r in MF.read_table(spark, kw["exact_table"]).collect()
    )
    merged = {
        r.canonical_url: (r.keeper_id, r.batch_seq)
        for r in url_keeper_merge(
            MF.read_table(spark, kw["url_keeper_table"]).drop("__fp")
        ).collect()
    }
    return corpus, exact, merged


def test_ingest_txn_url_keeper_recrawl_e2e(spark, tmp_path):
    """Round-13 verdict item 2: the canonical-URL keeper tier runs inside
    the journaled transaction — same-content re-crawls drop, changed
    content CDC-updates the keeper document ATOMICALLY with the landing,
    the exact table gains the refreshed fp, and a rerun of the committed
    batch changes no data."""
    from etl_data_transformer_spark.plans.ingest import run_incremental_ingest_txn

    kw = _uk_txn_kw(tmp_path)
    r1 = run_incremental_ingest_txn(_uk_b1(spark), **kw)
    assert (r1.n_batch, r1.n_landed) == (3, 2)  # doc 2 = in-batch alias
    assert (r1.n_url_alias_dropped, r1.n_url_updates) == (1, 0)

    r2 = run_incremental_ingest_txn(_uk_b2(spark), **kw)
    assert (r2.n_url_alias_dropped, r2.n_url_updates) == (1, 1)
    assert r2.n_landed == 2  # 13 (new URL) + 14 (no URL identity)

    corpus, exact, merged = _uk_state(spark, kw)
    assert sorted(corpus) == [1, 3, 13, 14]
    assert corpus[3] == "gamma REVISED"  # CDC applied in the same commit
    # keeper 3 carries BOTH fps: the old (stale re-crawls still drop) and
    # the refreshed one (copies of the new text drop as exact dups)
    assert [d for d, _ in exact] == [1, 3, 3, 13, 14]
    assert merged["https://example.com/p"] == (1, 1)
    assert merged["https://example.com/q"] == (3, 2)  # keeper_id STABLE
    assert merged["https://example.com/r"] == (13, 2)

    # rerun of the committed batch: identical report, zero data movement
    r2b = run_incremental_ingest_txn(_uk_b2(spark), **kw)
    assert (r2b.n_url_alias_dropped, r2b.n_url_updates, r2b.n_landed) == (1, 1, 2)
    assert _uk_state(spark, kw) == (corpus, exact, merged)
    from etl_data_transformer_spark.sources import manifest as MF

    audit = MF.read_table(spark, kw["audit_table"])
    assert audit.count() == 3  # both attempts are real audit events
    assert [
        r.n_url_updates for r in audit.orderBy("ingest_ts").collect()
    ] == [0, 1, 1]


def test_ingest_txn_url_keeper_crash_at_commit_seam(spark, tmp_path, monkeypatch):
    """Crash injection at the keeper-append seam: the keeper append is
    journaled with the corpus, so a crash after the journal but before any
    pointer flip publishes NOTHING until recovery rolls the WHOLE
    transaction forward — the corpus can never run ahead of its URL
    identity (or vice versa) — and the rerun after recovery is a no-op on
    data."""
    import pytest as _pytest

    from etl_data_transformer_spark.plans.ingest import run_incremental_ingest_txn
    from etl_data_transformer_spark.sources import manifest as MF

    kw = _uk_txn_kw(tmp_path)
    run_incremental_ingest_txn(_uk_b1(spark), **kw)

    real_flip = MF._flip_pointer

    def boom(*a, **k):
        raise RuntimeError("injected crash before flip")

    monkeypatch.setattr(MF, "_flip_pointer", boom)
    with _pytest.raises(RuntimeError, match="injected crash"):
        run_incremental_ingest_txn(_uk_b2(spark), **kw)
    monkeypatch.setattr(MF, "_flip_pointer", real_flip)

    # pointers stale: batch 2 invisible EVERYWHERE — no torn state where
    # the corpus has the update but the keeper table lacks the seq-2 rows
    corpus, exact, merged = _uk_state(spark, kw)
    assert sorted(corpus) == [1, 3]
    assert corpus[3] == "gamma content"  # CDC NOT applied
    assert max(s for _, s in merged.values()) == 1  # no seq-2 keeper rows

    healed = MF.recover_multi_commits(kw["txn_dir"])
    assert healed  # the journal made the transaction redoable
    corpus, exact, merged = _uk_state(spark, kw)
    assert corpus[3] == "gamma REVISED" and sorted(corpus) == [1, 3, 13, 14]
    assert merged["https://example.com/q"] == (3, 2)

    # rerun after recovery: the own-__fp heal re-classifies identically
    # and every guard empties — no duplicate keeper rows, fps, or docs
    run_incremental_ingest_txn(_uk_b2(spark), **kw)
    assert _uk_state(spark, kw) == (corpus, exact, merged)


def test_ingest_txn_url_keeper_parity_with_batch_runner(spark, tmp_path):
    """The txn keeper tier lands the same corpus (ids AND post-CDC text)
    and the same merged keeper view as the plain-parquet runner on the
    same two batches — only the publication protocol differs."""
    from etl_data_transformer_spark.operators.domains import (
        read_url_keeper_store,
        url_keeper_merge,
    )
    from etl_data_transformer_spark.plans.ingest import (
        run_incremental_ingest,
        run_incremental_ingest_txn,
    )

    kw = _uk_txn_kw(tmp_path / "txn_mode")
    run_incremental_ingest_txn(_uk_b1(spark), **kw)
    run_incremental_ingest_txn(_uk_b2(spark), **kw)
    t_corpus, _, t_merged = _uk_state(spark, kw)

    pdir = tmp_path / "parquet_mode"
    pkw = dict(
        exact_store=str(pdir / "exact"),
        survivors_path=str(pdir / "corpus"),
        url_col="url",
        url_keeper_store=str(pdir / "uk"),
    )
    run_incremental_ingest(_uk_b1(spark), **pkw)
    run_incremental_ingest(_uk_b2(spark), **pkw)
    p_corpus = {
        r.doc_id: r.text
        for r in spark.read.parquet(pkw["survivors_path"]).collect()
    }
    p_merged = {
        r.canonical_url: (r.keeper_id, r.batch_seq)
        for r in url_keeper_merge(
            read_url_keeper_store(spark, pkw["url_keeper_store"])
        ).collect()
    }
    assert p_corpus == t_corpus
    assert p_merged == t_merged


def test_ingest_txn_url_keeper_compaction_identity(spark, tmp_path):
    """compact_url_keeper_table rewrites the txn keeper table to its
    merged view (one row per canonical, superseded fps dropped), the gate
    behaves identically afterwards, and a rerun of a pre-compaction batch
    is still a no-op on data (alias path instead of heal path)."""
    from etl_data_transformer_spark.operators.domains import (
        compact_url_keeper_table,
        url_keeper_merge,
    )
    from etl_data_transformer_spark.plans.ingest import run_incremental_ingest_txn
    from etl_data_transformer_spark.sources import manifest as MF

    kw = _uk_txn_kw(tmp_path)
    run_incremental_ingest_txn(_uk_b1(spark), **kw)
    run_incremental_ingest_txn(_uk_b2(spark), **kw)
    corpus, exact, merged = _uk_state(spark, kw)

    raw_before = MF.read_table(spark, kw["url_keeper_table"]).count()
    compact_url_keeper_table(spark, kw["url_keeper_table"])
    rows_after = MF.read_table(spark, kw["url_keeper_table"])
    # one row per canonical, __fp rewritten to the compaction marker
    assert rows_after.count() == len(merged) < raw_before + 1
    assert {r["__fp"] for r in rows_after.select("__fp").distinct().collect()} == {
        "compacted"
    }
    assert {
        r.canonical_url: (r.keeper_id, r.batch_seq)
        for r in url_keeper_merge(rows_after.drop("__fp")).collect()
    } == merged

    # rerun of the pre-compaction batch 2: URL-identified rows take the
    # alias path (their effects are merged in, no longer healed away), so
    # no updates re-route; the no-URL-identity row recomputes through the
    # tiers (reports reflect recomputation) but the corpus guard lands
    # nothing — zero data movement either way
    r = run_incremental_ingest_txn(_uk_b2(spark), **kw)
    assert r.n_url_updates == 0 and r.n_url_alias_dropped == 3
    got_corpus, got_exact, got_merged = _uk_state(spark, kw)
    assert (got_corpus, got_merged) == (corpus, merged)
    assert got_exact == exact  # (id, fp) refresh guarded — no duplicates

    # a batch AFTER compaction keeps advancing sequence numbers
    b3 = spark.createDataFrame(
        [(21, "https://example.com/q", "gamma THIRD REVISION")],
        "doc_id long, url string, text string",
    )
    r3 = run_incremental_ingest_txn(b3, **kw)
    assert r3.n_url_updates == 1
    _, _, m3 = _uk_state(spark, kw)
    assert m3["https://example.com/q"][0] == 3  # keeper_id still stable
    assert m3["https://example.com/q"][1] > merged["https://example.com/q"][1]


def _psl_reference(host: str, rules) -> str:
    """Pure-Python reference of the publicsuffix.org algorithm (longest
    matching rule wins; ``*.base`` adds one label; ``!name`` IS the
    registrable domain; implicit ``*`` -> 1-label suffix; a host that IS
    a suffix returns itself) — the independent spec the Spark expression
    chain and the generated DuckDB CASE are both checked against."""
    labels = host.split(".")
    n = len(labels)
    for m in sorted(rules.exceptions, reverse=True):
        if n >= m and ".".join(labels[-m:]) in rules.exceptions[m]:
            return ".".join(labels[-m:])
    slen = 1
    for k in rules.normals:
        if n >= k and ".".join(labels[-k:]) in rules.normals[k]:
            slen = max(slen, k)
    for j in rules.wildcards:
        if n >= j + 1 and ".".join(labels[-j:] if j else []) in rules.wildcards[j]:
            slen = max(slen, j + 1)
    if n <= slen:
        return host
    return ".".join(labels[-(slen + 1):])


def test_registered_domain_three_way_agreement_randomized(spark):
    """Property check over ~400 generated hosts: the pure-Python PSL
    reference, the Spark expression chain and the generated DuckDB CASE
    agree host-for-host — hosts drawn from every rule shape in the
    snapshot (exact suffixes, wildcard bases, exception names, unlisted
    TLDs) with 0-3 random extra labels, plus single-label and deep-label
    edges. Deterministic seed; a divergence prints the host."""
    import random

    import duckdb

    from etl_data_transformer_spark.functions.urls import (
        PSL_RULES,
        psl_registered_sql,
        psl_slen_sql,
        registered_domain,
    )

    rng = random.Random(1337)
    seeds = []
    for d in (PSL_RULES.normals, PSL_RULES.wildcards, PSL_RULES.exceptions):
        for k in d:
            seeds.extend(rng.sample(sorted(d[k]), min(30, len(d[k]))))
    seeds.extend(["com", "de", "xyz", "localhost", "arpa"])
    hosts = []
    for s in seeds:
        base = s.lstrip("!*.")
        extra = ["".join(rng.choices("abcxyz", k=rng.randint(1, 5)))
                 for _ in range(rng.randint(0, 3))]
        hosts.append(".".join(extra + [base]) if extra else base)
    hosts.extend(["single", "a.b.c.d.e.f.g.h.co.uk", "x.y.anything.ck"])
    hosts = sorted(set(hosts))

    want = [_psl_reference(h, PSL_RULES) for h in hosts]
    df = spark.createDataFrame([(h,) for h in hosts], ["host"])
    got_spark = [
        r[0]
        for r in df.select(registered_domain("host", is_host=True))
        .collect()
    ]
    bad = [(h, w, g) for h, w, g in zip(hosts, want, got_spark) if w != g]
    assert not bad, f"spark diverges from reference on {bad[:5]}"

    con = duckdb.connect()
    sql = f"""
        WITH h AS (SELECT unnest({hosts!r}) AS host),
        l AS (SELECT host, string_split(host, '.') AS labels FROM h),
        s AS (SELECT *, {psl_slen_sql("labels")} AS __slen FROM l)
        SELECT {psl_registered_sql("host", "labels", "__slen")} FROM s
    """
    got_duck = [r[0] for r in con.execute(sql).fetchall()]
    bad = [(h, w, g) for h, w, g in zip(hosts, want, got_duck) if w != g]
    assert not bad, f"duckdb twin diverges from reference on {bad[:5]}"


def test_registered_domain_frame_equals_expression(spark):
    """The broadcast-join frame form (round 13 — constant plan cost in the
    rule-set size) must equal the literal-expression form host-for-host
    over hosts drawn from every rule shape, including the wildcard
    host-equals-base edge where the implicit '*' prevails."""
    import random

    from etl_data_transformer_spark.functions.urls import (
        NAIVE_RULES,
        PSL_RULES,
        registered_domain,
        registered_domain_frame,
    )

    rng = random.Random(7)
    seeds = []
    for d in (PSL_RULES.normals, PSL_RULES.wildcards, PSL_RULES.exceptions):
        for k in d:
            seeds.extend(rng.sample(sorted(d[k]), min(25, len(d[k]))))
    seeds += ["com", "de", "localhost"]
    hosts = sorted(
        {s.lstrip("!*.") for s in seeds}
        | {
            ".".join(
                ["".join(rng.choices("abcxyz", k=3)) for _ in range(rng.randint(1, 3))]
                + [s.lstrip("!*.")]
            )
            for s in seeds
        }
        | {"compute.amazonaws.com", "x.compute.amazonaws.com", "single"}
    )
    df = spark.createDataFrame([(h,) for h in hosts], ["host"])
    expr_side = {
        r["host"]: r["d"]
        for r in df.select(
            "host", registered_domain("host", is_host=True).alias("d")
        ).collect()
    }
    frame_side = {
        r["host"]: r["reg_domain"]
        for r in registered_domain_frame(df).collect()
    }
    assert frame_side == expr_side
    # rules override plumbs through the frame form too
    naive = registered_domain_frame(
        spark.createDataFrame([("tenant.github.io",)], ["host"]),
        rules=NAIVE_RULES,
    ).collect()[0]["reg_domain"]
    assert naive == "github.io"


def test_idn_rules_punycode_to_match_punycode_hosts(spark):
    """Round-13 advice: the full upstream PSL writes IDN registry rules
    as U-labels while URL-extracted hosts are punycode — parse_psl_rules
    must store them as A-labels or those registries can never match and
    every such host silently falls to the implicit '*' rule."""
    from etl_data_transformer_spark.functions.urls import (
        parse_psl_rules,
        registered_domain,
    )

    # 中国 == xn--fiqs8s, рф == xn--p1ai (decade-old PSL entries)
    rules = parse_psl_rules(["com", "中国", "рф", "*.テスト"])
    assert "xn--fiqs8s" in rules.normals[1]
    assert "xn--p1ai" in rules.normals[1]
    assert "xn--zckzah" in rules.wildcards[1]
    df = spark.createDataFrame(
        [
            ("a.b.xn--fiqs8s",),   # registry match -> b.xn--fiqs8s
            ("x.site.xn--p1ai",),  # registry match -> site.xn--p1ai
            ("d.c.xn--zckzah",),   # wildcard adds a label -> d.c.xn--zckzah
        ],
        ["host"],
    )
    got = [
        r[0]
        for r in df.select(
            registered_domain("host", is_host=True, rules=rules)
        ).collect()
    ]
    assert got == ["b.xn--fiqs8s", "site.xn--p1ai", "d.c.xn--zckzah"]


def test_fetch_psl_section_counts_and_drift():
    """Round-14 (verdict r13 item 8): fetch_psl surfaces per-section rule
    counts and >10% drift vs the incumbent vendored file, so a refresh
    that silently lost a whole registry section is visible at vendor
    time."""
    from tools.fetch_psl import section_counts

    text = (
        "// ===BEGIN ICANN DOMAINS===\n"
        "com\nco.uk\n*.ck\n!www.ck\n"
        "// ===END ICANN DOMAINS===\n"
        "// ===BEGIN PRIVATE DOMAINS===\n"
        "github.io\nblogspot.com\n"
        "// ===END PRIVATE DOMAINS===\n"
        "stray.example\n"
    )
    assert section_counts(text) == {"icann": 4, "private": 2, "unsectioned": 1}
    # drift report marks a >10% shrink
    import contextlib
    import io

    from tools.fetch_psl import _report_drift

    shrunk = text.replace("github.io\nblogspot.com\n", "github.io\n")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        _report_drift(text, shrunk)
    out = buf.getvalue()
    assert "section private: 2 -> 1 rules  <-- drifted" in out
    assert "section icann: 4 -> 4 rules\n" in out
