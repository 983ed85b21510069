"""Domain-tier curation operators (round-10 verdict item 7): per-domain
corpus stats, blocklist/allowlist gating, and URL-canonical exact dedup —
the standard web-corpus controls (a crawl is curated domain-first: rank
domains by mass/quality, gate the bad ones, collapse tracking-param
aliases BEFORE content hashing so the exact tier never sees the same page
twice under different URLs).

Everything is built on ``functions.urls``' pure-JVM expressions, so the
whole tier is one map-side projection plus the minimal shuffle each
operator genuinely needs (one groupBy for stats, zero for literal-list
gates, one window for dedup).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..functions.urls import canonicalize_url, is_urlish, registered_domain, url_host


def domain_stats(
    df: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Per-host corpus profile: (host, reg_domain, n_docs, n_urls,
    tok_sum, char_sum) where ``n_urls`` counts DISTINCT canonical URLs —
    the dedup-potential signal (n_docs >> n_urls means tracking-param
    aliases). One map-side-combined groupBy, same scale shape as
    ``plans.quality.corpus_stats``; the distinct count is exact
    (count_distinct shuffles (host, canonical) once — at 100 TB swap in
    approx_count_distinct if ±2% is acceptable, the only knob here).

    NULL text counts zero tokens/chars: the split runs over
    ``coalesce(text, '')`` (``size(tokens(NULL))`` is -1 under Spark's
    default legacy sizeOfNull, which would subtract from ``tok_sum``
    while the DuckDB twin's SUM skips NULLs — round-11 advice)."""
    toks = F.size(
        F.filter(
            tokens(F.coalesce(F.col(text_col), F.lit(""))),
            lambda t: F.length(t) > 0,
        )
    )
    return (
        df.select(
            url_host(url_col).alias("host"),
            registered_domain(url_col).alias("reg_domain"),
            canonicalize_url(url_col).alias("__canon"),
            toks.alias("__toks"),
            F.length(F.coalesce(F.col(text_col), F.lit(""))).alias("__chars"),
        )
        .groupBy("host", "reg_domain")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count_distinct(F.col("__canon")).cast("long").alias("n_urls"),
            F.sum("__toks").cast("long").alias("tok_sum"),
            F.sum("__chars").cast("long").alias("char_sum"),
        )
    )


def domain_gate(
    df: DataFrame,
    url_col: str = "url",
    blocklist: Sequence[str] | DataFrame = (),
    allowlist: Sequence[str] | DataFrame | None = None,
    strict: bool = False,
) -> DataFrame:
    """Registered-domain gate: drop blocklisted domains, then (when an
    allowlist is given) keep only allowlisted ones. Literal sequences
    compile to an IN predicate (pushed into the scan — zero shuffle);
    DataFrame lists (one ``domain`` column) run as broadcast anti/semi
    joins, the right shape when the list is a maintained table of
    millions of domains rather than a config literal.

    By default NULL and non-URL-shaped values pass UNGATED (the gate
    cannot attribute a domain, so it does not guess — same pass-through
    rule as the other ingest gates' NULL ids). ``strict=True`` DROPS
    unattributable rows instead — the allowlist-mode semantics ("drop
    everything not allowed") where junk/malformed URLs must not bypass
    the strictest gate (round-11 advice)."""
    shaped = F.col(url_col).isNotNull() & is_urlish(url_col)
    passthrough = df.filter(F.lit(False) if strict else ~shaped)
    df = df.filter(shaped)
    dom = registered_domain(url_col)
    out = df.withColumn("__dom", dom)
    # DataFrame lists are lowercased like literal lists — extracted domains
    # are always lowercase, so a mixed-case row in a maintained domain
    # table must not silently miss
    if isinstance(blocklist, DataFrame):
        bl = F.broadcast(blocklist.select(F.lower(F.col("domain")).alias("__dom")))
        out = out.join(bl, "__dom", "left_anti")
    elif len(blocklist):
        out = out.filter(~F.col("__dom").isin(*[d.lower() for d in blocklist]))
    if allowlist is not None:
        if isinstance(allowlist, DataFrame):
            al = F.broadcast(allowlist.select(F.lower(F.col("domain")).alias("__dom")))
            out = out.join(al, "__dom", "left_semi")
        else:
            out = out.filter(F.col("__dom").isin(*[d.lower() for d in allowlist]))
    return out.drop("__dom").unionByName(passthrough)


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """URL-canonical exact dedup: keep the lowest-id row per canonical
    URL (deterministic keeper, same policy as the content-hash exact
    tier this feeds — ``operators.dedup.exact_dedup``). One window over
    one shuffle on the canonical key; rows keep their original schema
    plus ``canonical_url``.

    NULL and non-URL-shaped values pass through UNCOLLAPSED with a NULL
    ``canonical_url`` (round-11 review: ``canonicalize_url`` maps every
    malformed string to the same ``'://'`` residue, so collapsing on it
    would silently merge distinct documents — URL identity only exists
    for URL-shaped values)."""
    shaped = F.col(url_col).isNotNull() & is_urlish(url_col)
    passthrough = df.filter(~shaped).withColumn(
        "canonical_url", F.lit(None).cast("string")
    )
    w = Window.partitionBy("canonical_url").orderBy(F.col(id_col).asc())
    return (
        df.filter(shaped)
        .withColumn("canonical_url", canonicalize_url(url_col))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .unionByName(passthrough)
    )


def url_dedup_groups(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Audit twin of ``url_dedup``: per canonical URL, the alias count and
    the keeper id — the (fp, n_copies, keeper_id) contract of
    ``exact_dedup_groups`` transplanted onto URL identity. NULL and
    non-URL-shaped values have no URL identity and contribute no group
    (same rule as ``url_dedup``'s pass-through)."""
    return (
        df.filter(F.col(url_col).isNotNull() & is_urlish(url_col))
        .select(canonicalize_url(url_col).alias("canonical_url"), F.col(id_col))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_copies"),
            F.min(id_col).alias("keeper_id"),
        )
    )
