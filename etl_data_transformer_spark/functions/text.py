"""Text-analysis expressions for the training-data pipeline surface
(SURVEY.md §2.10; BASELINE.json north star).

Everything here is built from JVM-side ``pyspark.sql.functions`` — no Python
UDFs in the hot path. Operates on ``documents.text`` (FIXTURES.md).
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword marker lists for the n-gram/stopword language-ID
# heuristic. Deliberately small and deterministic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "und", "die", "das", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "los", "las", "es", "una"],
}

# BPE-ish pre-tokenizer: letter runs, digit runs, or single punctuation.
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization as an array column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def bpe_token_count(col: Column | str) -> Column:
    """BPE-ish token count: letter runs + digit runs + punctuation marks."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_TOKEN_RE))


def char_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c)


def punct_ratio(col: Column | str) -> Column:
    r"""Punctuation chars / total chars (0 when empty). The character class
    is Unicode-aware (``\p{L}\p{N}``): the earlier ASCII-only
    ``A-Za-z0-9`` scored every accented or CJK character as punctuation,
    so clean multilingual prose was docked the full punctuation penalty
    (round-6 review; the DuckDB oracles carry the same RE2 class)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(
        F.when(
            F.length(c) > 0,
            F.regexp_count(c, F.lit(r"[^\s\p{L}\p{N}]")) / F.length(c),
        ).otherwise(0.0),
        6,
    )


def stopword_count(col: Column | str, words: list[str]) -> Column:
    """Occurrences of any marker word (word-bounded)."""
    c = F.col(col) if isinstance(col, str) else col
    # \Q...\E literal-quotes each word: an unescaped metacharacter in a
    # caller-supplied word ("c++", "a(b") would otherwise crash the stage
    # or silently match unintended text (round-6 review)
    pattern = r"\b(" + "|".join(f"\\Q{w}\\E" for w in words) + r")\b"
    return F.regexp_count(F.lower(c), F.lit(pattern))


def stopword_ratio(col: Column | str, words: list[str]) -> Column:
    """Marker-word hits / token count."""
    return F.round(F.try_divide(stopword_count(col, words), token_count(col)), 6)


def lang_id(col: Column | str, markers: dict[str, list[str]] = LANG_MARKERS) -> Column:
    """Language-ID heuristic: argmax over per-language marker-word hit counts
    (ties broken by language order; 'und' when nothing matches)."""
    c = F.col(col) if isinstance(col, str) else col
    # linear argmax: array_max over (score, -index, lang) structs — struct
    # ordering compares score first, then -index, so ties go to the
    # EARLIEST language in marker order (the chained-CASE semantics). The
    # earlier fold nested best_score into itself twice per language —
    # O(2^L) expression-tree growth in the language count (round-6 review).
    entries = [
        F.struct(
            stopword_count(c, ws).alias("s"),
            F.lit(-i).alias("p"),
            F.lit(lang).alias("lang"),
        )
        for i, (lang, ws) in enumerate(markers.items())
    ]
    best = F.array_max(F.array(*entries))
    return F.when(best["s"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_score(col: Column | str) -> Column:
    """Document quality score in [0, 1]: rewards reasonable length and word
    diversity, penalizes punctuation soup. Deterministic arithmetic only.

    score = 0.5*min(1, tokens/100) + 0.3*distinct_token_ratio + 0.2*(1-punct_ratio)
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    n = F.size(toks)
    distinct_ratio = F.try_divide(F.size(F.array_distinct(toks)), n)
    length_term = F.least(F.lit(1.0), n / F.lit(100.0))
    # empty/whitespace docs score 0, not 0.505: tokens('') is [''] (count
    # 1, distinct ratio 1.0, punct 0), which out-scored genuine short
    # prose under any threshold filter (round-6 review)
    return F.when(
        F.length(F.regexp_replace(c, r"\s", "")) == 0, F.lit(0.0)
    ).otherwise(
        F.round(
            0.5 * length_term + 0.3 * F.coalesce(distinct_ratio, F.lit(0.0)) + 0.2 * (1.0 - punct_ratio(c)),
            6,
        )
    )


def normalize_for_fingerprint(col: Column | str) -> Column:
    """Canonical text form: lowercase, collapse whitespace, trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def fingerprint(col: Column | str) -> Column:
    """Content fingerprint: sha256 over the normalized text (the scalable
    exact-dedup key — hash once, group/join on the 64-hex key)."""
    return F.sha2(normalize_for_fingerprint(col), 256)


def char_ngrams(col: Column | str, n: int = 3) -> Column:
    """Distinct character n-gram set (callers should pre-filter
    ``length(text) >= n``). JVM-side: sequence + transform + substr."""
    c = F.col(col) if isinstance(col, str) else col
    idx = F.when(
        F.length(c) >= n, F.sequence(F.lit(1), F.length(c) - F.lit(n - 1))
    ).otherwise(F.array().cast("array<int>"))
    # the guard matters: an un-guarded sequence(1, len-n+1) DESCENDS for
    # short strings and emitted a truncated partial gram (round-6 review)
    return F.array_distinct(F.transform(idx, lambda i: c.substr(i, F.lit(n))))


def shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingle set (distinct), the MinHash/Jaccard input.

    EXPRESSION-level convenience: the internal transform lambda captures
    the split expression, which Catalyst re-evaluates PER POSITION (no CSE
    inside higher-order functions) — O(len²)/doc. Hot paths must project
    ``filtered_tokens(...)`` to a column and use ``shingles_from_tokens``
    (identical values, measured 6.5-22× faster), or the exploded codegen
    form ``minhash_signature_store`` builds inline."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    # whitespace-ONLY means the \s class, not F.trim (which strips ASCII
    # spaces but not tabs/newlines — a '\t' doc slipped the guard)
    idx = F.when(
        F.length(F.regexp_replace(c, r"\s", "")) == 0, F.array().cast("array<int>")
    ).otherwise(F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))))
    # empty/whitespace docs yield NO shingles: tokens('') is [''] and the
    # un-guarded path emitted the '' shingle, making every pair of empty
    # docs Jaccard-1.0 near-dups (round-6 review). Docs with 1..n-1 tokens
    # keep their single partial shingle (the documented oracle shape).
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    )


def filtered_tokens(col: Column | str) -> Column:
    """``tokens()`` with empty strings filtered — the materialization-ready
    form (only whitespace-only docs produce an empty token, so this equals
    ``tokens()`` everywhere shingling positions matter)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(tokens(c), lambda t: F.length(t) > 0)


def shingles_from_tokens(arr: Column, n: int = 3) -> Column:
    """``shingles()`` over an ALREADY-MATERIALIZED (projected) filtered
    token-array column — identical shingle values (incl. the
    whitespace-only guard via ``size == 0`` and the single partial shingle
    of 1..n-1-token docs). Exists because Catalyst performs no
    common-subexpression elimination inside higher-order-function lambdas:
    ``shingles()`` capturing the split expression re-tokenizes the whole
    document once per position — O(len²)/doc, measured 6.5-22× slower than
    this projected form (the pmi_pairs round-10 lesson). Project
    ``filtered_tokens(...)`` to a column first, then call this."""
    idx = F.when(F.size(arr) == 0, F.array().cast("array<int>")).otherwise(
        F.sequence(F.lit(0), F.greatest(F.size(arr) - n, F.lit(0)))
    )
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(arr, i + 1, n)))
    )


# Karp-Rabin polynomial rolling-hash parameters for winnowing fingerprints.
# BASE * (MOD - 1) + max codepoint < 2^63 — the fold never overflows a long.
WINNOW_BASE = 31
WINNOW_MOD = 1_000_000_007


def kgram_hashes(col: Column | str, k: int = 8) -> Column:
    """Karp-Rabin polynomial hash of every character k-gram of ``col``:
    ``h = fold(0, (acc, c) -> (acc * BASE + codepoint(c)) % MOD)``.

    Pure integer arithmetic on codepoints (no engine-specific hash
    function), so an ANSI-SQL oracle can reproduce every value bit-exact.
    Callers should pass an ALREADY-MATERIALIZED normalized column (see
    ``winnow_fingerprints``) — inlining ``normalize_for_fingerprint`` here
    would re-run the regex once per (gram, char) inside the nested lambdas.
    Returns ``array<long>`` in document order (one hash per gram start);
    texts shorter than ``k`` return an empty array.
    """
    t = F.col(col) if isinstance(col, str) else col
    n_grams = F.length(t) - F.lit(k - 1)
    starts = F.when(n_grams >= 1, F.sequence(F.lit(1), n_grams)).otherwise(
        F.array().cast("array<int>")
    )
    offsets = F.sequence(F.lit(0), F.lit(k - 1))
    return F.transform(
        starts,
        lambda i: F.aggregate(
            offsets,
            F.lit(0).cast("long"),
            lambda acc, j: (acc * F.lit(WINNOW_BASE) + F.ascii(t.substr(i + j, F.lit(1))))
            % F.lit(WINNOW_MOD),
        ),
    )


def winnow_select(hashes_col: Column | str, w: int = 4) -> Column:
    """Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003): slide a window of ``w`` consecutive k-gram hashes and keep
    the minimum of each window; the distinct selected hashes are the
    document's fingerprint set. Guarantees every shared substring of length
    ``>= k + w - 1`` between two documents contributes at least one SHARED
    fingerprint — the local-sampling property that makes fingerprint
    equi-joins a sound plagiarism/boilerplate detector.

    Array-native (transform + slice + array_min): the whole selection is one
    codegen'd projection per document — no explode, no shuffle. Pass a
    MATERIALIZED hashes column (same inlining caveat as ``kgram_hashes``).
    """
    h = F.col(hashes_col) if isinstance(hashes_col, str) else hashes_col
    n_windows = F.size(h) - F.lit(w - 1)
    starts = F.when(n_windows >= 1, F.sequence(F.lit(1), n_windows)).otherwise(
        F.array().cast("array<int>")
    )
    return F.array_sort(
        F.array_distinct(F.transform(starts, lambda i: F.array_min(F.slice(h, i, w))))
    )


def duplicate_line_fraction(col: Column | str) -> Column:
    """Fraction of lines that are repeats of an earlier line (0 when the doc
    has no newline structure) — the boilerplate/spam repetition signal from
    published pretraining-data quality pipelines. JVM-side: split on
    newlines, compare distinct vs total non-blank line counts."""
    c = F.col(col) if isinstance(col, str) else col
    lines = F.filter(F.split(c, r"\n"), lambda x: F.length(F.trim(x)) > 0)
    n = F.size(lines)
    return F.round(
        F.when(n > 0, (n - F.size(F.array_distinct(lines))) / n).otherwise(0.0), 6
    )


def symbol_word_ratio(col: Column | str, symbols: str = "#…") -> Column:
    """Symbol-to-word ratio (hash marks / ellipses per word) — high values
    mark markup soup and truncation spam."""
    c = F.col(col) if isinstance(col, str) else col
    pattern = "[" + symbols + "]|\\.\\.\\."
    return F.round(F.try_divide(F.regexp_count(c, F.lit(pattern)), token_count(c)), 6)


def mean_word_length(col: Column | str) -> Column:
    """Mean token length: outliers on either end mark non-prose (DNA strings,
    single-char spam)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.round(F.try_divide(total, F.size(toks)), 6)


def repetition_quality_pass(
    col: Column | str,
    max_dup_line_frac: float = 0.3,
    max_symbol_word_ratio: float = 0.1,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
) -> Column:
    """Composite repetition/shape gate (the published-filter-suite shape:
    a document must clear every signal). Returns boolean."""
    return (
        (duplicate_line_fraction(col) <= max_dup_line_frac)
        & (symbol_word_ratio(col) <= max_symbol_word_ratio)
        & mean_word_length(col).between(min_mean_word_len, max_mean_word_len)
    )


def unigram_logprob_scores(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    quantize_micros: bool = False,
):
    """Statistical language-model quality filter (the simplest form of the
    perplexity filters used in published pretraining pipelines): score each
    document by the mean log-probability of its tokens under the CORPUS'S
    OWN unigram distribution (add-one smoothed). Gibberish and rare-token
    soup score far below natural text; threshold on a corpus percentile.

    Distributed shape: one groupBy builds the unigram table, per-doc scores
    are an equi join from exploded tokens back to it plus a mean — two
    shuffles on narrow keys, no Python. At 100 TB the unigram table is
    bounded by vocabulary (small next to the corpus) and broadcastable.
    Returns (id, n_tokens, mean_logprob). Empty / all-whitespace documents
    contribute no tokens (``tokens()`` on "" yields a zero-length string,
    filtered here) and get no score row; an empty corpus returns an empty
    result instead of crashing on a NULL total (round-3 advice).

    ``quantize_micros=True`` returns (id, n_tokens, logprob_micros) where
    the per-TOKEN log-prob is rounded to integer micro-nats BEFORE summing
    (each token type's log-prob is a pure function of its integer count, so
    the rounding happens once per vocabulary entry) — an integer sum is
    summation-order-independent and engine-exact, the float-audit pattern
    (COVERAGE.md) that makes the score hash-checkable against DuckDB.
    """
    from pyspark.sql import functions as F  # local alias for clarity

    tok = df.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("t")
    ).filter(F.length("t") > 0)
    # the tokenize+explode lineage feeds the vocab build AND the scoring
    # join: checkpoint it lazily so the corpus scan runs once, not per
    # action (the heavy_hitters/build_vocab persist lesson; round-6 review)
    tok = tok.localCheckpoint(eager=False)
    vocab = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    totals = vocab.agg(
        F.sum("c").alias("n_total"), F.count(F.lit(1)).alias("n_vocab")
    ).collect()[0]
    n_total, n_vocab = totals["n_total"], totals["n_vocab"]
    if n_total is None:  # zero tokens anywhere: sum() over no rows is NULL
        score = F.lit(0).cast("long").alias("logprob_micros") if quantize_micros else F.lit(0.0).alias("mean_logprob")
        return tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_tokens"), score)
    logprob = F.log((F.col("c") + 1) / F.lit(float(n_total + n_vocab)))
    if quantize_micros:
        vocab = vocab.withColumn("lp_micros", F.round(logprob * 1_000_000, 0).cast("long"))
        score = F.sum("lp_micros").cast("long").alias("logprob_micros")
    else:
        score = F.round(F.avg(logprob), 6).alias("mean_logprob")
    return (
        tok.join(F.broadcast(vocab), "t")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_tokens"), score)
    )


def bigram_logprob_scores(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    quantize_micros: bool = False,
    broadcast_counts: bool = True,
):
    """Conditional bigram LM quality score (the next rung up from
    ``unigram_logprob_scores`` toward the published perplexity filters):
    mean log of the add-one-smoothed conditional p(w2 | w1) =
    (c(w1 w2) + 1) / (c(w1) + V) over each document's adjacent token pairs.
    Repetitive n-gram soup scores high, shuffled-word gibberish scores low —
    the signal unigrams cannot see (same bag of words, different order).

    Distributed shape mirrors the unigram scorer: one pass builds bigrams
    per document JVM-side (``zip_with`` over two array slices — no explode
    of pairs until counting), two narrow groupBys build the bigram and
    unigram-context tables, and scoring is an equi join back to the count
    tables. The unigram-context table is vocabulary-bounded, but the
    DISTINCT-BIGRAM table grows roughly with the corpus — at a scale where
    it exceeds the broadcast limit pass ``broadcast_counts=False`` for a
    shuffled join (round-6 review; the earlier docstring overclaimed both
    tables as vocabulary-bounded). Documents with fewer than two tokens
    get no score row.
    ``quantize_micros`` — same engine-exact integer-micro-nat contract as
    the unigram scorer.
    """
    from pyspark.sql import functions as F  # local alias for clarity

    toks = F.filter(tokens(F.lower(F.col(text_col))), lambda t: F.length(t) > 0)
    big = df.select(
        F.col(id_col),
        F.explode(
            F.zip_with(
                F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
                F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), F.concat_ws(" ", a, b).alias("bg")),
            )
        ).alias("p"),
    ).select(id_col, F.col("p.w1").alias("w1"), F.col("p.bg").alias("bg"))
    # the bigram-build lineage feeds four consumers (both count tables, the
    # vocab census, the scoring join): checkpoint it lazily so the corpus
    # tokenization runs once (round-6 review)
    big = big.localCheckpoint(eager=False)
    bg_counts = big.groupBy("bg").agg(F.count(F.lit(1)).alias("c_bg"))
    w1_counts = big.groupBy("w1").agg(F.count(F.lit(1)).alias("c_w1"))
    n_vocab = big.select(F.split("bg", " ").getItem(1).alias("w2")).union(
        big.select("w1")
    ).distinct().count()
    if n_vocab == 0:  # no doc has two tokens
        return big.groupBy(id_col).agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (F.lit(0).cast("long").alias("logprob_micros") if quantize_micros else F.lit(0.0).alias("mean_logprob")),
        )
    logprob = F.log((F.col("c_bg") + 1) / (F.col("c_w1") + F.lit(float(n_vocab))))
    bg_side = F.broadcast(bg_counts) if broadcast_counts else bg_counts
    scored = big.join(bg_side, "bg").join(F.broadcast(w1_counts), "w1")
    if quantize_micros:
        scored = scored.withColumn("lp_micros", F.round(logprob * 1_000_000, 0).cast("long"))
        score = F.sum("lp_micros").cast("long").alias("logprob_micros")
    else:
        score = F.round(F.avg(logprob), 6).alias("mean_logprob")
    return scored.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_bigrams"), score)


def build_vocab(
    df,
    text_col: str = "text",
    min_count: int = 1,
    num_partitions: int | None = None,
):
    """Deterministic distributed vocabulary: (token, token_id, cnt) with
    dense ids 0..V-1 assigned in (count DESC, token ASC) order — the
    token→id table a training pipeline feeds its tokenizer.

    Scale shape — dense GLOBAL ids without a single-reducer window and
    without dropping to RDD ``zipWithIndex``: range-partition the counted
    vocab on the global sort key, take per-partition row counts (one tiny
    driver collect, ≤ num_partitions rows), broadcast the cumulative
    offsets back, and add them to a PER-PARTITION row_number. Every step
    is DataFrame-native; the window sorts each range partition
    independently. Ordering ties on count break by token string, so ids
    are bit-stable across runs and cluster layouts (pytest-pinned).

    The range-partitioned frame is PERSISTED across the two jobs (sizes
    collect, id assignment) — the range partitioner's sample seed changes
    per execution, so an un-cached recompute could re-draw partition
    bounds and mismatch the broadcast offsets (review finding); the small
    result is eagerly localCheckpoint'ed so the cache releases on return.
    """
    from pyspark import StorageLevel
    from pyspark.sql import Window

    tok = df.select(
        F.explode(tokens(F.lower(F.col(text_col)))).alias("token")
    ).filter(F.length("token") > 0)
    counts = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )
    parts = num_partitions or counts.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"
    )
    ranged = counts.repartitionByRange(
        int(parts), F.col("cnt").desc(), F.col("token").asc()
    ).withColumn("__pid", F.spark_partition_id()).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        sizes = {
            r["__pid"]: r["n"]
            for r in ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        if not sizes:  # empty corpus / nothing above min_count
            return counts.select(
                "token", F.lit(0).cast("long").alias("token_id"), "cnt"
            ).limit(0)
        offsets, acc = {}, 0
        for pid in sorted(sizes):
            offsets[pid] = acc
            acc += sizes[pid]
        offset_expr = F.element_at(
            F.create_map(
                *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
            ),
            F.col("__pid"),
        )
        w = Window.partitionBy("__pid").orderBy(F.col("cnt").desc(), F.col("token").asc())
        return (
            ranged.withColumn(
                "token_id",
                (F.row_number().over(w) - 1 + offset_expr).cast("long"),
            )
            .select("token", "token_id", "cnt")
            .localCheckpoint(eager=True)
        )
    finally:
        ranged.unpersist()


def encode_docs(
    df,
    vocab,
    text_col: str = "text",
    id_col: str = "doc_id",
    oov_id: int = -1,
    broadcast_vocab: bool = True,
):
    """Encode each document as its token-id sequence (order-preserving):
    (id, n_tokens, token_ids array<long>). Out-of-vocabulary tokens get
    ``oov_id``. Posexplode → equi-join against the vocab (broadcast for
    normal vocabularies; pass ``broadcast_vocab=False`` to shuffle-join a
    vocabulary too big to broadcast) → re-assemble ordered by position via
    ``array_sort`` over (pos, id) structs — no window, one shuffle back to
    the document key. Zero-token documents (empty/null/whitespace text)
    keep their row with ``n_tokens=0, token_ids=[]`` via a doc-level left
    join back to the input keys (posexplode emits nothing for them —
    review finding).
    """
    tok = df.select(
        F.col(id_col),
        F.posexplode(
            F.filter(tokens(F.lower(F.col(text_col))), lambda t: F.length(t) > 0)
        ).alias("pos", "token"),
    )
    v = vocab.select("token", "token_id")
    if broadcast_vocab:
        v = F.broadcast(v)
    joined = tok.join(v, "token", "left").select(
        id_col,
        F.struct(
            F.col("pos"), F.coalesce("token_id", F.lit(oov_id)).alias("tid")
        ).alias("pt"),
    )
    enc = (
        joined.groupBy(id_col)
        .agg(F.collect_list("pt").alias("pts"))
        .select(
            F.col(id_col),
            F.size("pts").alias("n_tokens"),
            F.transform(F.array_sort("pts"), lambda s: s["tid"]).alias("token_ids"),
        )
    )
    return df.select(F.col(id_col)).join(enc, id_col, "left").select(
        F.col(id_col),
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        F.coalesce("token_ids", F.array().cast("array<long>")).alias("token_ids"),
    )


def dedup_lines(col: Column | str) -> Column:
    """Intra-document repetition removal: drop every line that repeats an
    EARLIER line verbatim, preserving first-occurrence order — the
    in-document half of the published boilerplate filters
    (``duplicate_line_fraction`` is the detector; this is the fixer).

    One codegen-free but document-local expression: split on newlines,
    keep line i iff its first occurrence index is i
    (``array_position == index``). O(lines²) string compares per document —
    document-local, no shuffle, no Python; fine for prose-sized line counts
    (cap line count upstream for pathological inputs).
    """
    c = F.col(col) if isinstance(col, str) else col
    lines = F.split(c, r"\n")
    # blank lines are paragraph STRUCTURE, not repeated content — deduping
    # them merged every paragraph after the second (round-6 review)
    kept = F.filter(
        lines,
        lambda x, i: (F.length(F.trim(x)) == 0)
        | (F.array_position(lines, x) == i + 1),
    )
    return F.array_join(kept, "\n")


def top_ngram_fraction(col: Column | str, n: int = 2) -> Column:
    """Fraction of the document's word n-grams taken by the single most
    frequent n-gram — the published repetition signal ("top-2-gram
    fraction") that catches loop spam ("buy now buy now buy now") which
    line-level dedup misses. 0.0 for documents with fewer than ``n``
    tokens.

    Document-local array expression: build the (non-distinct) n-gram list,
    count each DISTINCT gram's occurrences with an aggregate over the
    list, take the max count over grams, divide by total grams. O(G·D)
    compares per doc (G grams × D distinct) — no shuffle, no Python.
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = F.filter(tokens(c), lambda t: F.length(t) > 0)
    n_g = F.size(toks) - F.lit(n - 1)
    idx = F.when(n_g >= 1, F.sequence(F.lit(1), n_g)).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    counts = F.transform(
        F.array_distinct(grams),
        lambda g: F.size(F.filter(grams, lambda x: x == g)),
    )
    return F.round(
        F.when(
            n_g >= 1,
            F.array_max(counts).cast("double") / F.size(grams),
        ).otherwise(0.0),
        6,
    )


class NBModel(NamedTuple):
    """A trained binary multinomial Naive Bayes text classifier in the
    engine-exact integer-micro-nat form (the ``unigram_logprob_scores``
    float-audit pattern): per-token log-odds weights live in a DataFrame,
    the two scalars ride along as plain ints. ``weights`` is
    vocabulary-bounded — small next to any corpus and broadcastable — so
    persisting a model is one parquet write of (t, w_micros) plus the
    scalars."""

    weights: "DataFrame"  # (t string, w_micros long)
    bias_micros: int  # log prior odds ln(n_pos_docs / n_neg_docs)
    default_micros: int  # weight of a token unseen at TRAINING time


def nb_train(
    df,
    label_col: str,
    text_col: str = "text",
    smoothing: float = 1.0,
):
    """Train a BINARY multinomial Naive Bayes text classifier — the
    closed-form stand-in for the fastText-style quality/language
    classifiers published pretraining pipelines gate on (CCNet's LM +
    classifier tier; RedPajama/FineWeb quality filters). ``label_col``
    must be boolean or 0/1 and NULL-free (a NULL label fails the job —
    round-9 review: silently training NULLs as the negative class would
    corrupt every weight); both classes must be present.

    Distributed shape: ONE groupBy over exploded tokens builds the
    per-class count table (conditional sums, no per-class pass), one
    vocabulary-bounded census collects the totals, and the per-token
    log-odds weight is a pure function of that row's two counts —
    training cost is a single token-level shuffle regardless of class
    balance, and the resulting model is vocabulary-bounded. Weights are
    quantized to integer micro-nats PER TOKEN TYPE before any sum (the
    ``unigram_logprob_scores`` discipline), so downstream scores are
    summation-order-independent and hash-checkable against DuckDB.

    w(t)   = ln((c_pos+a)/(N_pos+aV)) - ln((c_neg+a)/(N_neg+aV))
    bias   = ln(n_pos_docs / n_neg_docs)
    default= ln(a/(N_pos+aV)) - ln(a/(N_neg+aV))   (unseen tokens)

    Because every model input is an ADDITIVE count, training composes
    incrementally: persist ``nb_count_rows`` per labeled batch
    (``write_nb_store``) and derive the model of the UNION corpus any
    time with ``nb_model_from_counts(read_nb_store(...))`` — exactly the
    full retrain, no approximation (equivalence pinned in
    ``tests/test_text.py``); this function is just that composition over
    a single in-memory corpus.
    """
    return nb_model_from_counts(nb_count_rows(df, label_col, text_col), smoothing)


def nb_count_rows(df, label_col: str, text_col: str = "text"):
    """The ADDITIVE store form of a labeled batch for the NB classifier:
    one (t, cp, cn) row per token with per-class occurrence counts, plus
    ONE ``t IS NULL`` prior row carrying the batch's per-class DOCUMENT
    counts (the tokenizer filters empty strings, so a NULL token can never
    collide with a real one). Rows from any number of batches sum
    group-wise into the union corpus's counts — the same merge-on-read
    contract as the dedup stores, and why incremental NB is exact.

    NULL labels fail the job at evaluation time (lazy ``raise_error`` —
    no extra validation pass; ``nb_multi_count_rows`` uses the same
    guard): mapping NULL to either class would silently skew every
    weight, the bias and the default (round-9 review)."""
    lbl = F.col(label_col).cast("int")
    docs = df.select(
        F.when(lbl.isNull(), F.raise_error(
            F.lit(f"binary NB: NULL label in {label_col!r} — filter or impute first")
        ).cast("int"))
        .when(lbl > 0, F.lit(1))
        .otherwise(F.lit(0))
        .alias("__y"),
        F.col(text_col).alias("__txt"),
    )
    tok = docs.select(
        "__y", F.explode(tokens(F.lower(F.col("__txt")))).alias("t")
    ).filter(F.length("t") > 0)
    counts = tok.groupBy("t").agg(
        F.sum("__y").cast("long").alias("cp"),
        F.sum(1 - F.col("__y")).cast("long").alias("cn"),
    )
    prior = docs.agg(
        F.coalesce(F.sum("__y"), F.lit(0)).cast("long").alias("cp"),
        F.coalesce(F.sum(1 - F.col("__y")), F.lit(0)).cast("long").alias("cn"),
    ).select(F.lit(None).cast("string").alias("t"), "cp", "cn")
    return counts.unionByName(prior)


def nb_model_from_counts(counts, smoothing: float = 1.0):
    """Derive the ``NBModel`` from (t, cp, cn) count rows (``nb_count_rows``
    output, possibly many batches' rows concatenated or a ``read_nb_store``
    view) — group-sums duplicates first, so the result is EXACTLY the model
    of the union corpus. One vocabulary-bounded census collect; the weight
    projection is pure codegen over the merged table."""
    import math

    merged = counts.groupBy("t").agg(
        F.sum("cp").alias("cp"), F.sum("cn").alias("cn")
    )
    # two consumers (census + weight projection): checkpoint lazily so the
    # upstream tokenize/store scan runs once (the LM scorers' discipline)
    merged = merged.localCheckpoint(eager=False)
    is_tok = F.col("t").isNotNull()
    tot = merged.agg(
        F.sum(F.when(~is_tok, F.col("cp"))).alias("np_docs"),
        F.sum(F.when(~is_tok, F.col("cn"))).alias("nn_docs"),
        F.sum(F.when(is_tok, F.col("cp"))).alias("tp"),
        F.sum(F.when(is_tok, F.col("cn"))).alias("tn"),
        F.count(F.when(is_tok, F.lit(1))).alias("v"),
    ).collect()[0]
    n_pos_docs, n_neg_docs = int(tot["np_docs"] or 0), int(tot["nn_docs"] or 0)
    if n_pos_docs == 0 or n_neg_docs == 0:
        raise ValueError(
            "binary NB needs both classes: "
            f"got {n_pos_docs} positive / {n_neg_docs} negative documents"
        )
    n_pos, n_neg, v = int(tot["tp"] or 0), int(tot["tn"] or 0), int(tot["v"])
    a = float(smoothing)
    dp, dn = float(n_pos + a * v), float(n_neg + a * v)
    weights = merged.filter(is_tok).select(
        "t",
        F.round(
            1_000_000
            * (F.log((F.col("cp") + a) / F.lit(dp)) - F.log((F.col("cn") + a) / F.lit(dn))),
            0,
        )
        .cast("long")
        .alias("w_micros"),
    )
    # half-away-from-zero, matching Spark/DuckDB round() (Python's round
    # is half-to-even — a tie at micro-nat precision would hash-mismatch)
    _r = lambda x: int(math.copysign(math.floor(abs(x) + 0.5), x))
    bias = _r(1_000_000 * math.log(n_pos_docs / n_neg_docs))
    default = _r(1_000_000 * (math.log(a / dp) - math.log(a / dn)))
    return NBModel(weights, bias, default)


def nb_score(df, model: NBModel, text_col: str = "text", id_col: str = "doc_id"):
    """Score documents under a trained ``nb_train`` model: (id, n_tokens,
    score_micros) where score_micros = bias + Σ per-token log-odds (known
    tokens take their trained weight, unseen tokens the model's smoothed
    default) — positive means the positive class is more likely. Pure
    integer arithmetic after the broadcast join, so the score is
    engine-exact. Scoring shape: token explode + ONE broadcast join
    against the vocabulary-bounded weight table + a per-doc sum — a
    single narrow shuffle on the doc id at any corpus scale. Zero-token
    documents get no row (the LM scorers' contract)."""
    tok = df.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("t")
    ).filter(F.length("t") > 0)
    return (
        tok.join(F.broadcast(model.weights), "t", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (
                F.sum(F.coalesce(F.col("w_micros"), F.lit(model.default_micros)))
                + F.lit(model.bias_micros)
            )
            .cast("long")
            .alias("score_micros"),
        )
    )


_NB_PARAMS_ALGO = "nb-binary-ws-tokens-v1"

# One store-lifecycle implementation for both NB families (round-9 review:
# the binary and multiclass quartets were near-verbatim copies). A family
# is (algo, label, group keys, count columns); the sidecar algo string is
# what makes the two layouts reject each other's paths.
_NB_BINARY_FAMILY = (_NB_PARAMS_ALGO, "nb-count", ("t",), ("cp", "cn"))


def _nb_store_write(rows, path: str, mode: str, family) -> None:
    import os

    from ..operators.dedup import (
        _reject_streaming_layout_append,
        _write_params_sidecar,
    )
    from ..sources.writers import atomic_swap_write

    algo, label, _, _ = family
    if mode == "overwrite":
        atomic_swap_write(
            rows,
            path,
            finalize_staging=lambda staging: _write_params_sidecar(
                os.path.join(staging, "_nb_params.json"), {"algo": algo}
            ),
        )
        return
    # Heal BEFORE probing: a crashed swap leaves the store sidelined in
    # .backup, so the layout guard would read nothing and silently pass —
    # then the heal restores a __batch_id-partitioned store under a flat
    # append (the exact mixed-layout corruption the guard prevents; same
    # heal-before-probe ordering the ingest runners use).
    _nb_store_ensure(path, family)
    _reject_streaming_layout_append(rows, path, label)
    rows.write.mode(mode).parquet(path)


def _nb_store_ensure(path: str, family) -> None:
    import os

    from ..operators.dedup import _validate_store_params, _write_params_sidecar
    from ..sources.writers import recover_interrupted_swap

    algo, label, _, _ = family
    recover_interrupted_swap(path)
    params = {"algo": algo}
    sidecar = os.path.join(path, "_nb_params.json")
    if os.path.exists(sidecar):
        _validate_store_params(sidecar, params, label=label)
        return
    os.makedirs(path, exist_ok=True)
    _write_params_sidecar(sidecar, params)


def _nb_store_merge(df, family):
    _, _, keys, counts = family
    return df.groupBy(*keys).agg(*[F.sum(c).alias(c) for c in counts])


def _nb_store_read(spark, path: str, family):
    _nb_store_ensure(path, family)
    return _nb_store_merge(spark.read.parquet(path), family)


def _nb_store_compact(spark, path: str, family) -> None:
    import os

    from ..operators.dedup import _write_params_sidecar
    from ..sources.readers import read_parquet_or_none
    from ..sources.writers import atomic_swap_write

    algo, label, _, _ = family
    _nb_store_ensure(path, family)
    store = read_parquet_or_none(spark, path)
    if store is None:
        return  # sidecar-only / first-batch store: nothing to compact
    if "__batch_id" in store.columns:
        raise ValueError(
            f"{label} store at {path} has the streaming (__batch_id) layout; "
            "compacting it would double a replayed batch's own counts — "
            "stop the stream and rebuild the store flat first"
        )
    atomic_swap_write(
        _nb_store_merge(store, family),
        path,
        finalize_staging=lambda staging: _write_params_sidecar(
            os.path.join(staging, "_nb_params.json"), {"algo": algo}
        ),
    )


def write_nb_store(rows, path: str, *, mode: str = "append") -> None:
    """Persist ``nb_count_rows`` with an ``_nb_params`` sidecar pinning the
    tokenization/count algorithm (appending rows built under a different
    tokenizer would silently corrupt every weight). Same lifecycle
    discipline as the dedup stores: atomic rebuild on overwrite,
    sidecar-before-data on append, streaming (__batch_id) layouts reject
    batch appends. Smoothing is NOT a store parameter — it applies at
    model derivation, so one store serves any smoothing."""
    _nb_store_write(rows, path, mode, _NB_BINARY_FAMILY)


def ensure_nb_params_sidecar(path: str) -> None:
    """Write-or-validate the ``_nb_params`` sidecar (see
    ``write_nb_store``)."""
    _nb_store_ensure(path, _NB_BINARY_FAMILY)


def read_nb_store(spark, path: str):
    """Load an NB count store (batch-appended flat rows or a streaming
    twin's ``__batch_id`` partitions), validating the sidecar and summing
    per-batch rows into one (t, cp, cn) per key — feed straight into
    ``nb_model_from_counts``. Reading while a streaming batch is
    IN-FLIGHT can see that batch's partial partition (counts slightly
    behind or partial); the stream itself is consistent because a replay
    overwrites its own partition before the checkpoint commits."""
    return _nb_store_read(spark, path, _NB_BINARY_FAMILY)


def compact_nb_store(spark, path: str) -> None:
    """Bound NB store growth: group-sum the per-batch (t, cp, cn) rows
    into one row per key and atomically rewrite (sidecar staged before
    the swap). The STREAMING layout refuses compaction while its
    partitions are live — a replayed batch's own-partition overwrite
    would double counts the compaction already folded in; stop the
    stream and rebuild the store flat first."""
    _nb_store_compact(spark, path, _NB_BINARY_FAMILY)


_NB_MULTI_PARAMS_ALGO = "nb-multi-ws-tokens-v1"

_NB_MULTI_FAMILY = (_NB_MULTI_PARAMS_ALGO, "nb-multi-count", ("l", "t"), ("c",))


def write_nb_multi_store(rows, path: str, *, mode: str = "append") -> None:
    """Persist ``nb_multi_count_rows`` — the multiclass twin of
    ``write_nb_store`` with the same lifecycle (atomic overwrite,
    sidecar-before-data append, streaming-layout reject). The sidecar's
    algo string differs from the binary store's, so pointing one family's
    reader/writer at the other's path rejects instead of mis-merging."""
    _nb_store_write(rows, path, mode, _NB_MULTI_FAMILY)


def ensure_nb_multi_params_sidecar(path: str) -> None:
    """Write-or-validate the multiclass ``_nb_params`` sidecar."""
    _nb_store_ensure(path, _NB_MULTI_FAMILY)


def read_nb_multi_store(spark, path: str):
    """Load a multiclass NB count store, sidecar-validated, per-batch
    rows group-summed — feed straight into
    ``nb_multi_model_from_counts`` (same in-flight-stream caveat as
    ``read_nb_store``)."""
    return _nb_store_read(spark, path, _NB_MULTI_FAMILY)


def compact_nb_multi_store(spark, path: str) -> None:
    """Group-sum the multiclass store to one row per (label, token) and
    atomically rewrite — same contract and streaming-layout guard as
    ``compact_nb_store``."""
    _nb_store_compact(spark, path, _NB_MULTI_FAMILY)


class NBMultiModel(NamedTuple):
    """Multiclass ``nb_train_multiclass`` model: the per-(label, token)
    conditional log-probability rows plus a per-label frame carrying the
    doc-count prior and the unseen-token default. ``nb_classify`` scores
    with one inner join against the observed rows and folds every
    unmatched token — in-vocab-but-unseen-for-the-label and
    out-of-vocabulary alike — into the per-(doc, label) default term,
    which Laplace smoothing makes EXACTLY the dropped zero-count rows'
    value (see the module note below)."""

    weights: "DataFrame"  # (label string, t string, lp_micros long)
    labels: "DataFrame"  # (label string, prior_micros long, default_micros long)


# NOTE (round 10): the grid is SPARSE — one row per OBSERVED (label,
# token) pair, not the complete smoothed V×K product. Under Laplace
# smoothing a count-zero in-vocab token's lp equals the label's
# default_micros exactly, and the scorer's missing-token term
# (n_tokens - matched_for_label) * default covers both in-vocab-unseen
# and out-of-vocab tokens with one expression — so classification is
# bit-identical to the dense grid while the weight table stays
# ∝ observed pairs (the binary family's shape) at any V×K.


def nb_train_multiclass(df, label_col: str, text_col: str = "text", smoothing: float = 1.0):
    """Multiclass multinomial Naive Bayes — ``nb_train`` generalized from
    the binary quality gate to K-way classification (the language-ID /
    domain-routing shape). Same engine-exact discipline: every model
    number is quantized to integer micro-nats as a pure function of
    integer counts, so train + classify hash-match a SQL oracle.

    Distributed shape: ONE groupBy over exploded (label, token) pairs, a
    label census (K rows, collected), and a SPARSE weight table — one row
    per OBSERVED (label, token) pair joined to the broadcast K-row label
    frame (round-9 verdict item 4: the former complete V×K cross join is
    billions of rows of smoothing constants at a multi-million-type
    vocabulary × many labels; observed pairs are bounded by the corpus'
    distinct (label, token) mass, the same sparsity the binary family
    ships).

    lp(label, t) = ln((c(label,t) + a) / (N_label + aV))
    prior(label) = ln(n_docs_label / n_docs_total)
    default(label) = ln(a / (N_label + aV))      (tokens outside V)

    Like the binary trainer, every input is an ADDITIVE count: persist
    ``nb_multi_count_rows`` per labeled batch (``write_nb_multi_store``)
    and ``nb_multi_model_from_counts(read_nb_multi_store(...))`` is
    exactly the full retrain — this function is that composition over one
    in-memory corpus. NULL labels fail the job lazily (``raise_error``),
    as in the binary trainer.
    """
    return nb_multi_model_from_counts(
        nb_multi_count_rows(df, label_col, text_col), smoothing
    )


def nb_multi_count_rows(df, label_col: str, text_col: str = "text"):
    """The ADDITIVE store form of a labeled batch for the MULTICLASS NB
    classifier: one (l, t, c) row per (label, token) with its occurrence
    count, plus ONE ``t IS NULL`` row per label carrying that label's
    DOCUMENT count (the tokenizer filters empty strings, so NULL can
    never collide with a real token). Rows from any number of batches sum
    group-wise into the union corpus's counts. NULL labels fail the job
    at evaluation time (lazy ``raise_error`` — no validation pass)."""
    lbl = F.col(label_col).cast("string")
    docs = df.select(
        F.when(lbl.isNull(), F.raise_error(
            F.lit(f"multiclass NB: NULL label in {label_col!r} — filter or impute first")
        ).cast("string")).otherwise(lbl).alias("l"),
        F.col(text_col).alias("__txt"),
    )
    tok = docs.select(
        "l", F.explode(tokens(F.lower(F.col("__txt")))).alias("t")
    ).filter(F.length("t") > 0)
    counts = tok.groupBy("l", "t").agg(F.count(F.lit(1)).cast("long").alias("c"))
    prior = docs.groupBy("l").agg(F.count(F.lit(1)).cast("long").alias("c")).select(
        "l", F.lit(None).cast("string").alias("t"), "c"
    )
    return counts.unionByName(prior)


def nb_multi_model_from_counts(counts, smoothing: float = 1.0):
    """Derive the ``NBMultiModel`` from (l, t, c) count rows
    (``nb_multi_count_rows`` output — one batch, many batches
    concatenated, or a ``read_nb_multi_store`` view): group-sums
    duplicates first, so the result is EXACTLY the model of the union
    corpus. One K-row label census + one vocabulary count collect; the
    sparse weight build is the broadcast label join the direct trainer
    uses (observed pairs only — see the module note at NBMultiModel)."""
    import math

    merged = counts.groupBy("l", "t").agg(F.sum("c").alias("c"))
    # three consumers (label census, vocab count, grid join): checkpoint
    # lazily so the upstream tokenize/store scan runs once
    merged = merged.localCheckpoint(eager=False)
    is_tok = F.col("t").isNotNull()
    census = {
        r["l"]: (int(r["nd"] or 0), int(r["ntok"] or 0))
        for r in merged.groupBy("l")
        .agg(
            F.sum(F.when(~is_tok, F.col("c"))).alias("nd"),
            F.sum(F.when(is_tok, F.col("c"))).alias("ntok"),
        )
        .collect()
    }
    if len(census) < 2:
        raise ValueError(
            f"multiclass NB needs >= 2 classes: got {sorted(census)}"
        )
    # a label with token rows but no document-prior row means hand-built
    # or torn count input (nb_multi_count_rows always emits the prior) —
    # raise the diagnostic instead of math-domain-erroring on log(0)
    # (round-9 review, matching the binary trainer's explicit guard)
    missing = sorted(l for l, (nd, _) in census.items() if nd <= 0)
    if missing:
        raise ValueError(
            "multiclass NB count rows are missing the t-IS-NULL document-"
            f"prior row for label(s) {missing} — counts are torn or were "
            "not built by nb_multi_count_rows"
        )
    v = merged.filter(is_tok).select("t").distinct().count()
    a = float(smoothing)
    n_total = sum(nd for nd, _ in census.values())
    _r = lambda x: int(math.copysign(math.floor(abs(x) + 0.5), x))
    spark = counts.sparkSession
    labels = spark.createDataFrame(
        [
            (
                l,
                _r(1_000_000 * math.log(census[l][0] / n_total)),
                _r(1_000_000 * math.log(a / (census[l][1] + a * v))),
                float(census[l][1] + a * v),
            )
            for l in sorted(census)
        ],
        "label string, prior_micros long, default_micros long, __denom double",
    )
    # SPARSE weights — observed (label, token) rows ONLY (round-9 verdict
    # item 4: the complete V×K broadcast cross join materializes billions
    # of rows of smoothing constants at a multi-million-type vocabulary).
    # Exactness is free: under Laplace smoothing a count-ZERO in-vocab
    # token's lp is ln((0+a)/denom) = ln(a/denom) = the label's
    # default_micros, so the scorer's per-(doc,label) missing-token term
    # (n_tokens - matched) * default — the binary family's shape, already
    # in nb_classify — reproduces every dropped grid row bit-exactly
    # (model-equality pytest vs an inline dense-grid mirror).
    grid = (
        merged.filter(is_tok)
        .select(F.col("l").alias("label"), "t", "c")
        .join(F.broadcast(labels.select("label", "__denom")), "label")
        .select(
            "label",
            "t",
            F.round(1_000_000 * F.log((F.col("c") + a) / F.col("__denom")), 0)
            .cast("long")
            .alias("lp_micros"),
        )
    )
    return NBMultiModel(grid, labels.drop("__denom"))


def nb_classify(df, model: NBMultiModel, text_col: str = "text", id_col: str = "doc_id"):
    """Classify documents under an ``nb_train_multiclass`` model:
    (id, n_tokens, pred_label, score_micros) — argmax over per-label
    integer scores, ties broken by ascending label (deterministic, so the
    result is hash-exact). Scoring shape: token explode + ONE broadcast
    join against the sparse observed-pair weights + a per-(doc, label)
    sum (unmatched tokens fold into the default term), then a K-way
    argmax folded into the same aggregation — one narrow shuffle on the
    doc id. Zero-token documents get no row (the family contract);
    documents whose every token is out-of-vocabulary still score (the
    per-label default carries them)."""
    tok = df.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("t")
    ).filter(F.length("t") > 0)
    tok = tok.localCheckpoint(eager=False)  # feeds n_tokens + the grid join
    per_doc = tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_tokens"))
    known = (
        tok.join(F.broadcast(model.weights), "t")
        .groupBy(id_col, "label")
        .agg(F.sum("lp_micros").alias("__s"), F.count(F.lit(1)).alias("__k"))
    )
    scored = (
        per_doc.crossJoin(F.broadcast(model.labels))
        .join(known, [id_col, "label"], "left")
        .select(
            id_col,
            "n_tokens",
            "label",
            (
                F.col("prior_micros")
                + F.coalesce(F.col("__s"), F.lit(0))
                + (F.col("n_tokens") - F.coalesce(F.col("__k"), F.lit(0)))
                * F.col("default_micros")
            )
            .cast("long")
            .alias("score_micros"),
        )
    )
    # argmax with ascending-label tie-break: min over (-score, label)
    best = scored.groupBy(id_col, "n_tokens").agg(
        F.min(F.struct((-F.col("score_micros")).alias("ns"), F.col("label").alias("l"))).alias("b")
    )
    return best.select(
        id_col,
        "n_tokens",
        F.col("b.l").alias("pred_label"),
        (-F.col("b.ns")).cast("long").alias("score_micros"),
    )


# C0 controls except \t \n, DEL, and a CURATED format-char subset: soft
# hyphen, zero-width space, bidi marks/embeddings/isolates, word joiner +
# invisible operators, BOM/ZWNBSP. NOT the whole \p{Cf} class — ZWJ
# (U+200D) and ZWNJ (U+200C) are orthographically meaningful (emoji ZWJ
# sequences, Persian/Indic non-joining forms); stripping them conflates
# genuinely different texts, the opposite of what a canonicalizer is for
# (round-9 review; production scrubs keep them too). Explicit ranges
# instead of [\p{Cc}&&[^\n\t]] because the DuckDB oracle's RE2 has no
# class intersection; \x{...} escapes compile identically under
# java.util.regex and RE2.
_CONTROL_CHAR_RE = (
    r"[\x00-\x08\x0B-\x1F\x7F"
    r"\x{00AD}\x{200B}\x{200E}\x{200F}\x{202A}-\x{202E}"
    r"\x{2060}-\x{2064}\x{2066}-\x{2069}\x{FEFF}]"
)


def strip_control_chars(col: Column | str) -> Column:
    """Remove control characters and layout-only format characters (C0
    except tab/newline, DEL, soft hyphen, zero-width space, bidi marks,
    word joiner, BOM) — the standard first scrub over crawled text,
    JVM-side regexp so it rides whole-stage codegen. ZWJ/ZWNJ are KEPT:
    they carry orthographic meaning (see ``_CONTROL_CHAR_RE``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, _CONTROL_CHAR_RE, "")


_NORM_UDFS: dict = {}  # one cached pandas UDF per normalization form


def unicode_normalize(col: Column | str, form: str = "NFC") -> Column:
    """Unicode-normalize a string column (NFC/NFD/NFKC/NFKD) — composed
    vs decomposed accents and compatibility ligatures otherwise defeat
    every downstream equality: exact dedup fingerprints, passage window
    hashes, token counts and classifier vocabularies all treat 'é' and
    'e\\u0301' as different text. Spark has no JVM builtin for this, so it
    is the documented Arrow path: a vectorized pandas UDF over
    ``Series.str.normalize`` (batch-at-a-time, no per-row Python). NULLs
    pass through."""
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form: {form!r}")
    if form not in _NORM_UDFS:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("string")
        def _norm(s):  # type: ignore[no-untyped-def]
            return s.str.normalize(form)

        _NORM_UDFS[form] = _norm
    c = F.col(col) if isinstance(col, str) else col
    return _NORM_UDFS[form](c)


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    form: str = "NFC",
    strip_control: bool = True,
) -> DataFrame:
    """Canonicalize a text column in place: Unicode normalization
    (``unicode_normalize``) plus control/format-character stripping
    (``strip_control_chars``) — the ingest-front scrub that makes byte
    equality mean text equality for everything downstream. One projection,
    one Arrow batch exchange; every other column passes through."""
    c: Column = F.col(text_col)
    if strip_control:
        c = strip_control_chars(c)
    c = unicode_normalize(c, form)
    return df.withColumn(text_col, c)


def char_entropy_microbits(col: Column | str) -> Column:
    """Shannon character entropy of a string, in integer MICRO-BITS
    (``round(-1e6 * p * log2(p))`` summed over distinct codepoints) — the
    classic low-diversity quality signal: near-0 for repeated-character /
    boilerplate spam, ~log2(alphabet) for natural text.

    Engine-exact contract (the NB/logprob micro-nat pattern): each
    codepoint's term is quantized to an integer BEFORE summing, so the
    DuckDB oracle and Spark agree bit-for-bit — the only doubles that
    cross engines are single ``p*log2(p)`` terms whose rounding boundary
    a last-ulp ``log2`` difference cannot realistically straddle.

    Scale shape: map-only, ZERO shuffle — per-row higher-order functions
    (``regexp_extract_all`` → ``array_distinct`` → ``aggregate``) that
    ride whole-stage codegen. Cost is O(distinct_chars * len) per row
    from the replace-based occurrence count; distinct_chars is bounded by
    the alphabet (≤ ~100 for Latin-script corpora), so the quadratic-ish
    term is a small constant factor. ``(?s).`` matches one CODEPOINT in
    both java.util.regex and RE2 (surrogate-pair safe, unlike
    ``split(text, '')`` which shears non-BMP chars into lone surrogates
    on the JVM).
    """
    c = F.col(col) if isinstance(col, str) else col
    t = F.coalesce(c, F.lit(""))
    n = F.length(t).cast("double")

    def term(ch: Column) -> Column:
        k = (F.length(t) - F.length(F.replace(t, ch, F.lit("")))).cast("double")
        p = k / n
        return F.round(F.lit(-1_000_000.0) * p * F.log2(p), 0).cast("long")

    chars = F.array_distinct(F.regexp_extract_all(t, F.lit("(?s)."), F.lit(0)))
    return F.aggregate(chars, F.lit(0).cast("long"), lambda acc, ch: acc + term(ch))


def distinct_char_count(col: Column | str) -> Column:
    """Number of distinct codepoints in a string (entropy's companion
    diversity signal). Same map-only ``(?s).`` extraction as
    ``char_entropy_microbits``."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.coalesce(c, F.lit(""))
    return F.size(F.array_distinct(F.regexp_extract_all(t, F.lit("(?s)."), F.lit(0)))).cast("long")


def compression_ratio_micros(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """zlib compressibility per document: ``round(1e6 * compressed_bytes /
    raw_bytes)`` as (id, n_bytes, ratio_micros) — the RefinedWeb/Dolma-style
    quality gate that catches templated or repetitive text character
    entropy misses (long-range repetition compresses far below natural
    prose's ~400k micro ratio).

    Scale shape: map-only ``mapInPandas`` (zero shuffle); zlib is the one
    genuinely non-SQL step, so this is the documented arrow-py slow path —
    one C-speed deflate per doc over Arrow batches, no row-at-a-time
    Python. Not DuckDB-expressible, so it is pytest-verified against
    direct ``zlib`` rather than oracle-hashed. Empty/null text → n_bytes
    0, ratio 0 (never a divide-by-zero).
    """
    import pandas as pd

    # preserve the caller's id type (string ids are as valid as longs —
    # round-9 review; every computation here is id-type-agnostic)
    id_ddl = df.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_ddl}, n_bytes long, ratio_micros long"

    def _batches(it):
        import zlib

        for pdf in it:
            raw = pdf[text_col].fillna("").map(lambda s: s.encode("utf-8"))
            n = raw.map(len)
            comp = raw.map(lambda b: len(zlib.compress(b, level)))
            ratio = (
                (1_000_000.0 * comp / n.where(n > 0, 1))
                .where(n > 0, 0.0)
                .round()
                .astype("int64")
            )
            yield pd.DataFrame(
                {id_col: pdf[id_col], "n_bytes": n.astype("int64"), "ratio_micros": ratio}
            )

    return df.select(id_col, text_col).mapInPandas(_batches, schema=out_schema)


def pmi_pairs(
    df: DataFrame,
    window: int = 5,
    min_count: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Pointwise mutual information of token pairs co-occurring within
    ``window`` positions (round 10) — the corpus-analysis primitive behind
    phrase mining and collocation extraction (Church & Hanks 1990):
    ``pmi(a,b) = ln(N_pairs * c(a,b) / (c(a) * c(b)))`` over UNORDERED
    within-window pairs, where ``c(a)``/``c(b)`` are each token's pair-slot
    occurrence counts and ``N_pairs`` the total pair count — so the
    estimate is a true probability ratio over the pair event space (both
    marginals sum to 2·N, handled by the +ln(4)-free symmetric form
    below: pmi = ln(N * c_ab / (c_a * c_b)) with c_a counted PER PAIR SLOT,
    exactly reproducible in SQL).

    Engine-exact contract: every count is an exact BIGINT from ONE
    groupBy; the single transcendental is quantized to integer MILLI-nats
    (half-away rounding) as a pure function of those integers, so the
    output (t1, t2, n_pair, n_t1, n_t2, pmi_milli) hash-matches a DuckDB
    recompute. Pairs are canonical (t1 <= t2); a token paired with itself
    ('the ... the') counts like any pair. ``min_count`` bounds the output
    (and the long tail is exactly the noise PMI is famous for without a
    floor).

    Scale shape: pair generation is PURE CODEGEN — per doc, a
    transform-over-positions builds the within-window pair list and ONE
    explode + groupBy counts it (no self-join, no window function, no
    shuffle beyond the two aggs); per-token slot counts derive from the
    SAME pair frame, so the whole op is two map-side-combined aggregates
    over ~window x corpus-token rows."""
    if window < 1:
        raise ValueError(f"window must be >= 1: got {window}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1: got {min_count}")
    # the token array is MATERIALIZED behind a projection before the
    # pair-building lambdas touch it: Catalyst does no common-subexpression
    # elimination inside higher-order functions, so referencing the
    # split+filter expression from within transform() re-tokenized the
    # whole document per position — O(len²) per doc, measured 22x the
    # projected form at sf0.1 (38.6 s -> 1.7 s)
    #
    # round 14: spread first — the pair-building transform/flatten lambdas
    # are INTERPRETED expressions (one thread per row) and ran at raw scan
    # width (10-16 of 32 cores at the bench tiers). No-op on cluster-scale
    # scans. round 15 (advice): project down to the text column BEFORE the
    # exchange (§2.3 — only the bytes the lambdas read shuffle) and
    # hash-spread on xxhash64(text) instead of round-robin — round-robin's
    # sortBeforeRepartition pays a full local sort of the rows per scan
    # task for retry determinism; the hash needs none and is equally
    # deterministic. Duplicate texts co-locate, but the fixture's dup
    # groups are small next to 1/32 of the corpus (and the downstream aggs
    # key on t1/t2, so no ReuseExchange is at stake).
    from ..sources.readers import spread

    tk = spread(df.select(F.col(text_col)), key=text_col, decorrelate=True).select(
        F.filter(tokens(F.lower(F.col(text_col))), lambda t: F.length(t) > 0).alias(
            "__tk"
        )
    )
    toks = F.col("__tk")
    # per position i (1-based), pair token i with tokens i+1 .. i+window —
    # flatten to the doc's within-window pair list, canonicalized. The
    # guard matters: un-guarded sequence(1, size-1) DESCENDS through 0 for
    # 0/1-token docs and element_at(toks, 0) raises (the char_ngrams
    # round-6 lesson).
    idx = F.when(
        F.size(toks) >= 2, F.sequence(F.lit(1), F.size(toks) - 1)
    ).otherwise(F.array().cast("array<int>"))
    pair_of = lambda a, b: F.struct(  # noqa: E731
        F.least(a, b).alias("t1"), F.greatest(a, b).alias("t2")
    )
    pairs_per_doc = F.flatten(
        F.transform(
            idx,
            lambda i: F.transform(
                F.slice(toks, i + 1, window),
                lambda nxt: pair_of(F.element_at(toks, i.cast("int")), nxt),
            ),
        )
    )
    p = tk.select(F.explode(pairs_per_doc).alias("p")).select("p.t1", "p.t2")
    counts = p.groupBy("t1", "t2").agg(F.count(F.lit(1)).cast("long").alias("n_pair"))
    counts = counts.localCheckpoint(eager=False)  # feeds totals + slots + output
    # per-token PAIR-SLOT counts and the pair total, derived from the SAME
    # counted frame (cheap: one explode of the two slots per distinct pair)
    slots = (
        counts.select(F.explode(F.array("t1", "t2")).alias("t"), "n_pair")
        .groupBy("t")
        .agg(F.sum("n_pair").cast("long").alias("n_t"))
    )
    n_total = counts.agg(F.sum("n_pair")).collect()[0][0]
    if not n_total:
        return counts.select(
            "t1", "t2", "n_pair",
            F.lit(None).cast("long").alias("n_t1"),
            F.lit(None).cast("long").alias("n_t2"),
            F.lit(None).cast("long").alias("pmi_milli"),
        ).limit(0)
    # no broadcast hint: the slot table is vocabulary-sized (unbounded at
    # corpus scale) — AQE broadcasts it at runtime when small
    out = (
        counts.filter(F.col("n_pair") >= F.lit(int(min_count)))
        .join(slots.select(F.col("t").alias("t1"), F.col("n_t").alias("n_t1")), "t1")
        .join(slots.select(F.col("t").alias("t2"), F.col("n_t").alias("n_t2")), "t2")
    )
    # marginal product in DOUBLE: n_t can reach 2·N_pairs, and a
    # long×long product overflows int64 at corpus scale (1e13 tokens →
    # 1e26); both engines compute the identical (N·c_ab)/(c_a·c_b) double
    pmi = F.round(
        1000.0
        * F.log(
            (F.lit(float(n_total)) * F.col("n_pair"))
            / (F.col("n_t1").cast("double") * F.col("n_t2").cast("double"))
        ),
        0,
    ).cast("long")
    return out.select("t1", "t2", "n_pair", "n_t1", "n_t2", pmi.alias("pmi_milli"))


_BPE_EOW = "</w>"


def bpe_train(
    df,
    text_col: str = "text",
    num_merges: int = 200,
    max_words: int = 50_000,
    min_word_count: int = 1,
) -> list[tuple[str, str]]:
    """Byte-pair-encoding merge training (Sennrich, Haddow & Birch, ACL
    2016) — learn ``num_merges`` symbol merges from the corpus and return
    them IN ORDER (the merge table IS the tokenizer; pair with
    ``bpe_encode``). Words end with the ``</w>`` marker symbol so merges
    can capture suffixes without crossing word boundaries, exactly the
    published construction.

    Distributed/driver split — the same bounded-census honesty as the IVF
    centroid trainer: the corpus-scale work is ONE distributed word census
    (explode + groupBy), and the merge loop runs driver-side over the
    top-``max_words`` (count DESC, word ASC — deterministic) frequency
    DICTIONARY, which is how production tokenizer training works too (the
    dict, not the corpus, is the training input; 50k types × avg word
    length is megabytes at any corpus size). Ties in pair frequency break
    lexicographically, so the merge table is bit-stable across runs and
    cluster layouts. Merging stops early when no pair repeats
    (``count < 2`` — singleton merges are noise). Cost: O(num_merges ×
    dictionary pair mass) in the driver; the incremental-update variant
    buys a constant factor and is not needed at these dictionary sizes."""
    if num_merges < 1:
        raise ValueError(f"num_merges must be >= 1: got {num_merges}")
    rows = (
        df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= int(min_word_count))
        .orderBy(F.col("c").desc(), F.col("w").asc())
        .limit(int(max_words))
        .collect()
    )
    words: dict[tuple[str, ...], int] = {
        tuple(r["w"]) + (_BPE_EOW,): int(r["c"]) for r in rows
    }
    merges: list[tuple[str, str]] = []
    from collections import Counter

    for _ in range(int(num_merges)):
        pc: Counter = Counter()
        for sym, c in words.items():
            for i in range(len(sym) - 1):
                pc[(sym[i], sym[i + 1])] += c
        if not pc:
            break
        best, best_n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if best_n < 2:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        nxt: dict[tuple[str, ...], int] = {}
        for sym, c in words.items():
            out = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            nxt[tuple(out)] = c
        words = nxt
    return merges


def bpe_encode(
    df,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Apply a trained BPE merge table to a corpus: (id, pieces, n_pieces)
    with each word split into subword pieces by replaying the merges IN
    TRAINING ORDER (subword-nmt semantics) over its character+``</w>``
    sequence — concatenating a word's pieces (dropping the marker)
    reconstructs the word exactly, the invariant the property test pins.
    Unseen words degrade gracefully to whatever merges still apply, down
    to characters — the whole point of BPE over a closed vocabulary.

    Scale shape: map-only ``mapInPandas`` (zero shuffle) — merge replay is
    genuinely procedural, so this is the documented arrow-py path (like
    zlib/multimodal), with an LRU cache over word types per batch (Zipf
    makes the hit rate ~token/type ratio). Tokenization matches the JVM
    ``tokens()`` exactly (ASCII ``\\s+`` split of the trimmed, lowercased
    text), so n_pieces lines up with the engine's token counts."""
    import re

    import pandas as pd

    merge_list = [tuple(m) for m in merges]
    id_ddl = df.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_ddl}, pieces array<string>, n_pieces long"

    def _batches(it):
        from functools import lru_cache

        @lru_cache(maxsize=1 << 16)
        def enc(word: str) -> tuple:
            sym = list(word) + [_BPE_EOW]
            for a, b in merge_list:
                if len(sym) == 1:
                    break
                out = []
                i = 0
                while i < len(sym):
                    if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(sym[i])
                        i += 1
                sym = out
            return tuple(sym)

        for pdf in it:
            pieces = []
            for s in pdf[text_col].fillna(""):
                ps: list[str] = []
                # java \s is ASCII: match tokens()' split class exactly
                for w in re.split(r"\s+", s.lower().strip(), flags=re.ASCII):
                    if w:
                        ps.extend(enc(w))
                pieces.append(ps)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "pieces": pieces,
                    "n_pieces": [len(x) for x in pieces],
                }
            )

    return df.select(id_col, text_col).mapInPandas(_batches, schema=out_schema)
