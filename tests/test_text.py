"""Text-analysis function tests (SURVEY.md §2.10)."""

from pyspark.sql import functions as F

from etl_data_transformer_spark.functions import text as TX


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame([("Hello  World",), ("hello world ",)], ["text"])
    fps = [r["fp"] for r in df.select(TX.fingerprint("text").alias("fp")).collect()]
    assert fps[0] == fps[1]


def test_token_counts(spark):
    df = spark.createDataFrame([("a b  c",), ("one2 three!",)], ["text"])
    out = df.select(
        TX.token_count("text").alias("ws"),
        TX.bpe_token_count("text").alias("bpe"),
    ).collect()
    assert out[0]["ws"] == 3
    # 'one2 three!' → one|2|three|! = 4 BPE-ish tokens
    assert out[1]["bpe"] == 4


def test_punct_ratio(spark):
    df = spark.createDataFrame([("ab!!",), ("abcd",)], ["text"])
    out = [r["p"] for r in df.select(TX.punct_ratio("text").alias("p")).collect()]
    assert out == [0.5, 0.0]


def test_lang_id_markers(spark):
    rows = [
        ("the cat and the dog is here",),  # en markers
        ("der hund und die katze ist da",),  # de markers
        ("xyz qrs",),  # none → und
    ]
    df = spark.createDataFrame(rows, ["text"])
    out = [r["l"] for r in df.select(TX.lang_id("text").alias("l")).collect()]
    assert out == ["en", "de", "und"]


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d",)], ["text"])
    sh = df.select(TX.shingles("text", 3).alias("s")).collect()[0]["s"]
    assert sh == ["a b c", "b c d"]


def test_quality_score_bounds(spark, star):
    scores = (
        star["documents"]
        .select(TX.quality_score("text").alias("q"))
        .agg(F.min("q").alias("lo"), F.max("q").alias("hi"))
        .collect()[0]
    )
    assert 0.0 <= scores["lo"] <= scores["hi"] <= 1.0


def test_duplicate_line_fraction(spark):
    from etl_data_transformer_spark.functions import text as TX

    df = spark.createDataFrame(
        [
            (1, "buy now\nbuy now\nbuy now\nunique line"),
            (2, "all\ndistinct\nlines here"),
            (3, "single line no newlines"),
            (4, "a\n\n\na"),  # blank lines ignored; one dup of two non-blank
        ],
        "id long, text string",
    )
    got = {r["id"]: r["f"] for r in df.select("id", TX.duplicate_line_fraction("text").alias("f")).collect()}
    assert got[1] == 0.5  # 2 of 4 lines are repeats
    assert got[2] == 0.0
    assert got[3] == 0.0
    assert got[4] == 0.5


def test_symbol_word_ratio_and_mean_word_length(spark):
    from etl_data_transformer_spark.functions import text as TX

    df = spark.createDataFrame(
        [(1, "read more... click here... #ad #spam"), (2, "plain normal prose text")],
        "id long, text string",
    )
    rows = {
        r["id"]: r
        for r in df.select(
            "id",
            TX.symbol_word_ratio("text").alias("swr"),
            TX.mean_word_length("text").alias("mwl"),
        ).collect()
    }
    assert rows[1]["swr"] > 0.3 and rows[2]["swr"] == 0.0
    assert 3.0 <= rows[2]["mwl"] <= 6.0


def test_repetition_quality_pass_gates(spark):
    from etl_data_transformer_spark.functions import text as TX

    df = spark.createDataFrame(
        [
            (1, "a perfectly ordinary paragraph of readable text"),
            (2, "spam line\nspam line\nspam line\nspam line"),  # dup lines
            (3, "#### ### ## # ### ## #### ###"),  # symbol soup
        ],
        "id long, text string",
    )
    got = {r["id"]: r["ok"] for r in df.select("id", TX.repetition_quality_pass("text").alias("ok")).collect()}
    assert got[1] is True
    assert got[2] is False
    assert got[3] is False


def test_unigram_logprob_separates_natural_from_gibberish(spark):
    from etl_data_transformer_spark.functions import text as TX

    common = "the quick brown fox jumps over the lazy dog and the cat"
    docs = [(i, common) for i in range(8)]  # corpus dominated by these tokens
    docs.append((100, "the quick brown fox and the dog"))   # natural: common tokens
    docs.append((101, "zxqv jkwpl mnbtr qqoxz vvklm zzjjq"))  # gibberish: singletons
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r["mean_logprob"] for r in TX.unigram_logprob_scores(df).collect()}
    assert got[100] > got[101]  # natural text scores strictly higher
    assert all(v < 0 for v in got.values())  # log-probs
    # deterministic across partitioning
    got2 = {r["doc_id"]: r["mean_logprob"]
            for r in TX.unigram_logprob_scores(df.repartition(5)).collect()}
    assert got == got2


def test_unigram_logprob_empty_and_whitespace_corpus(spark):
    """Round-3 advice: empty/all-whitespace corpora must not crash on a NULL
    token total, and '' must never enter the vocabulary."""
    from etl_data_transformer_spark.functions import text as TX

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert TX.unigram_logprob_scores(empty).collect() == []
    blank = spark.createDataFrame([(1, ""), (2, "   ")], "doc_id long, text string")
    assert TX.unigram_logprob_scores(blank).collect() == []  # no tokens, no rows
    # mixed: blank docs drop, real docs score — and the blank rows must not
    # have poisoned the vocabulary with a zero-length token
    mixed = spark.createDataFrame(
        [(1, ""), (2, "the the the"), (3, " ")], "doc_id long, text string"
    )
    rows = TX.unigram_logprob_scores(mixed).collect()
    assert [r["doc_id"] for r in rows] == [2] and rows[0]["n_tokens"] == 3
    # score identical to the same doc in a corpus WITHOUT blank rows
    alone = spark.createDataFrame([(2, "the the the")], "doc_id long, text string")
    assert rows[0]["mean_logprob"] == TX.unigram_logprob_scores(alone).collect()[0]["mean_logprob"]


def test_unigram_logprob_micros_matches_float_path(spark):
    """quantize_micros: integer micro-nat sums track the float mean (sum ≈
    mean × n × 1e6) and are exactly stable across partitioning."""
    from etl_data_transformer_spark.functions import text as TX

    docs = [(i, "the quick brown fox jumps over the lazy dog") for i in range(5)]
    docs.append((9, "zxqv jkwpl mnbtr"))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    micros = {r["doc_id"]: (r["logprob_micros"], r["n_tokens"])
              for r in TX.unigram_logprob_scores(df, quantize_micros=True).collect()}
    floats = {r["doc_id"]: r["mean_logprob"] for r in TX.unigram_logprob_scores(df).collect()}
    for doc_id, (m, n) in micros.items():
        assert abs(m / (n * 1_000_000) - floats[doc_id]) < 1e-5
    micros2 = {r["doc_id"]: (r["logprob_micros"], r["n_tokens"])
               for r in TX.unigram_logprob_scores(df.repartition(7), quantize_micros=True).collect()}
    assert micros == micros2  # integer sums: exactly partition-independent


def test_bigram_logprob_separates_order_from_shuffle(spark):
    """The bigram scorer sees what unigrams cannot: a doc with the corpus's
    common word ORDER outscores the same bag of words shuffled."""
    from etl_data_transformer_spark.functions import text as TX

    common = "the quick brown fox jumps over the lazy dog"
    docs = [(i, common) for i in range(8)]
    docs.append((100, "the quick brown fox"))      # follows corpus bigrams
    docs.append((101, "fox the brown quick"))      # same words, unseen order
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r["mean_logprob"] for r in TX.bigram_logprob_scores(df).collect()}
    assert got[100] > got[101]
    assert all(v < 0 for v in got.values())
    # stable across partitioning
    got2 = {r["doc_id"]: r["mean_logprob"]
            for r in TX.bigram_logprob_scores(df.repartition(5)).collect()}
    assert got == got2


def test_bigram_logprob_edge_corpora(spark):
    """Sub-two-token docs get no row; empty corpora don't crash; the
    quantized path is partition-exact."""
    from etl_data_transformer_spark.functions import text as TX

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert TX.bigram_logprob_scores(empty).collect() == []
    short = spark.createDataFrame(
        [(1, ""), (2, "word"), (3, "  ")], "doc_id long, text string"
    )
    assert TX.bigram_logprob_scores(short).collect() == []  # no doc has 2 tokens
    mixed = spark.createDataFrame(
        [(1, "one"), (2, "a b a b a"), (3, "")], "doc_id long, text string"
    )
    rows = TX.bigram_logprob_scores(mixed, quantize_micros=True).collect()
    assert [r["doc_id"] for r in rows] == [2] and rows[0]["n_bigrams"] == 4
    rows2 = TX.bigram_logprob_scores(mixed.repartition(4), quantize_micros=True).collect()
    assert rows == rows2


def test_build_vocab_dense_deterministic_ids(spark, star):
    """Ids are dense 0..V-1 in (count DESC, token ASC) order and identical
    under different range-partition counts (the two-phase offset assignment
    must not depend on layout)."""
    from etl_data_transformer_spark.functions.text import build_vocab

    d = star["documents"].filter(F.col("doc_id") < 100)
    v3 = {r["token"]: (r["token_id"], r["cnt"]) for r in build_vocab(d, num_partitions=3).collect()}
    v7 = {r["token"]: (r["token_id"], r["cnt"]) for r in build_vocab(d, num_partitions=7).collect()}
    assert v3 == v7 and len(v3) > 20
    ids = sorted(tid for tid, _ in v3.values())
    assert ids == list(range(len(v3)))  # dense, zero-based
    # global order respected: id increases as (cnt desc, token asc)
    by_id = sorted(v3.items(), key=lambda kv: kv[1][0])
    keys = [(-cnt, tok) for tok, (_, cnt) in by_id]
    assert keys == sorted(keys)


def test_encode_docs_roundtrip_and_oov(spark, star):
    from etl_data_transformer_spark.functions.text import build_vocab, encode_docs, tokens

    d = star["documents"].filter(F.col("doc_id") < 100)
    # the template fixture has no hapax tokens (min count 15) — cut at the
    # median so some tokens stay in-vocab and the rest exercise OOV
    all_counts = sorted(r["cnt"] for r in build_vocab(d, min_count=1).collect())
    cutoff = all_counts[len(all_counts) // 2]
    vocab = build_vocab(d, min_count=cutoff + 1)
    assert 0 < vocab.count() < len(all_counts)
    enc = {r["doc_id"]: r for r in encode_docs(d, vocab).collect()}
    vmap = {r["token"]: r["token_id"] for r in vocab.collect()}
    docs = d.select(
        "doc_id",
        F.filter(tokens(F.lower(F.col("text"))), lambda t: F.length(t) > 0).alias("ts"),
    ).collect()
    assert len(enc) == len(docs)
    oov_seen = False
    for r in docs:
        got = list(enc[r["doc_id"]]["token_ids"])
        want = [vmap.get(t, -1) for t in r["ts"]]
        assert got == want, r["doc_id"]
        assert enc[r["doc_id"]]["n_tokens"] == len(r["ts"])
        oov_seen = oov_seen or -1 in want
    assert oov_seen  # the above-median cutoff must leave OOV tokens


def test_build_vocab_empty_and_min_count(spark):
    from etl_data_transformer_spark.functions.text import build_vocab

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert build_vocab(empty).count() == 0
    df = spark.createDataFrame(
        [(1, "a a a b b c")], "doc_id long, text string"
    )
    v = {r["token"]: r["token_id"] for r in build_vocab(df, min_count=2).collect()}
    assert v == {"a": 0, "b": 1}


def test_dedup_lines_keeps_first_occurrence_order(spark):
    from etl_data_transformer_spark.functions.text import dedup_lines

    df = spark.createDataFrame(
        [
            (1, "a\nb\na\nc\nb\nd"),
            (2, "same\nsame\nsame"),
            (3, "no repeats here"),
            (4, ""),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["out"] for r in df.select("doc_id", dedup_lines("text").alias("out")).collect()}
    assert got[1] == "a\nb\nc\nd"
    assert got[2] == "same"
    assert got[3] == "no repeats here"
    assert got[4] == ""


def test_top_ngram_fraction_detects_loop_spam(spark):
    from etl_data_transformer_spark.functions.text import top_ngram_fraction

    df = spark.createDataFrame(
        [
            (1, "buy now buy now buy now buy now"),
            (2, "a perfectly ordinary sentence with no repeats at all"),
            (3, "one"),
            (4, ""),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r["f"]
        for r in df.select("doc_id", top_ngram_fraction("text", 2).alias("f")).collect()
    }
    # "buy now" appears 4 times of 7 bigrams
    assert abs(got[1] - 4 / 7) < 1e-6
    assert got[2] == 1 / 8  # all bigrams unique -> 1/n_grams (9 tokens)
    assert got[3] == 0.0 and got[4] == 0.0


def test_encode_docs_keeps_zero_token_docs(spark):
    from etl_data_transformer_spark.functions.text import build_vocab, encode_docs

    df = spark.createDataFrame(
        [(1, "a b a"), (2, ""), (3, None), (4, "   ")], "doc_id long, text string"
    )
    vocab = build_vocab(df)
    enc = {r["doc_id"]: r for r in encode_docs(df, vocab).collect()}
    assert set(enc) == {1, 2, 3, 4}
    assert enc[1]["n_tokens"] == 3
    for empty_id in (2, 3, 4):
        assert enc[empty_id]["n_tokens"] == 0
        assert list(enc[empty_id]["token_ids"]) == []


def test_punct_ratio_unicode_and_quality_empty_docs(spark):
    """Round-6 review: accented/CJK letters are NOT punctuation, and
    empty/whitespace documents score 0.0 (not the degenerate 0.505)."""
    from etl_data_transformer_spark.functions.text import punct_ratio, quality_score

    df = spark.createDataFrame(
        [
            (1, "café straße niño"),
            (2, "日本語のテキストです"),
            (3, "!!! ??? ***"),
            (4, ""),
            (5, "   "),
            (6, "hello"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["p"], r["q"])
        for r in df.select(
            "doc_id",
            punct_ratio("text").alias("p"),
            quality_score("text").alias("q"),
        ).collect()
    }
    assert got[1][0] == 0.0 and got[2][0] == 0.0       # letters, not punct
    assert got[3][0] > 0.8                             # real punctuation soup
    assert got[4][1] == 0.0 and got[5][1] == 0.0       # degenerate docs → 0
    assert got[6][1] > 0.5                             # real prose outranks them


def test_stopword_escaping_lang_argmax_and_line_structure(spark):
    """Regex metacharacters in marker words are literal-quoted; lang_id's
    linear argmax keeps earliest-wins ties; dedup_lines preserves blank
    paragraph separators; shingles/char_ngrams guard degenerate inputs."""
    from etl_data_transformer_spark.functions.text import (
        char_ngrams,
        dedup_lines,
        lang_id,
        shingles,
        stopword_count,
    )

    df = spark.createDataFrame(
        [(1, "don.t donut don.t c++")], "doc_id long, text string"
    )
    # unescaped, "don.t" would crash nothing but match "donut" via the dot
    # wildcard (count 3) and "c++" ("unclosed group") would crash the stage
    n = df.select(stopword_count("text", ["don.t", "c++"]).alias("n")).first()["n"]
    assert n == 2  # the two literal don.t hits; donut not matched, no crash

    d2 = spark.createDataFrame(
        [
            (1, "the der le el"),            # every language scores 1 → tie → en
            (2, "zzz qqq"),                  # nothing matches → und
            (3, "der die das und der ist"),  # german wins
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["l"] for r in d2.select("doc_id", lang_id("text").alias("l")).collect()}
    assert got == {1: "en", 2: "und", 3: "de"}

    d3 = spark.createDataFrame(
        [(1, "para one\n\npara two\n\npara three\npara one")],
        "doc_id long, text string",
    )
    cleaned = d3.select(dedup_lines("text").alias("c")).first()["c"]
    assert cleaned == "para one\n\npara two\n\npara three"  # blanks kept, dup line gone

    d4 = spark.createDataFrame([(1, ""), (2, "  "), (3, "ab"), (4, "a b")], "doc_id long, text string")
    rows = {
        r["doc_id"]: (r["s"], r["g"])
        for r in d4.select(
            "doc_id",
            shingles("text", 3).alias("s"),
            char_ngrams("text", 3).alias("g"),
        ).collect()
    }
    assert rows[1][0] == [] and rows[2][0] == []   # no '' shingle for empty docs
    assert rows[3][1] == []                        # no truncated char gram
    assert rows[4][0] == ["a b"]                   # partial word shingle kept (documented)


# --------------------------------------- binary Naive Bayes (round-9) --


def test_nb_train_score_semantics(spark):
    """Train/score contract: separable vocab scores with the right sign,
    unseen tokens take the smoothed default, zero-token docs get no row,
    boolean labels work, a single-class corpus raises."""
    import math

    import pytest

    from etl_data_transformer_spark.functions.text import nb_score, nb_train

    train = spark.createDataFrame(
        [
            (1, "good clean prose flows nicely", True),
            (2, "good well written text here", True),
            (3, "spam spam buy now click", False),
            (4, "click buy spam junk junk", False),
        ],
        "doc_id long, text string, label boolean",
    )
    m = nb_train(train, "label")
    assert m.bias_micros == 0  # 2 vs 2 docs -> ln(1) = 0
    assert m.default_micros == 0  # symmetric totals: N_pos == N_neg == 10

    test = spark.createDataFrame(
        [
            (10, "good prose written nicely"),
            (11, "buy spam click junk"),
            (12, "zzz qqq totally unseen words"),  # all-unknown -> default only
            (13, "   "),  # zero tokens -> no row
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in nb_score(test, m).collect()}
    assert set(got) == {10, 11, 12}
    assert got[10]["score_micros"] > 0
    assert got[11]["score_micros"] < 0
    assert got[12]["score_micros"] == m.bias_micros + 5 * m.default_micros
    assert got[12]["n_tokens"] == 5

    # asymmetric corpus: bias reflects the doc prior, default the totals
    train2 = train.union(
        spark.createDataFrame(
            [(5, "more good text again here", True)],
            "doc_id long, text string, label boolean",
        )
    )
    m2 = nb_train(train2, "label")
    assert m2.bias_micros == int(round(1_000_000 * math.log(3 / 2)))
    assert m2.default_micros < 0  # pos class has more token mass -> a/(Np+aV) smaller

    with pytest.raises(ValueError, match="both classes"):
        nb_train(train.filter("label"), "label")


def test_nb_weights_match_closed_form(spark):
    """Per-token micro-nat weights equal the closed form computed in
    Python over the same counts (the engine-exact contract the oracle
    hash relies on)."""
    import math

    from etl_data_transformer_spark.functions.text import nb_train

    train = spark.createDataFrame(
        [
            (1, "a a b", 1),
            (2, "a c", 0),
            (3, "b b c", 0),
        ],
        "doc_id long, text string, label int",
    )
    m = nb_train(train, "label")
    got = {r["t"]: r["w_micros"] for r in m.weights.collect()}
    # counts: a: pos 2 / neg 1; b: pos 1 / neg 2; c: pos 0 / neg 2
    np_, nn_, v = 3, 5, 3

    def w(cp, cn):
        x = 1_000_000 * (
            math.log((cp + 1) / (np_ + v)) - math.log((cn + 1) / (nn_ + v))
        )
        return int(math.copysign(math.floor(abs(x) + 0.5), x))

    assert got == {"a": w(2, 1), "b": w(1, 2), "c": w(0, 2)}


def test_nb_incremental_store_equals_full_retrain(spark, tmp_path):
    """Counts are additive, so the persisted-store path is EXACT: model
    from (batch-1 rows + batch-2 rows appended) equals nb_train over the
    union corpus — weights, bias and default all identical; compaction
    preserves the model; a tampered sidecar rejects the append."""
    import json
    import os

    import pytest

    from etl_data_transformer_spark.functions import text as TX

    path = str(tmp_path / "nb")
    b1 = spark.createDataFrame(
        [
            (1, "good clean prose flows nicely", 1),
            (2, "spam spam buy now click", 0),
        ],
        "doc_id long, text string, label int",
    )
    b2 = spark.createDataFrame(
        [
            (3, "good well written text here", 1),
            (4, "click buy spam junk junk", 0),
            (5, "more good prose again", 1),
        ],
        "doc_id long, text string, label int",
    )
    TX.write_nb_store(TX.nb_count_rows(b1, "label"), path, mode="overwrite")
    TX.write_nb_store(TX.nb_count_rows(b2, "label"), path)  # append

    def model_key(m):
        return (
            {r["t"]: r["w_micros"] for r in m.weights.collect()},
            m.bias_micros,
            m.default_micros,
        )

    full = TX.nb_train(b1.union(b2), "label")
    inc = TX.nb_model_from_counts(TX.read_nb_store(spark, path))
    assert model_key(inc) == model_key(full)

    # compaction: one row per key, identical model
    TX.compact_nb_store(spark, path)
    store = spark.read.parquet(path)
    assert store.count() == store.select("t").distinct().count()
    assert model_key(TX.nb_model_from_counts(TX.read_nb_store(spark, path))) == model_key(full)

    # sidecar guards the tokenizer/count algorithm
    sidecar = os.path.join(path, "_nb_params.json")
    json.dump({"algo": "other-v9"}, open(sidecar, "w"))
    with pytest.raises(ValueError, match="nb-count"):
        TX.write_nb_store(TX.nb_count_rows(b1, "label"), path)


def test_nb_multiclass_semantics(spark):
    """Multiclass contract: separable 3-way vocab predicts correctly;
    all-OOV documents score prior + n*default per label (and still get a
    prediction); exact ties break by ascending label; NULL or single-class
    labels raise."""
    import pytest

    from etl_data_transformer_spark.functions.text import nb_classify, nb_train_multiclass

    train = spark.createDataFrame(
        [
            (1, "le chat noir dort bien", "fr"),
            (2, "le chien noir mange bien", "fr"),
            (3, "the black cat sleeps well", "en"),
            (4, "the black dog eats well", "en"),
            (5, "el gato negro duerme bien", "es"),
            (6, "el perro negro come bien", "es"),
        ],
        "doc_id long, text string, lang string",
    )
    m = nb_train_multiclass(train, "lang")
    # SPARSE weights: one row per OBSERVED (label, token) pair only —
    # never the complete V×K product (round-10; unseen-for-label tokens
    # ride the default term, equality pinned below)
    v = m.weights.select("t").distinct().count()
    assert m.weights.count() < v * 3
    obs = {(r["label"], r["t"]) for r in m.weights.collect()}
    assert ("fr", "cat") not in obs and ("en", "chat") not in obs

    test = spark.createDataFrame(
        [
            (10, "le chat dort"),
            (11, "the cat sleeps"),
            (12, "el gato duerme"),
            (13, "zzz qqq www"),  # all OOV
            (14, " "),  # zero tokens -> no row
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in nb_classify(test, m).collect()}
    assert {k: got[k]["pred_label"] for k in (10, 11, 12)} == {
        10: "fr", 11: "en", 12: "es"
    }
    assert 14 not in got
    # OOV doc: score = prior + 3*default for the winning label; with
    # identical doc priors and identical token mass per class, all three
    # scores TIE and the ascending-label break picks 'en'
    lab = {r["label"]: r for r in m.labels.collect()}
    assert len({(r["prior_micros"], r["default_micros"]) for r in lab.values()}) == 1
    assert got[13]["pred_label"] == "en"
    assert got[13]["score_micros"] == lab["en"]["prior_micros"] + 3 * lab["en"]["default_micros"]

    with pytest.raises(ValueError, match=">= 2 classes"):
        nb_train_multiclass(train.filter("lang = 'fr'"), "lang")
    # NULL labels fail lazily at census evaluation (raise_error, matching
    # the binary trainer — round-9 store refactor)
    with pytest.raises(Exception, match="NULL label"):
        nb_train_multiclass(
            train.selectExpr("doc_id", "text", "if(doc_id = 1, NULL, lang) as lang"),
            "lang",
        )


def test_nb_train_rejects_null_labels(spark):
    """Round-9 review: a NULL label must fail the job (lazily, at count
    evaluation) instead of silently training as the negative class —
    matching nb_train_multiclass's rejection."""
    import pytest

    from etl_data_transformer_spark.functions.text import nb_train

    df = spark.createDataFrame(
        [(1, "good text", 1), (2, "bad text", 0), (3, "mystery text", None)],
        "doc_id long, text string, label int",
    )
    with pytest.raises(Exception, match="NULL label"):
        nb_train(df, "label")


def test_nb_multi_incremental_store_equals_full_retrain(spark, tmp_path):
    """Multiclass counts are additive too: model from two appended
    batches' store rows equals nb_train_multiclass over the union —
    grid, priors and defaults identical; compaction preserves the model;
    the binary and multi sidecars reject each other's paths."""
    import pytest

    from etl_data_transformer_spark.functions import text as TX

    path = str(tmp_path / "nbm")
    schema = "doc_id long, text string, lang string"
    b1 = spark.createDataFrame(
        [
            (1, "le chat noir dort bien", "fr"),
            (3, "the black cat sleeps well", "en"),
            (5, "el gato negro duerme bien", "es"),
        ],
        schema,
    )
    b2 = spark.createDataFrame(
        [
            (2, "le chien noir mange bien", "fr"),
            (4, "the black dog eats well", "en"),
            (6, "el perro negro come bien", "es"),
        ],
        schema,
    )
    TX.write_nb_multi_store(TX.nb_multi_count_rows(b1, "lang"), path, mode="overwrite")
    TX.write_nb_multi_store(TX.nb_multi_count_rows(b2, "lang"), path)

    def model_key(m):
        return (
            {(r["label"], r["t"]): r["lp_micros"] for r in m.weights.collect()},
            {
                r["label"]: (r["prior_micros"], r["default_micros"])
                for r in m.labels.collect()
            },
        )

    full = TX.nb_train_multiclass(b1.union(b2), "lang")
    inc = TX.nb_multi_model_from_counts(TX.read_nb_multi_store(spark, path))
    assert model_key(inc) == model_key(full)
    # classification agrees on every doc
    test = b1.union(b2).select("doc_id", "text")
    assert {
        r["doc_id"]: r["pred_label"] for r in TX.nb_classify(test, inc).collect()
    } == {r["doc_id"]: r["pred_label"] for r in TX.nb_classify(test, full).collect()}

    TX.compact_nb_multi_store(spark, path)
    assert model_key(TX.nb_multi_model_from_counts(TX.read_nb_multi_store(spark, path))) == model_key(full)

    # the binary reader/writer rejects the multiclass store and vice versa
    with pytest.raises(ValueError, match="nb-count"):
        TX.read_nb_store(spark, path)
    bpath = str(tmp_path / "nbb")
    b = spark.createDataFrame(
        [(1, "good text", 1), (2, "bad text", 0)], "doc_id long, text string, label int"
    )
    TX.write_nb_store(TX.nb_count_rows(b, "label"), bpath, mode="overwrite")
    with pytest.raises(ValueError, match="nb-multi-count"):
        TX.read_nb_multi_store(spark, bpath)


def test_nb_multi_model_rejects_torn_counts(spark):
    """Round-9 review: count rows missing a label's document-prior row
    raise the diagnostic instead of a math-domain error."""
    import pytest

    rows = spark.createDataFrame(
        [("en", "hello", 3), ("en", None, 2), ("fr", "bonjour", 2)],  # fr prior missing
        "l string, t string, c long",
    )
    from etl_data_transformer_spark.functions.text import nb_multi_model_from_counts

    with pytest.raises(ValueError, match="document-.?prior"):
        nb_multi_model_from_counts(rows)


def test_top_fraction_exact_at_non_dyadic_fracs(spark):
    """Round-9 review: 100 * 0.07 = 7.000000000000001 in IEEE doubles —
    the keep count must still be exactly ceil(7) = 7, not 8."""
    from etl_data_transformer_spark.operators.curation import top_fraction_per_group

    df = spark.createDataFrame(
        [(i, "g", 100 - i) for i in range(100)], "doc_id long, grp string, s long"
    )
    assert top_fraction_per_group(df, "s", 0.07, by="grp").count() == 7
    assert top_fraction_per_group(df, "s", 0.1, by="grp").count() == 10
    # 99 rows at 0.07 -> ceil(6.93) = 7
    assert top_fraction_per_group(df.filter("doc_id < 99"), "s", 0.07, by="grp").count() == 7


def test_unicode_normalize_and_control_strip(spark):
    """Round-9 canonicalization: composed == decomposed after NFC (pinned
    against Python's unicodedata), NFKC folds compatibility ligatures,
    control/format chars strip while tab+newline survive, NULLs pass
    through, bad forms raise."""
    import unicodedata

    import pytest

    from etl_data_transformer_spark.functions.text import (
        normalize_text,
        strip_control_chars,
        unicode_normalize,
    )

    decomposed = "Café du Monde"          # e + combining acute
    composed = "Café du Monde"             # é precomposed
    liga = "ﬁne ① text"               # ﬁ ligature + circled one
    ctrl = "ab\x00c​d﻿e\tf\ng"        # NUL, ZWSP(Cf), BOM(Cf); keep \t \n
    df = spark.createDataFrame(
        [(1, decomposed), (2, composed), (3, liga), (4, ctrl), (5, None)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["text"]
        for r in normalize_text(df, "text", form="NFC").collect()
    }
    assert got[1] == got[2] == unicodedata.normalize("NFC", decomposed)
    assert got[4] == "abcde\tf\ng"
    assert got[5] is None
    # NFKC folds the ligature and the circled digit
    nfkc = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", unicode_normalize("text", "NFKC").alias("n")
        ).collect()
    }
    assert nfkc[3] == unicodedata.normalize("NFKC", liga) == "fine 1 text"
    # strip alone leaves unicode intact
    stripped = df.select("doc_id", strip_control_chars("text").alias("s")).collect()
    assert {r["doc_id"]: r["s"] for r in stripped}[1] == decomposed
    # ZWJ/ZWNJ are orthographically meaningful and must SURVIVE the scrub
    # (emoji ZWJ sequences, Persian non-joining forms — round-9 review),
    # while soft hyphen and bidi marks strip
    joined = "x\u200dy\u200cz\u00ad\u200e!"
    out = (
        spark.createDataFrame([(joined,)], "text string")
        .select(strip_control_chars("text").alias("s"))
        .collect()[0]["s"]
    )
    assert out == "x\u200dy\u200cz!"
    with pytest.raises(ValueError, match="normalization form"):
        unicode_normalize("text", "NFX")


def test_char_entropy_known_values(spark):
    from etl_data_transformer_spark.functions.text import (
        char_entropy_microbits,
        distinct_char_count,
    )

    rows = [
        (1, "aaaa"),  # zero diversity -> 0
        (2, "ab"),  # two equiprobable chars -> exactly 1 bit
        (3, "aabb"),  # same distribution, longer -> still 1 bit
        (4, "abcd"),  # four equiprobable -> 2 bits
        (5, ""),  # empty -> 0, no NaN/div-by-zero
        (6, None),  # null -> 0
        (7, "\U0001f4a7\U0001f4a7aa"),  # non-BMP: surrogate-pair safe 1 bit
        (8, "abab" * 64),  # long repetitive -> still exactly 1 bit
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["e"], r["d"])
        for r in df.select(
            "doc_id",
            char_entropy_microbits("text").alias("e"),
            distinct_char_count("text").alias("d"),
        ).collect()
    }
    assert got[1] == (0, 1)
    assert got[2] == (1_000_000, 2)
    assert got[3] == (1_000_000, 2)
    assert got[4] == (2_000_000, 4)
    assert got[5] == (0, 0)
    assert got[6] == (0, 0)
    # the emoji must count as ONE codepoint, not two lone surrogates
    assert got[7] == (1_000_000, 2)
    assert got[8] == (1_000_000, 2)


def test_char_entropy_matches_python_mirror(spark):
    """Seeded random strings: Spark's per-term quantized sum equals the
    Python mirror computing the identical micro-bit arithmetic (half-away
    rounding — Python round() is half-to-even, so mirror via floor+0.5)."""
    import collections
    import math
    import random

    from etl_data_transformer_spark.functions.text import char_entropy_microbits

    rng = random.Random(9)
    alphabet = "abcdefgh é世\U0001f4a7"
    rows = [
        (i, "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 200))))
        for i in range(40)
    ]

    def mirror(t: str) -> int:
        n = len(t)
        s = 0
        for k in collections.Counter(t).values():
            p = k / n
            term = -1_000_000.0 * p * math.log2(p)
            s += int(math.copysign(math.floor(abs(term) + 0.5), term))
        return s

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["e"]
        for r in df.select("doc_id", char_entropy_microbits("text").alias("e")).collect()
    }
    for i, t in rows:
        assert got[i] == mirror(t), (i, t)


def test_compression_ratio_matches_zlib(spark):
    import zlib

    from etl_data_transformer_spark.functions.text import compression_ratio_micros

    rows = [
        (1, "natural prose varies quite a bit in its character usage."),
        (2, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),
        (3, ""),
        (4, None),
        (5, "tick tock " * 50),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bytes"], r["ratio_micros"])
        for r in compression_ratio_micros(df).collect()
    }
    for i, t in rows:
        raw = (t or "").encode("utf-8")
        if not raw:
            assert got[i] == (0, 0)
            continue
        want = int(round(1_000_000.0 * len(zlib.compress(raw, 6)) / len(raw)))
        assert got[i] == (len(raw), want)
    # the quality signal itself: repetitive text compresses far below prose
    assert got[2][1] < got[1][1] and got[5][1] < got[1][1]
    # non-integer ids pass through with their own type (round-9 review)
    sdf = spark.createDataFrame([("web-17", "some web text here")], "doc_id string, text string")
    srow = compression_ratio_micros(sdf).collect()[0]
    assert srow["doc_id"] == "web-17" and srow["n_bytes"] == 18


def test_nb_multiclass_sparse_equals_dense_grid(spark):
    """Model equality vs the dense form (round-9 verdict item 4): scoring
    under the SPARSE observed-pair weights must be bit-identical to an
    inline COMPLETE smoothed V×K grid mirror — a zero-count in-vocab
    token's grid row round(1e6*ln(a/denom)) is exactly the label's
    default_micros, so the scorer's missing-token default term reproduces
    every dropped row."""
    from pyspark.sql import functions as F

    from etl_data_transformer_spark.functions.text import (
        NBMultiModel,
        nb_classify,
        nb_train_multiclass,
    )

    train = spark.createDataFrame(
        [
            (1, "le chat noir dort bien sous le toit", "fr"),
            (2, "le chien noir mange bien et dort", "fr"),
            (3, "the black cat sleeps well at night", "en"),
            (4, "the black dog eats well and sleeps", "en"),
            (5, "el gato negro duerme bien cada noche", "es"),
            (6, "el perro negro come bien y duerme", "es"),
        ],
        "doc_id long, text string, lang string",
    )
    m = nb_train_multiclass(train, "lang")
    # densify: complete V×K grid where missing pairs take the label's
    # default (the exactness identity under Laplace smoothing)
    vocab = m.weights.select("t").distinct()
    dense = (
        vocab.crossJoin(F.broadcast(m.labels.select("label", "default_micros")))
        .join(m.weights, ["label", "t"], "left")
        .select(
            "label",
            "t",
            F.coalesce(F.col("lp_micros"), F.col("default_micros")).alias("lp_micros"),
        )
    )
    dense_model = NBMultiModel(dense, m.labels)
    test = spark.createDataFrame(
        [
            (10, "le chat dort bien"),
            (11, "the cat sleeps at night"),
            (12, "el gato duerme y come"),
            (13, "noir black negro bien well"),  # cross-language mix
            (14, "zzz qqq"),  # all OOV
        ],
        "doc_id long, text string",
    )
    sparse_scores = {
        (r["doc_id"]): (r["pred_label"], r["score_micros"], r["n_tokens"])
        for r in nb_classify(test, m).collect()
    }
    dense_scores = {
        (r["doc_id"]): (r["pred_label"], r["score_micros"], r["n_tokens"])
        for r in nb_classify(test, dense_model).collect()
    }
    assert sparse_scores == dense_scores


def test_pmi_pairs_matches_naive(spark):
    """PMI collocations vs a python mirror: identical pair construction
    (within-window, canonical order, self-pairs allowed), identical
    pair-slot marginals, identical milli-nat quantization; min_count
    floors the output; empty/whitespace corpora return empty."""
    import math
    from collections import Counter

    from etl_data_transformer_spark.functions.text import pmi_pairs

    docs = [
        (1, "the cat sat on the mat"),
        (2, "the cat ate the cream"),
        (3, "a dog sat on a log"),
        (4, "   "),
        (5, "solo"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    W, MC = 3, 2
    got = {
        (r["t1"], r["t2"]): (r["n_pair"], r["n_t1"], r["n_t2"], r["pmi_milli"])
        for r in pmi_pairs(df, window=W, min_count=MC).collect()
    }

    pairs = Counter()
    for _, text in docs:
        tk = [t for t in text.lower().split() if t]
        for i in range(len(tk) - 1):
            for j in range(i + 1, min(i + W, len(tk) - 1) + 1):
                a, b = sorted((tk[i], tk[j]))
                pairs[(a, b)] += 1
    slots = Counter()
    for (a, b), c in pairs.items():
        slots[a] += c
        slots[b] += c
    n = float(sum(pairs.values()))
    want = {}
    for (a, b), c in pairs.items():
        if c >= MC:
            v = 1000.0 * math.log((n * c) / (float(slots[a]) * float(slots[b])))
            want[(a, b)] = (c, slots[a], slots[b], int(math.copysign(math.floor(abs(v) + 0.5), v)))
    assert got == want
    assert ("the", "the") in pairs  # self-pair constructed ('the ... the')

    import pytest

    with pytest.raises(ValueError, match="window"):
        pmi_pairs(df, window=0)
    with pytest.raises(ValueError, match="min_count"):
        pmi_pairs(df, min_count=0)
    empty = spark.createDataFrame([(1, " "), (2, "one")], "doc_id long, text string")
    assert pmi_pairs(empty).count() == 0


def test_bpe_train_classic_corpus(spark):
    """The BPE paper's shape: suffix-heavy corpus learns ('e','s'),
    ('es','t'), ('est','</w>') early; merges are deterministic, ordered,
    and stop early when no pair repeats."""
    from etl_data_transformer_spark.functions.text import bpe_train

    corpus = (["low"] * 5) + (["lower"] * 2) + (["newest"] * 6) + (["widest"] * 3)
    df = spark.createDataFrame([(1, " ".join(corpus))], "doc_id long, text string")
    merges = bpe_train(df, num_merges=10)
    assert merges[0] == ("e", "s")      # 9 occurrences (newest+widest)
    assert merges[1] == ("es", "t")     # still 9
    assert merges[2] == ("est", "</w>")
    assert len(merges) <= 10
    # determinism across partitionings
    df2 = spark.createDataFrame(
        [(i, w) for i, w in enumerate(corpus)], "doc_id long, text string"
    ).repartition(7)
    assert bpe_train(df2, num_merges=10) == merges
    # no repeating pair -> early stop, empty table
    uniq = spark.createDataFrame([(1, "ab cd ef")], "doc_id long, text string")
    assert bpe_train(uniq, num_merges=5) == []


def test_bpe_encode_reconstruction_and_saturation(spark):
    """Every word's pieces concatenate back to the word (+marker); trained
    words saturate to ONE piece with enough merges; unseen words degrade
    gracefully to partial merges/chars; determinism across partitions."""
    from etl_data_transformer_spark.functions.text import bpe_encode, bpe_train

    corpus = (["low"] * 5) + (["newest"] * 6)
    train = spark.createDataFrame([(1, " ".join(corpus))], "doc_id long, text string")
    merges = bpe_train(train, num_merges=50)
    docs = spark.createDataFrame(
        [(1, "low newest"), (2, "lowest"), (3, "zzz"), (4, "  "), (5, None)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["pieces"], r["n_pieces"]) for r in bpe_encode(docs, merges).collect()}
    # saturation: both trained words are single pieces
    assert got[1][0] == ["low</w>", "newest</w>"] and got[1][1] == 2
    # reconstruction invariant for every doc
    for did, (pieces, n) in got.items():
        assert n == len(pieces)
        text = {1: "low newest", 2: "lowest", 3: "zzz", 4: "", 5: ""}[did]
        words = text.split()
        rebuilt, cur = [], ""
        for p in pieces:
            cur += p
            if cur.endswith("</w>"):
                rebuilt.append(cur[: -len("</w>")])
                cur = ""
        assert cur == "" and rebuilt == words, did
    # unseen word reuses applicable merges ('lowest' shares 'low' + 'est')
    assert "est" in "".join(got[2][0]) and got[2][1] > 1
    assert got[4] == ([], 0) and got[5] == ([], 0)
    # determinism across partitioning
    got2 = {
        r["doc_id"]: (r["pieces"], r["n_pieces"])
        for r in bpe_encode(docs.repartition(5), merges).collect()
    }
    assert got2 == got


def test_bpe_train_matches_naive_mirror(spark):
    """bpe_train vs an independent in-test Sennrich reference over a
    randomized-ish multi-word corpus (fixed seed)."""
    import random
    from collections import Counter

    from etl_data_transformer_spark.functions.text import bpe_train

    rng = random.Random(7)
    vocab = ["apple", "apply", "ample", "maple", "pale", "leap", "plea"]
    words = [rng.choice(vocab) for _ in range(200)]
    df = spark.createDataFrame(
        [(i, " ".join(words[i * 20 : (i + 1) * 20])) for i in range(10)],
        "doc_id long, text string",
    )
    got = bpe_train(df, num_merges=12)

    wc = Counter(words)
    syms = {tuple(w) + ("</w>",): c for w, c in wc.items()}
    want = []
    for _ in range(12):
        pc = Counter()
        for sym, c in syms.items():
            for i in range(len(sym) - 1):
                pc[(sym[i], sym[i + 1])] += c
        if not pc:
            break
        best, n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:
            break
        want.append(best)
        a, b = best
        nxt = {}
        for sym, c in syms.items():
            out, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            nxt[tuple(out)] = c
        syms = nxt
    assert got == want
