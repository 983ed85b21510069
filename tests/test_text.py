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
