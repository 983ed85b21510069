"""UDF/UDAF/UDTF surface tests (SURVEY.md §2.10): each extension point's
template works and matches an exact reference computation."""

import math

from pyspark.sql import functions as F

from etl_data_transformer_spark.functions.udfs import SplitSentences, sigmoid, weighted_avg


def test_scalar_pandas_udf_sigmoid(spark):
    df = spark.createDataFrame([(0.0,), (2.0,), (-2.0,)], ["x"])
    got = {round(r["x"], 1): r["s"] for r in df.select("x", sigmoid("x").alias("s")).collect()}
    for x, s in got.items():
        assert abs(s - 1.0 / (1.0 + math.exp(-x))) < 1e-12


def test_grouped_agg_udaf_weighted_avg(spark, star):
    li = star["lineitem"].limit(2000)
    got = {
        r["l_returnflag"]: r["wavg"]
        for r in li.groupBy("l_returnflag")
        .agg(weighted_avg("l_extendedprice", "l_quantity").alias("wavg"))
        .collect()
    }
    exact = {
        r["l_returnflag"]: r["e"]
        for r in li.groupBy("l_returnflag")
        .agg((F.sum(F.col("l_extendedprice") * F.col("l_quantity")) / F.sum("l_quantity")).alias("e"))
        .collect()
    }
    assert set(got) == set(exact)
    for k in got:
        assert abs(got[k] - exact[k]) / exact[k] < 1e-9


def test_udtf_split_sentences(spark):
    df = spark.createDataFrame([(1, "One. Two! Three"), (2, "")], ["doc_id", "text"])
    out = df.lateralJoin(SplitSentences(F.col("text").outer())).collect()
    rows = {(r["doc_id"], r["sentence_idx"]): r["sentence"] for r in out if r["sentence_idx"] is not None}
    assert rows == {(1, 0): "One.", (1, 1): "Two!", (1, 2): "Three"}
