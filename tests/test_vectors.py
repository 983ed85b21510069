"""Vector expression tests (functions/vector.py)."""

from pyspark.sql import functions as F


def test_matryoshka_truncate_unit_norm_and_rank_preservation(spark, star):
    from etl_data_transformer_spark.functions.vector import (
        cosine,
        l2_norm,
        matryoshka_truncate,
    )

    e = star["embeddings"].filter(F.col("vec_id") < 50)
    t = e.select("vec_id", matryoshka_truncate("embedding", 16).alias("t"))
    rows = t.select("vec_id", F.size("t").alias("d"), l2_norm("t").alias("n")).collect()
    assert all(r["d"] == 16 for r in rows)
    assert all(abs(r["n"] - 1.0) < 1e-9 for r in rows)
    # cosine on truncated vectors correlates with full-precision cosine:
    # for each of a few queries, the full-space top-1 neighbor should rank
    # in the truncated top-10 (loose, fixture-level sanity of the trade)
    full = e.alias("a").crossJoin(e.alias("b")).filter(F.col("a.vec_id") < F.col("b.vec_id"))
    sims = full.select(
        F.col("a.vec_id").alias("qa"),
        F.col("b.vec_id").alias("qb"),
        cosine(F.col("a.embedding"), F.col("b.embedding")).alias("cf"),
    )
    tt = t.alias("x").crossJoin(t.alias("y")).filter(F.col("x.vec_id") < F.col("y.vec_id"))
    sims_t = tt.select(
        F.col("x.vec_id").alias("qa"),
        F.col("y.vec_id").alias("qb"),
        cosine(F.col("x.t"), F.col("y.t")).alias("ct"),
    )
    j = sims.join(sims_t, ["qa", "qb"]).collect()
    import statistics

    cf = [r["cf"] for r in j]
    ct = [r["ct"] for r in j]
    # positive correlation between full and truncated similarity
    mf, mt = statistics.mean(cf), statistics.mean(ct)
    cov = sum((a - mf) * (b - mt) for a, b in zip(cf, ct))
    var_f = sum((a - mf) ** 2 for a in cf)
    var_t = sum((b - mt) ** 2 for b in ct)
    corr = cov / (var_f**0.5 * var_t**0.5)
    # fixture embeddings are random (not MRL-trained), so the expected
    # full-vs-prefix similarity correlation is ~sqrt(dim/D) = sqrt(16/64)
    # = 0.5; assert we land near that statistical floor (MRL-trained
    # vectors would score far higher)
    assert corr > 0.35, corr


def test_matryoshka_truncate_validations(spark):
    import pytest

    from etl_data_transformer_spark.functions.vector import matryoshka_truncate

    with pytest.raises(ValueError):
        matryoshka_truncate("embedding", 0)
    df = spark.createDataFrame([(1, [1.0, 2.0])], "id long, embedding array<double>")
    with pytest.raises(Exception, match="shorter than dim"):
        df.select(matryoshka_truncate("embedding", 8).alias("t")).collect()
