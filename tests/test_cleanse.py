"""Cleanse pipeline e2e (SURVEY.md §3.3, reference T:1-18)."""

import os

from etl_data_transformer_spark.plans.cleanse import cleanse, impute_nulls, normalize_columns


def _write_messy_csv(spark, path):
    """CSV dump of customer-ish rows: mixed-case headers, nulls, duplicates
    (FIXTURES.md role-mapping for the cleanse input)."""
    rows = [
        ("1", "Alice", "10.5"),
        ("2", "Bob", ""),
        ("2", "Bob", ""),  # duplicate
        ("3", "", "7.0"),
        ("1", "Alice", "10.5"),  # duplicate
    ]
    import csv

    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["C_CustKey", "C_Name", "C_AcctBal"])
        w.writerows(rows)


def test_cleanse_end_to_end(spark, tmp_path):
    src = str(tmp_path / "in.csv")
    out = str(tmp_path / "out.parquet")
    _write_messy_csv(spark, src)
    report = cleanse(spark, src, out)
    assert report.input_rows == 5
    assert report.duplicate_rows == 2
    assert report.output_rows == 3
    result = spark.read.parquet(out)
    assert result.columns == ["c_custkey", "c_name", "c_acctbal"]  # P1 lowercased
    assert result.count() == 3
    # P2: numeric nulls imputed with 0
    assert result.filter("c_acctbal IS NULL").count() == 0
    assert os.path.isdir(out)


def test_normalize_columns(spark):
    df = spark.createDataFrame([(1, 2)], ["Foo", "BAR_baz"])
    assert normalize_columns(df).columns == ["foo", "bar_baz"]


def test_impute_nulls_numeric_only_by_default(spark):
    df = spark.createDataFrame([(None, None)], "n double, s string")
    out = impute_nulls(df).collect()[0]
    assert out["n"] == 0.0 and out["s"] is None  # documented deviation §7.4.2
    out2 = impute_nulls(df, string_value="0").collect()[0]
    assert out2["s"] == "0"


def test_read_csv_quarantines_malformed(spark, tmp_path):
    """Malformed rows null out (PERMISSIVE) and land in the corrupt column
    for triage instead of failing the load (the 100 TB posture; pandas
    read_csv would raise)."""
    from pyspark.sql import types as T

    from etl_data_transformer_spark.sources.readers import read_csv

    p = tmp_path / "bad.csv"
    p.write_text("id,amount\n1,10.5\nnot_a_number_row,,extra,fields\n3,30.0\n")
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("amount", T.DoubleType())]
    )
    df = read_csv(spark, str(p), schema=schema, corrupt_col="_corrupt").cache()
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["amount"] == 10.5 and rows[1]["_corrupt"] is None
    assert rows[3]["amount"] == 30.0
    bad = [r for r in df.collect() if r["_corrupt"] is not None]
    assert len(bad) == 1 and "not_a_number_row" in bad[0]["_corrupt"]
    df.unpersist()


def test_read_csv_dropmalformed(spark, tmp_path):
    from pyspark.sql import types as T

    from etl_data_transformer_spark.sources.readers import read_csv

    p = tmp_path / "bad2.csv"
    p.write_text("id,amount\n1,10.5\nx,y,z,w\n3,30.0\n")
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("amount", T.DoubleType())]
    )
    df = read_csv(spark, str(p), schema=schema, mode="DROPMALFORMED")
    assert sorted(r["id"] for r in df.collect()) == [1, 3]


def test_read_jsonl_quarantines_malformed(spark, tmp_path):
    """JSONL scan with corrupt-record quarantine: parseable lines land typed,
    the broken line is captured raw in the corrupt column."""
    from pyspark.sql import types as T

    from etl_data_transformer_spark.sources.readers import read_jsonl

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world"}\n'
        '{"doc_id": 2, "text": "ok"}\n'
        '{"doc_id": broken not json\n'
    )
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    df = read_jsonl(spark, str(p), schema=schema, corrupt_col="_corrupt").cache()
    good = df.filter(df["_corrupt"].isNull())
    bad = df.filter(df["_corrupt"].isNotNull())
    assert sorted(r["doc_id"] for r in good.collect()) == [1, 2]
    assert bad.count() == 1
    assert "broken" in bad.collect()[0]["_corrupt"]
    df.unpersist()


def test_read_jsonl_dropmalformed_and_schemaless(spark, tmp_path):
    from etl_data_transformer_spark.sources.readers import read_jsonl
    from pyspark.sql import types as T

    p = tmp_path / "docs2.jsonl"
    p.write_text('{"a": 1}\n{"a": 2}\nnot json at all\n')
    schema = T.StructType([T.StructField("a", T.LongType())])
    assert read_jsonl(spark, str(p), schema=schema, mode="DROPMALFORMED").count() == 2
    inferred = read_jsonl(spark, str(p))  # inference path
    assert "a" in inferred.columns
