"""Multimodal binary-column plumbing (stubbed decode, real Spark machinery)."""

import pytest
from pyspark.sql import functions as F

from etl_data_transformer_spark.operators import multimodal as MM


def test_documents_as_media_schema(spark, star):
    media = MM.documents_as_media(star["documents"])
    kinds = dict(media.dtypes)
    assert kinds["payload"] == "binary"
    assert kinds["media_type"] == "string"
    assert kinds["meta"].startswith("struct")


def test_featurize_stub_values(spark):
    df = spark.createDataFrame([(1, "abc")], ["doc_id", "text"])
    media = MM.documents_as_media(df)
    row = MM.featurize(media).collect()[0]
    assert row["n_bytes"] == 3
    assert row["feature"] == [3.0, 97.0, 99.0, 3.0]  # len, 'a', 'c', len%997


def test_featurize_unstubbed_raises(spark):
    df = spark.createDataFrame([(1, "abc")], ["doc_id", "text"])
    media = MM.documents_as_media(df)
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        MM.featurize(media, decode_stub=False).collect()


def test_frame_sample(spark):
    df = spark.createDataFrame([(1, "x" * 200)], ["doc_id", "text"])
    media = MM.documents_as_media(df)
    frames = MM.frame_sample(media, every_n_bytes=64).collect()
    assert len(frames) == 3  # floor(200/64) frames
    assert all(f["frame_sig"] for f in frames)


def test_resize_stub(spark, star):
    media = MM.documents_as_media(star["documents"].limit(10))
    out = MM.resize(media, target_w=8, target_h=8).collect()
    assert all(len(r["payload"]) <= 64 for r in out)
    assert all(r["meta"]["width"] == 8 and r["meta"]["height"] == 8 for r in out)


def test_featurize_user_decoder_runs_through_same_plumbing(spark):
    """A user-supplied decode callable (the real-codec path on clusters that
    have the libs) exercises the identical mapInPandas shape: same schema,
    same Arrow batching, same null handling."""

    def _toy_decoder(b: bytes) -> list:
        # stands in for a real PIL/ffmpeg pipeline: bytes -> fixed-dim floats
        return [float(len(b)), float(sum(b[:4]) % 255), 1.0, -1.0]

    rows = [(1, b"abcdef"), (2, b"xy"), (3, None)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in MM.featurize(df, decoder=_toy_decoder).collect()}
    assert out[1]["feature"] == [6.0, float(sum(b"abcd") % 255), 1.0, -1.0]
    assert out[2]["n_bytes"] == 2 and out[2]["feature"][0] == 2.0
    assert out[3]["feature"] == [0.0, 0.0, 0.0, 0.0]  # null payload -> zeros
    # decoder wins over decode_stub=False: no NotImplementedError
    assert MM.featurize(df, decode_stub=False, decoder=_toy_decoder).count() == 3
