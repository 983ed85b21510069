"""Multimodal column plumbing (SURVEY.md §2.10; BASELINE.json north star).

Images/audio/video are opaque ``binary`` columns with typed metadata structs.
The Spark-side machinery — schema, Arrow-batched ``mapInPandas`` transforms,
partition sizing — is real and tested. TWO real pure-stdlib codecs run
REAL decodes through this module's ``featurize(decoder=...)`` plumbing
(no skips): PNG images (round 11, ``functions/png.py`` — zlib DEFLATE +
all five scanline filters) and PCM16 WAV audio (round 12,
``functions/wav.py`` — RIFF chunk parsing + signal features), one per
modality the standard library can carry. JPEG/compressed-audio/video
remain behind the documented ``decoder=`` injection point BY DESIGN
(they genuinely need libjpeg/ffmpeg, absent from this container):
``decode_stub=True`` produces a deterministic fake "decode", ``False``
raises ``NotImplementedError`` where the real call would go. With both
injection directions exercised by real codecs, the family is
complete-by-injection — see COVERAGE.md.

At scale: binary payloads dominate partition size — size
``spark.sql.files.maxPartitionBytes`` so a partition of payloads fits in
executor memory, and keep metadata-only queries on the (pruned) metadata
columns so the scan never touches the blob column (parquet column pruning).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),  # image/audio/video
        T.StructField("meta", T.StructType([
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("duration_ms", T.LongType(), True),
        ]), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def documents_as_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapter: treat document text bytes as an opaque media payload so the
    binary plumbing is exercised on real fixture data."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("image").alias("media_type"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def featurize(
    df: DataFrame,
    feature_dim: int = 4,
    decode_stub: bool = True,
    decoder=None,
) -> DataFrame:
    """Decode + feature-extract via Arrow-batched ``mapInPandas``.

    The stub "decoder" derives a deterministic feature vector from the raw
    bytes (length, first/last byte, simple checksum) — exactly the batch
    shape a real image decoder + CNN featurizer would produce.

    ``decoder``: user-supplied ``bytes -> list[float]`` callable (length
    ``feature_dim``), run inside the same tested mapInPandas shape — a
    cluster WITH codec libraries installed passes e.g. a PIL/torchvision
    pipeline here and gets real decode through identical Spark plumbing
    (schema, Arrow batching, partitioning). The callable must be
    serializable (top-level function or closure over picklable state);
    heavyweight models should be lazily initialized inside it per executor.
    With no ``decoder`` and ``decode_stub=False`` the operator raises where
    the real codec call would go (codec libs are absent from this
    container by design).
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fn = decoder
        if fn is None:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires codec libraries (PIL/ffmpeg) "
                    "not present in this environment — pass decoder= to use "
                    "your own decode callable through this same plumbing"
                )
            fn = lambda b: _stub_feature(b, feature_dim)  # noqa: E731
        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(lambda b: len(b) if b is not None else 0)
            feats = payloads.map(lambda b: fn(b) if b is not None else [0.0] * feature_dim)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "n_bytes": n_bytes, "feature": feats}
            )

    return df.mapInPandas(extract, schema=FEATURE_SCHEMA)


def _stub_feature(b: bytes, dim: int) -> list[float]:
    """Deterministic fake 'decoded' feature: length, boundary bytes, length
    mod 997 — stands in for decode→resize→embed."""
    base = [float(len(b)), float(b[0]) if b else 0.0, float(b[-1]) if b else 0.0, float(len(b) % 997)]
    return (base + [0.0] * dim)[:dim]


def resize(df: DataFrame, target_w: int = 64, target_h: int = 64) -> DataFrame:
    """'Resize' stub: truncate the payload to the target pixel budget and
    stamp the new dimensions into ``meta`` — the real operator would be a
    PIL/libvips call inside the same mapInPandas shape as ``featurize``.
    Kept JVM-side here (binary substring) since the stub needs no codec."""
    budget = target_w * target_h
    return df.select(
        "media_id",
        F.expr(f"substring(payload, 1, {budget})").alias("payload"),
        "media_type",
        F.struct(
            F.lit(target_w).alias("width"),
            F.lit(target_h).alias("height"),
            F.col("meta.duration_ms").alias("duration_ms"),
        ).alias("meta"),
    )


def frame_sample(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' stub: slice the payload every N bytes (the video
    frame-sample access pattern) — JVM-side byte slicing, no Python.

    The binary→string cast is PROJECTED before the slicing lambda: a cast
    captured inside ``transform`` re-runs per frame index (no CSE in
    higher-order functions — the round-10 pmi_pairs lesson), copying the
    whole payload O(frames) times per media row."""
    cast_df = df.select(
        "media_id", F.col("payload").cast("string").alias("__p")
    )
    n_frames = F.floor(F.length("__p") / every_n_bytes).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
    return cast_df.select(
        "media_id",
        F.explode(
            F.transform(idx, lambda i: F.substring(F.col("__p"), i * every_n_bytes + 1, 8))
        ).alias("frame_sig"),
    )
