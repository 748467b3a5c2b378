"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Stance (per the build brief): image/audio/video payloads are opaque
``binary`` columns with a typed metadata struct; decode / feature-extract /
resize / frame-sample run as Arrow-batched pandas stages over
``mapInPandas``. The decode libraries (PIL/librosa/av) are NOT in this
container, so the actual byte->pixels step is stubbed: a clearly-marked
deterministic fake keyed on the payload hash (default), or
``NotImplementedError`` when ``strict=True``. Everything Spark-side —
schema, partition sizing, UDF signature, Arrow batch shape — is real and
tested (tests/test_llm.py).

At 100 TB: payloads dominate bytes, so the media table should be written
with a small ``spark.sql.files.maxPartitionBytes`` relative to row size,
and metadata-only queries must prune the payload column — reading
(id, meta) never touches payload bytes in parquet (columnar pruning).
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def ensure_package_shipped(spark: SparkSession) -> None:
    """Make this package importable on executor Python workers.

    A driver that patches ``sys.path`` at runtime (the grading harness, a
    notebook) leaves worker processes without the path, so any closure
    that references a module global by name dies with ModuleNotFoundError
    at unpickle. Shipping the package via ``addPyFile`` is the Spark
    mechanism for exactly this — the analog of the reference's binary
    distribution + per-worker cache (``TaskProcessor.java:21,36-38``).
    Idempotent per session."""
    if spark.conf.get("spark.irio_mapreduce.shipped", None) == "true":
        return
    import irio_mapreduce_spark

    pkg_dir = os.path.dirname(os.path.abspath(irio_mapreduce_spark.__file__))
    zip_path = shutil.make_archive(
        os.path.join(tempfile.mkdtemp(prefix="imrs_py_"), "irio_mapreduce_spark"),
        "zip",
        root_dir=os.path.dirname(pkg_dir),
        base_dir="irio_mapreduce_spark",
    )
    spark.sparkContext.addPyFile(zip_path)
    spark.conf.set("spark.irio_mapreduce.shipped", "true")

# Typed metadata carried next to every payload.
MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("kind", T.StringType()),        # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),      # images/video
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),  # audio
        T.StructField("duration_ms", T.LongType()),   # audio/video
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META_TYPE),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def _fake_decode(payload: bytes, n_features: int) -> list[float]:
    """Deterministic stand-in for a real image/audio feature extractor:
    features derived from a rolling byte hash. NOT a real decoder — exists
    so the distributed plumbing is testable in this container."""
    acc, out = 2166136261, []
    for i, b in enumerate(payload):
        acc = (acc ^ b) * 16777619 % (1 << 32)
        if i % max(1, len(payload) // n_features) == 0 and len(out) < n_features:
            out.append((acc % 1000) / 1000.0)
    while len(out) < n_features:
        out.append(0.0)
    return out


def decode_image_features(
    media: DataFrame,
    n_features: int = 8,
    batch_rows: int = 256,
    strict: bool = False,
) -> DataFrame:
    """Decode + feature-extract stage over ``mapInPandas``.

    ``strict=True`` raises ``NotImplementedError`` where a real decoder
    (PIL et al., absent here) would run; the default uses the deterministic
    fake so tests exercise the full Arrow round-trip. ``batch_rows`` bounds
    the Arrow batch so a partition of large payloads never materializes at
    once (maxRecordsPerBatch is the session-level knob; this documents the
    intent at the operator level).
    """
    ensure_package_shipped(media.sparkSession)

    def run(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "real image decode requires PIL/libvips — not available; "
                    "use strict=False for the deterministic fake"
                )
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pdf["meta"].map(lambda m: m["width"] if m else None),
                    "height": pdf["meta"].map(lambda m: m["height"] if m else None),
                    "channels": 3,
                    "features": pdf["payload"].map(
                        lambda p: _fake_decode(bytes(p or b""), n_features)
                    ),
                }
            )
            yield out

    return media.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def resize_images(
    media: DataFrame, width: int, height: int, strict: bool = False
) -> DataFrame:
    """Resize stage: payload -> payload with updated meta dims. Stubbed
    decode (libraries absent): the fake keeps the payload and rewrites the
    metadata — the schema/partitioning contract is the real part."""
    ensure_package_shipped(media.sparkSession)

    def run(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        for pdf in batches:
            if strict:
                raise NotImplementedError("real resize requires PIL/libvips")
            meta = pdf["meta"].map(
                lambda m: {**(m or {}), "width": width, "height": height}
            )
            yield pdf.assign(meta=meta)

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def sample_frames(
    media: DataFrame, every_ms: int, max_frames: int = 16, strict: bool = False
) -> DataFrame:
    """Video frame-sampling stage: one row in -> up to ``max_frames`` rows
    out (media_id, frame_idx, ts_ms, payload). The fake slices the payload
    bytes deterministically; a real implementation decodes with av/ffmpeg.
    The 1->N Arrow shape (a flatMap in MapReduce terms, reference R2) is
    what the stub proves."""
    ensure_package_shipped(media.sparkSession)

    def run(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            if strict:
                raise NotImplementedError("real frame sampling requires av/ffmpeg")
            out = []
            for _, row in pdf.iterrows():
                payload = bytes(row["payload"] or b"")
                dur = (row["meta"] or {}).get("duration_ms") or (
                    len(payload)  # fake: 1 ms per byte
                )
                n = max(1, min(max_frames, int(dur // every_ms) or 1))
                step = max(1, len(payload) // n)
                for i in range(n):
                    out.append(
                        {
                            "media_id": row["media_id"],
                            "frame_idx": i,
                            "ts_ms": i * every_ms,
                            "payload": payload[i * step : (i + 1) * step],
                        }
                    )
            yield pd.DataFrame(
                out, columns=["media_id", "frame_idx", "ts_ms", "payload"]
            )

    return media.mapInPandas(
        run,
        schema="media_id long, frame_idx int, ts_ms long, payload binary",
    )


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: materialize the ``documents`` table as a media table
    (payload = UTF-8 bytes) so the binary plumbing is exercisable against
    driver-provided data."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("text").alias("kind"),
            F.lit("text/plain").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )
