"""Multimodal-column catalog queries: opaque binary payloads with typed
metadata (SURVEY.md §2.2 LLM table; llm/multimodal.py). The payload here is
the UTF-8 encoding of ``documents.text`` — real binary bytes through the
real plumbing; the image/audio decode stage itself is stubbed (libraries
absent) and exercised in tests/test_llm.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from irio_mapreduce_spark.io import read_table
from irio_mapreduce_spark.llm.multimodal import decode_image_features, documents_as_media
from irio_mapreduce_spark.queries.catalog import register


@register(
    "multimodal_payload_stats",
    oracle="""
    SELECT meta_kind, count(*) AS n_media,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           min(octet_length(encode(text))) AS min_bytes,
           max(octet_length(encode(text))) AS max_bytes
    FROM (SELECT 'text' AS meta_kind, text FROM documents)
    GROUP BY meta_kind
    """,
)
def multimodal_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte statistics over a binary payload column, grouped by media kind.
    Metadata-only aggregations like this must never read payload bytes at
    scale — here length() over the binary column is unavoidable by the
    query's meaning, but the grouping/metadata side touches only the typed
    ``meta`` struct (parquet column pruning does the rest)."""
    media = documents_as_media(read_table(spark, sf_dir, "documents"))
    return media.groupBy(F.col("meta.kind").alias("meta_kind")).agg(
        F.count("*").alias("n_media"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.min(F.length("payload")).alias("min_bytes"),
        F.max(F.length("payload")).alias("max_bytes"),
    )


@register(
    "multimodal_decode_features",
    oracle="""
    SELECT doc_id AS media_id,
           octet_length(encode(text)) AS payload_bytes,
           8 AS n_features,
           TRUE AS feats_in_unit_range,
           3 AS channels
    FROM documents
    """,
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Arrow-batched decode/feature-extract stage over mapInPandas
    (deterministic fake decoder — real image libs absent by design, so the
    feature VALUES are engine-specific), emitted as an oracle-checkable
    per-media validation row (the r3 advice shape): payload byte length
    survives the binary->pandas->typed-struct round trip (a real per-row
    hash-checked value), the feature vector has exactly the requested
    arity, every feature lands in the fake decoder's declared [0, 1)
    range, and the channel metadata is populated. A dropped/duplicated/
    mangled row anywhere in the Arrow plumbing breaks the row-level hash
    match. The raw feature values themselves are covered by
    tests/test_llm.py round-trip tests."""
    media = documents_as_media(read_table(spark, sf_dir, "documents"))
    sized = media.withColumn("_pbytes", F.length("payload"))
    feats = decode_image_features(
        sized.select("media_id", "payload", "meta"), n_features=8
    )
    return (
        feats.join(sized.select("media_id", "_pbytes"), "media_id")
        .select(
            "media_id",
            F.col("_pbytes").alias("payload_bytes"),
            F.size("features").alias("n_features"),
            F.aggregate(
                "features",
                F.lit(True),
                lambda acc, x: acc & (x >= 0.0) & (x < 1.0),
            ).alias("feats_in_unit_range"),
            "channels",
        )
    )
