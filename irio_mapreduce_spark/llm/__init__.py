"""Training-data pipeline operators over ``documents`` / ``embeddings``.

The reference's MapReduce algebra (SURVEY.md §2.1) is the classic substrate
for corpus preparation; this package provides the operators a 100 TB
LLM-data pipeline actually runs, Spark-first:

* ``dedup``      — exact (sha2 + keep-first), MinHash-LSH (banded, never
                   all-pairs), SimHash (byte-banded hamming), exact n-gram
                   Jaccard on candidate pairs.
* ``similarity`` — embedding cosine top-k: brute-force baseline + random-
                   hyperplane LSH bucketing as the scale path.
* ``text``       — token stats, quality scoring, stopword-profile language
                   ID, positional fingerprints.
* ``multimodal`` — opaque binary payload columns with typed metadata and a
                   (stubbed) decode/feature-extract stage over mapInPandas.

Everything stays JVM-side (higher-order array functions, no Python UDFs)
except the multimodal decode stage, which is inherently external-library
work and is Arrow-batched.
"""

from irio_mapreduce_spark.llm import dedup, multimodal, similarity, text  # noqa: F401
