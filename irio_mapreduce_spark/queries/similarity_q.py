"""Similarity-search catalog queries over ``embeddings`` (SURVEY.md §2.2
LLM-data-pipeline table). Brute-force cosine paths are oracle-checked
against DuckDB (both sides compute in double — float32 order-of-summation
would otherwise diverge); the ANN paths (IVF, RP-LSH) are approximate by
design, so their entries emit deterministic recall-vs-exact validation
rows (see ``_ann_recall_validation``) that DuckDB reproduces exactly,
with raw recall bounds additionally pytest-asserted in tests/test_llm.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from irio_mapreduce_spark.io import read_table
from irio_mapreduce_spark.llm.similarity import (
    as_double,
    cosine,
    cosine_pairs_bruteforce,
    cosine_topk,
    ivf_topk,
    rp_lsh_multiprobe_topk,
    rp_lsh_topk,
)
from irio_mapreduce_spark.queries.catalog import register

_QUERY_VEC_ID = 0  # the fixed query point: embedding of vec_id 0


@register(
    "sim_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
               WHERE vec_id = {_QUERY_VEC_ID})
    SELECT vec_id,
           round(list_cosine_similarity(embedding::DOUBLE[], qv), 6) AS cosine
    FROM embeddings, q
    WHERE vec_id <> {_QUERY_VEC_ID}
    ORDER BY cosine DESC, vec_id
    LIMIT 10
    """,
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 neighbors of one query vector: brute-force scan,
    similarity fused into the scan stage (zip_with/aggregate, JVM-side),
    TakeOrdered for the top-k — no global sort, no shuffle of the corpus.
    The query vector is a parameter (one-row lookup, collected once)."""
    emb = read_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == _QUERY_VEC_ID).select("embedding").head()[0]
    return cosine_topk(
        emb.filter(F.col("vec_id") != _QUERY_VEC_ID),
        "embedding",
        "vec_id",
        [float(x) for x in qv],
        k=10,
    )


@register(
    "sim_pairs_bruteforce",
    oracle="""
    SELECT a.vec_id AS id1, b.vec_id AS id2,
           round(list_cosine_similarity(a.embedding::DOUBLE[],
                                        b.embedding::DOUBLE[]), 6) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                                 b.embedding::DOUBLE[]) >= 0.4
    """,
)
def sim_pairs_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All embedding pairs with cosine >= 0.4 — the exact O(n²) baseline
    (fine at test scale; the documented scale path for pairwise search is
    the LSH-bucketed variant, sim_ann_lsh_topk's candidate machinery)."""
    emb = read_table(spark, sf_dir, "embeddings")
    return cosine_pairs_bruteforce(emb, "embedding", "vec_id", threshold=0.4)


@register(
    "sim_centroid_per_label",
    oracle="""
    WITH per_dim AS (
      SELECT label, i, avg(embedding[i]::DOUBLE) AS m, count(*) AS n_rows
      FROM embeddings, range(1, 65) AS t(i)
      GROUP BY label, i)
    SELECT label, any_value(n_rows) AS n,
           round(sqrt(sum(m * m)), 6) AS centroid_norm
    FROM per_dim GROUP BY label
    """,
)
def sim_centroid_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding column — the aggregate shape of
    vector analytics (k-means step, class prototypes). Element-wise mean
    via posexplode + groupBy(label, pos): one shuffle keyed on (label,
    dim), i.e. 10×64 groups, independent of corpus size."""
    emb = read_table(spark, sf_dir, "embeddings")
    per_dim = emb.select(
        "label", F.posexplode(as_double(F.col("embedding"))).alias("pos", "x")
    )
    cent = per_dim.groupBy("label", "pos").agg(
        F.avg("x").alias("m"), F.count("*").alias("n_rows")
    )
    return (
        cent.groupBy("label")
        .agg(
            F.first("n_rows").alias("n"),
            F.round(F.sqrt(F.sum(F.col("m") * F.col("m"))), 6).alias("centroid_norm"),
        )
        .select("label", "n", "centroid_norm")
    )


_ANN_RECALL_ORACLE = """
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 5)
    SELECT q.query_id,
           round(max(list_cosine_similarity(qv, e.embedding::DOUBLE[])), 6)
             AS exact_nn_cosine,
           TRUE AS recall_ok
    FROM q JOIN embeddings e ON e.vec_id <> q.query_id
    GROUP BY q.query_id
"""


def _ann_recall_validation(
    emb: DataFrame, ann: DataFrame, k: int, bound: float
) -> DataFrame:
    """Deterministic oracle-checkable ANN validation (the r3 advice shape):
    the same job computes the EXACT top-k per query (brute force — 5
    queries x corpus, similarity fused into the scan) and emits, per
    query, the exact nearest-neighbor cosine (a real hash-checked value)
    plus a recall@k >= ``bound`` boolean. DuckDB reproduces the exact side
    and the constant-TRUE flag; the measured per-query recall (see entry
    docstrings) clears ``bound`` with margin at every shipped SF, and the
    whole pipeline is seed-fixed deterministic."""
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("_qv")
    )
    corpus = emb.select("vec_id", F.col("embedding").alias("_cv"))
    from pyspark.sql import Window

    sim = F.round(cosine(as_double(F.col("_qv")), as_double(F.col("_cv"))), 6)
    w = Window.partitionBy("query_id").orderBy(F.col("_cos").desc(), F.col("vec_id"))
    exact = (
        queries.crossJoin(corpus)
        .filter(F.col("query_id") != F.col("vec_id"))
        .withColumn("_cos", sim)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("query_id", "vec_id", "_cos")
    )
    hits = (
        exact.join(
            ann.select("query_id", "vec_id", F.lit(1).alias("_hit")),
            ["query_id", "vec_id"],
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.max("_cos").alias("exact_nn_cosine"),
            (F.count("_hit") / F.lit(k) >= bound).alias("recall_ok"),
        )
    )
    return hits.select("query_id", "exact_nn_cosine", "recall_ok")


@register("sim_ann_ivf_topk", oracle=_ANN_RECALL_ORACLE)
def sim_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5 for 5 query vectors: k-means coarse quantizer
    (16 cells), 8-cell probing, exact cosine re-rank of candidates — the
    FAISS-IVF topology on DataFrames. Deterministic (fixed KMeans seed).

    Driver-checkable via :func:`_ann_recall_validation`: recall@5 >= 0.4
    per query (measured min 0.6 across sf0.001/0.01/0.1) plus the exact
    nearest-neighbor cosine as a value column. tests/test_llm.py bounds
    the raw recall separately."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    ann = ivf_topk(
        emb, "embedding", "vec_id", queries, k=5, n_cells=16, n_probe=8, seed=42
    )
    return _ann_recall_validation(emb, ann, k=5, bound=0.4)


@register("sim_ann_ivf_persisted", oracle=_ANN_RECALL_ORACLE)
def sim_ann_ivf_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``sim_ann_ivf_topk`` search against a PERSISTED IVF index
    (``llm.similarity.build_ivf_index``): quantizer training and the
    full-corpus cell-assignment pass ran at build time; this entry's plan
    is one tiny centroid scan plus the cell-id probe join over the
    pre-assigned corpus table — the steady-state ANN serving shape,
    mirroring the persisted-dedup-index entry. Same parameters, same
    deterministic quantizer, same recall validation; the index lands
    under the gitignored ``spark-warehouse/`` keyed by format version,
    scale factor and an input stat-fingerprint, with the ``_COMMITTED``
    manifest gating torn builds."""
    import os

    from irio_mapreduce_spark.llm.artifacts import committed_params, input_stamp
    from irio_mapreduce_spark.llm.similarity import (
        _IVF_SUBTABLES,
        build_ivf_index,
        ivf_topk_persisted,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    stamp = input_stamp(os.path.join(sf_dir, "embeddings.parquet"))
    idx_dir = os.path.join(
        root,
        "spark-warehouse",
        f"ivf_idx_v1_{os.path.basename(os.path.normpath(sf_dir))}_{stamp}",
    )
    if committed_params(idx_dir, _IVF_SUBTABLES) is None:
        build_ivf_index(
            emb, "embedding", "vec_id", idx_dir, n_cells=16, seed=42
        )
    queries = emb.filter(F.col("vec_id") < 5)
    ann = ivf_topk_persisted(
        idx_dir, queries, "embedding", "vec_id", k=5, n_probe=8
    )
    return _ann_recall_validation(emb, ann, k=5, bound=0.4)


@register("sim_ann_lsh_topk", oracle=_ANN_RECALL_ORACLE)
def sim_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 neighbors for 5 query vectors via multi-table
    random-hyperplane LSH (24 tables x 4 planes): ONE equi-join on the
    exploded (table, bucket) key, exact cosine re-rank inside candidate
    sets. Deterministic (fixed plane seed).

    Driver-checkable via :func:`_ann_recall_validation`: recall@5 >= 0.6
    per query (measured min 0.8 across sf0.001/0.01/0.1) plus the exact
    nearest-neighbor cosine as a value column. tests/test_llm.py bounds
    the raw recall separately."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    ann = rp_lsh_topk(
        emb, "embedding", "vec_id", queries, k=5, n_tables=24,
        planes_per_table=4, dim=64, seed=42,
    )
    return _ann_recall_validation(emb, ann, k=5, bound=0.6)


@register("sim_ann_lsh_multiprobe", oracle=_ANN_RECALL_ORACLE)
def sim_ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-PROBE LSH top-5 (Lv et al., VLDB'07): 8 tables x 4 planes
    with the query probing its own bucket plus every Hamming-distance-1
    bucket (5 probes/table, 40 effective probes) — the recall of the
    24-single-probe-table entry (`sim_ann_lsh_topk`) from an index ONE
    THIRD its size, because the corpus is stored once per table and only
    the query side fans out. Same single candidate equi-join; exact
    cosine re-rank; fixed plane seed.

    Driver-checkable via :func:`_ann_recall_validation`: recall@5 >= 0.6
    per query (measured against brute force across sf0.001/0.01/0.1 with
    margin; tests/test_llm.py bounds the raw recall separately and
    asserts the index-size claim — 3x fewer corpus index rows than the
    single-probe entry at matched recall)."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    ann = rp_lsh_multiprobe_topk(
        emb, "embedding", "vec_id", queries, k=5, n_tables=8,
        planes_per_table=4, dim=64, seed=42,
    )
    return _ann_recall_validation(emb, ann, k=5, bound=0.6)


@register(
    "sim_int8_quantization",
    oracle="""
    WITH xd AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
      FROM embeddings),
    sc AS (
      SELECT vec_id, v,
             list_max(list_transform(v, x -> abs(x))) / 127 AS scale
      FROM xd),
    codes AS (
      SELECT vec_id, v, scale,
             list_transform(v, x -> CASE WHEN scale = 0 THEN 0
                                         ELSE CAST(round(x / scale) AS BIGINT)
                                    END) AS code
      FROM sc),
    errs AS (
      SELECT vec_id, scale, code,
             list_max(list_transform(generate_series(1, len(v)),
                                     i -> abs(v[i] - code[i] * scale))) AS max_err
      FROM codes)
    SELECT vec_id, round(scale, 8) AS scale_r,
           CAST(list_sum(code) AS BIGINT) AS code_sum,
           CAST(list_min(code) AS BIGINT) AS code_min,
           CAST(list_max(code) AS BIGINT) AS code_max,
           (scale = 0 OR max_err <= scale * 0.5000001) AS err_ok
    FROM errs
    """,
)
def sim_int8_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector int8 quantization of the embedding column — the 4×
    storage compression (float32 -> 1 byte/dim + one scale) a 100 TB
    embedding corpus applies before ANN indexing. Symmetric max-abs
    scheme: scale = max|x|/127, code = round(x/scale) ∈ [-127, 127],
    reconstruction x̂ = code·scale with |x - x̂| <= scale/2.

    Everything is JVM-side higher-order expressions over the array
    column — no UDF, no explode (the narrow per-row shape survives any
    scale). Each derivation stage (double-cast, scale, codes, error) is
    BOUND in its own select: inlining them would re-evaluate the
    captured array expression per element (the nested-HOF trap,
    catalog.py conventions). Exactness: float32 -> double is exact, the
    two divisions are IEEE-identical cross-engine, round() is
    half-away-from-zero on both, and the error-bound flag carries a
    1e-7 relative slack because round-up across the half boundary can
    exceed scale/2 by one ulp. Output per vector: rounded scale, the
    code checksum (sum/min/max — proves the codes match bit-for-bit
    without emitting an array column), and the bound flag. Zero vectors
    quantize to all-zero codes (try_divide NULL path), not a crash."""
    emb = read_table(spark, sf_dir, "embeddings")
    xd = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    sc = xd.select(
        "vec_id",
        "v",
        (F.array_max(F.transform(F.col("v"), F.abs)) / 127).alias("scale"),
    )
    codes = sc.select(
        "vec_id",
        "v",
        "scale",
        F.transform(
            F.col("v"),
            lambda x: F.coalesce(
                F.round(F.try_divide(x, F.col("scale"))), F.lit(0.0)
            ).cast("long"),
        ).alias("code"),
    )
    errs = codes.select(
        "vec_id",
        "scale",
        "code",
        F.array_max(
            F.zip_with(
                F.col("v"),
                F.col("code"),
                lambda x, c: F.abs(x - c.cast("double") * F.col("scale")),
            )
        ).alias("max_err"),
    )
    return errs.select(
        "vec_id",
        F.round("scale", 8).alias("scale_r"),
        F.aggregate(
            F.col("code"), F.lit(0).cast("long"), lambda acc, c: acc + c
        ).alias("code_sum"),
        F.array_min("code").alias("code_min"),
        F.array_max("code").alias("code_max"),
        ((F.col("scale") == 0) | (F.col("max_err") <= F.col("scale") * 0.5000001)).alias(
            "err_ok"
        ),
    )


@register("sim_ann_pq_topk", oracle=_ANN_RECALL_ORACLE)
def sim_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization approximate top-5 for 5 query vectors:
    16 subspaces x 32 centroids (codebooks fit on a bounded local
    sample), compressed-domain ADC scan over unit-normalized codes,
    exact-cosine re-rank of the top-100 shortlist — the FAISS-PQ
    topology, completing the ANN family (LSH buckets / IVF cells / PQ
    codes). Deterministic (seeded codebooks).

    Driver-checkable via :func:`_ann_recall_validation`: recall@5 >= 0.6
    per query (measured min 0.8 across sf0.001/0.01/0.1) plus the exact
    nearest-neighbor cosine as a value column; tests/test_llm.py bounds
    the raw recall separately."""
    from irio_mapreduce_spark.llm.similarity import pq_topk

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    ann = pq_topk(
        emb, "embedding", "vec_id", queries, k=5, m=16, ksub=32, shortlist=20, seed=42
    )
    return _ann_recall_validation(emb, ann, k=5, bound=0.6)


@register(
    "sim_matryoshka_recall",
    oracle="""
    WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id % 100 = 0),
    pairs AS (
      SELECT qid, e.vec_id,
             round(list_cosine_similarity(e.embedding::DOUBLE[], qv), 6) AS fc,
             round(list_cosine_similarity(e.embedding[1:16]::DOUBLE[], qv[1:16]), 6) AS tc
      FROM embeddings e, q WHERE e.vec_id <> qid),
    fr AS (SELECT qid, vec_id,
                  row_number() OVER (PARTITION BY qid ORDER BY fc DESC, vec_id) AS rk
           FROM pairs),
    tr AS (SELECT qid, vec_id, tc,
                  row_number() OVER (PARTITION BY qid ORDER BY tc DESC, vec_id) AS rk
           FROM pairs),
    hits AS (SELECT f.qid, CAST(count(*) AS BIGINT) AS recall_hits
             FROM fr f JOIN tr t ON f.qid = t.qid AND f.vec_id = t.vec_id
             WHERE f.rk <= 5 AND t.rk <= 5
             GROUP BY f.qid),
    t1 AS (SELECT qid, vec_id AS trunc_top1_id, tc AS trunc_top1_cos
           FROM tr WHERE rk = 1)
    SELECT q.qid, coalesce(h.recall_hits, 0) AS recall_hits,
           t1.trunc_top1_id, t1.trunc_top1_cos
    FROM q LEFT JOIN hits h ON q.qid = h.qid JOIN t1 ON q.qid = t1.qid
    """,
)
def sim_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-truncation quality measurement: for each query point
    (vec_id % 100), compare the exact top-5 under FULL 64-dim cosine with
    the exact top-5 under the first-16-dims truncation (the MRL trade: 4×
    cheaper vectors, how much ranking survives?). Both rankings are exact
    and rank on the 6-digit-rounded cosine with a vec_id tie-break (the
    catalog's rank-boundary convention), so recall_hits is deterministic
    and fully SQL-expressible — unlike the LSH/IVF entries there is no
    approximate stage at all; this is the measurement harness itself.

    Plan shape: the bounded query set broadcasts across the corpus scan
    (nq·n similarity rows, nq fixed), two row_number windows share one
    qid exchange. Per-query output: overlap count + the truncated top-1
    (a real hash-checked value column)."""
    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    pairs = (
        emb.join(F.broadcast(q), emb["vec_id"] != q["qid"])
        .select(
            "qid",
            "vec_id",
            F.round(cosine(F.col("v"), F.col("qv")), 6).alias("fc"),
            F.round(
                cosine(F.slice("v", 1, 16), F.slice("qv", 1, 16)), 6
            ).alias("tc"),
        )
    )
    from pyspark.sql import Window

    w_f = Window.partitionBy("qid").orderBy(F.desc("fc"), F.asc("vec_id"))
    w_t = Window.partitionBy("qid").orderBy(F.desc("tc"), F.asc("vec_id"))
    ranked = pairs.select(
        "qid",
        "vec_id",
        "tc",
        F.row_number().over(w_f).alias("frk"),
        F.row_number().over(w_t).alias("trk"),
    )
    hits = (
        ranked.filter((F.col("frk") <= 5) & (F.col("trk") <= 5))
        .groupBy("qid")
        .agg(F.count("*").cast("long").alias("recall_hits"))
    )
    t1 = ranked.filter(F.col("trk") == 1).select(
        "qid",
        F.col("vec_id").alias("trunc_top1_id"),
        F.col("tc").alias("trunc_top1_cos"),
    )
    return (
        q.select("qid")
        .join(hits, "qid", "left")
        .join(t1, "qid")
        .select(
            "qid",
            F.coalesce(F.col("recall_hits"), F.lit(0)).alias("recall_hits"),
            "trunc_top1_id",
            "trunc_top1_cos",
        )
    )


_MMR_QUERY_IDS = (1, 2, 3, 5)


@register(
    "sim_mmr_rerank",
    oracle="""
    WITH q AS (
      SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id IN (1, 2, 3, 5)),
    base AS (
      SELECT q.qid, e.vec_id AS id, e.embedding::DOUBLE[] AS dv,
             CAST(round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv)
                        * 1000000) AS BIGINT) AS rel_u
      FROM embeddings e, q WHERE e.vec_id NOT IN (1, 2, 3, 5)),
    cand AS (
      SELECT qid, id, dv, rel_u
      FROM base
      QUALIFY row_number() OVER (PARTITION BY qid
                                 ORDER BY rel_u DESC, id) <= 10),
    pairs AS (
      SELECT a.qid, a.id AS ida, b.id AS idb,
             CAST(round(list_cosine_similarity(a.dv, b.dv) * 1000000)
                  AS BIGINT) AS sim_u
      FROM cand a JOIN cand b ON a.qid = b.qid AND a.id <> b.id),
    s1 AS (
      SELECT qid, id, rel_u, rel_u AS score2 FROM cand
      QUALIFY row_number() OVER (PARTITION BY qid
                                 ORDER BY rel_u DESC, id) = 1),
    sel1 AS (SELECT qid, id FROM s1),
    s2 AS (
      SELECT qid, id, rel_u, rel_u - maxsim AS score2 FROM (
        SELECT c.qid, c.id, c.rel_u, max(p.sim_u) AS maxsim
        FROM cand c
          JOIN pairs p ON p.qid = c.qid AND p.ida = c.id
          JOIN sel1 s ON s.qid = p.qid AND s.id = p.idb
        WHERE NOT EXISTS (SELECT 1 FROM sel1 x
                          WHERE x.qid = c.qid AND x.id = c.id)
        GROUP BY 1, 2, 3)
      QUALIFY row_number() OVER (PARTITION BY qid
                                 ORDER BY score2 DESC, id) = 1),
    sel2 AS (SELECT qid, id FROM sel1 UNION ALL SELECT qid, id FROM s2),
    s3 AS (
      SELECT qid, id, rel_u, rel_u - maxsim AS score2 FROM (
        SELECT c.qid, c.id, c.rel_u, max(p.sim_u) AS maxsim
        FROM cand c
          JOIN pairs p ON p.qid = c.qid AND p.ida = c.id
          JOIN sel2 s ON s.qid = p.qid AND s.id = p.idb
        WHERE NOT EXISTS (SELECT 1 FROM sel2 x
                          WHERE x.qid = c.qid AND x.id = c.id)
        GROUP BY 1, 2, 3)
      QUALIFY row_number() OVER (PARTITION BY qid
                                 ORDER BY score2 DESC, id) = 1),
    sel3 AS (SELECT qid, id FROM sel2 UNION ALL SELECT qid, id FROM s3),
    s4 AS (
      SELECT qid, id, rel_u, rel_u - maxsim AS score2 FROM (
        SELECT c.qid, c.id, c.rel_u, max(p.sim_u) AS maxsim
        FROM cand c
          JOIN pairs p ON p.qid = c.qid AND p.ida = c.id
          JOIN sel3 s ON s.qid = p.qid AND s.id = p.idb
        WHERE NOT EXISTS (SELECT 1 FROM sel3 x
                          WHERE x.qid = c.qid AND x.id = c.id)
        GROUP BY 1, 2, 3)
      QUALIFY row_number() OVER (PARTITION BY qid
                                 ORDER BY score2 DESC, id) = 1),
    sel4 AS (SELECT qid, id FROM sel3 UNION ALL SELECT qid, id FROM s4),
    s5 AS (
      SELECT qid, id, rel_u, rel_u - maxsim AS score2 FROM (
        SELECT c.qid, c.id, c.rel_u, max(p.sim_u) AS maxsim
        FROM cand c
          JOIN pairs p ON p.qid = c.qid AND p.ida = c.id
          JOIN sel4 s ON s.qid = p.qid AND s.id = p.idb
        WHERE NOT EXISTS (SELECT 1 FROM sel4 x
                          WHERE x.qid = c.qid AND x.id = c.id)
        GROUP BY 1, 2, 3)
      QUALIFY row_number() OVER (PARTITION BY qid
                                 ORDER BY score2 DESC, id) = 1)
    SELECT qid, CAST(rank AS BIGINT) AS rank, id AS vec_id, rel_u, score2
    FROM (SELECT qid, 1 AS rank, id, rel_u, score2 FROM s1
          UNION ALL SELECT qid, 2, id, rel_u, score2 FROM s2
          UNION ALL SELECT qid, 3, id, rel_u, score2 FROM s3
          UNION ALL SELECT qid, 4, id, rel_u, score2 FROM s4
          UNION ALL SELECT qid, 5, id, rel_u, score2 FROM s5)
    """,
)
def sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAXIMAL MARGINAL RELEVANCE re-ranking — the diversification pass
    every retrieval pipeline runs between ANN recall and the consumer:
    from each query's top-10 cosine candidates, greedily pick 5 where
    pick k maximizes λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s)
    (Carbonell & Goldstein 1998), λ = 1/2. The greedy argmax chain is
    where float engines diverge, so relevance and pairwise similarity
    are snapped ONCE to integer micro-units (round(cos·10⁶) — the
    round-6 device of ``sim_cosine_topk``) and the ENTIRE greedy runs
    in BIGINT: score2 = 2·MMR·10⁶ = rel_u − max sim_u, argmax ties
    broken by vec_id — bit-reproducible selection on both engines. The
    5 greedy steps are UNROLLED as dataframe rounds here and as chained
    CTEs in the oracle (mirrored-but-independent — pinned against a
    from-scratch Python greedy in tests/test_properties.py).

    Scale shape: candidate generation is the pluggable stage — here the
    exact scan (4 bounded queries), at 100 TB the LSH/IVF entries'
    bucketed candidates; everything downstream of it touches ≤ 10 rows
    per query: the 10×10 pairwise-sim join and five argmax rounds are
    broadcast-sized by construction. The corpus is never shuffled; the
    re-rank cost is O(queries · k²), independent of corpus size."""
    from pyspark.sql import Window

    qids = list(_MMR_QUERY_IDS)
    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("qid"), as_double(F.col("embedding")).alias("qv")
    )
    base = (
        emb.filter(~F.col("vec_id").isin(qids))
        .select(
            F.col("vec_id").alias("id"),
            as_double(F.col("embedding")).alias("dv"),
        )
        .join(F.broadcast(q))
        .select(
            "qid",
            "id",
            "dv",
            F.round(cosine(F.col("dv"), F.col("qv")) * 1000000, 0)
            .cast("long")
            .alias("rel_u"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("rel_u").desc(), "id")
    cand = (
        base.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .drop("rk")
        .localCheckpoint(eager=True)
    )
    a, b = cand.alias("a"), cand.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.qid") == F.col("b.qid"))
            & (F.col("a.id") != F.col("b.id")),
        )
        .select(
            F.col("a.qid").alias("qid"),
            F.col("a.id").alias("ida"),
            F.col("b.id").alias("idb"),
            F.round(cosine(F.col("a.dv"), F.col("b.dv")) * 1000000, 0)
            .cast("long")
            .alias("sim_u"),
        )
        # r12: no barrier needed anymore — the cogrouped greedy below is
        # the frame's single consumer, and it already builds on cand's
        # checkpoint (the k×k self-join computes once, in the same job).
    )
    cand_slim = cand.select("qid", "id", "rel_u")
    # r12 (guide §2.6 scheduling, §4 bounded per-group Python): the five
    # greedy rounds were UNROLLED as dataframe rounds — five windows, five
    # joins and a 5-way union whose plan grows per round, costing ~10 s of
    # per-run plan construction + codegen for a computation that touches
    # ≤ 10 rows per query. The greedy now runs as ONE cogrouped
    # applyInPandas over the per-query candidate and pairwise-sim groups:
    # the inputs (rel_u, sim_u) are the SAME JVM-computed integer
    # micro-units as before — the Python side does only exact int64
    # argmax/subtract, the arithmetic the unrolled rounds did in BIGINT —
    # so the selection is bit-identical (pinned by the from-scratch-greedy
    # property test and the entry's exact oracle). Scale shape unchanged:
    # one shuffle by qid, O(k²) work per query group, corpus never
    # shuffled.
    def _greedy(cand_pdf, pairs_pdf):
        import pandas as pd

        if len(cand_pdf) == 0:
            return pd.DataFrame(
                columns=["qid", "rank", "vec_id", "rel_u", "score2"]
            )
        qid = int(cand_pdf["qid"].iloc[0])
        rel = {
            int(r.id): int(r.rel_u) for r in cand_pdf.itertuples(index=False)
        }
        sim = {
            (int(r.ida), int(r.idb)): int(r.sim_u)
            for r in pairs_pdf.itertuples(index=False)
        }
        selected: list[int] = []
        rows = []
        for rank in range(1, 6):
            best = None
            for i, r_u in rel.items():
                if i in selected:
                    continue
                score2 = (
                    r_u
                    if not selected
                    else r_u - max(sim[(i, s)] for s in selected)
                )
                # argmax with smaller-id tie-break == row_number over
                # (score2 DESC, id ASC) picking rk 1
                if best is None or (score2, -i) > (best[1], -best[0]):
                    best = (i, score2)
            if best is None:
                break
            selected.append(best[0])
            rows.append(
                {
                    "qid": qid,
                    "rank": rank,
                    "vec_id": best[0],
                    "rel_u": rel[best[0]],
                    "score2": best[1],
                }
            )
        return pd.DataFrame(
            rows, columns=["qid", "rank", "vec_id", "rel_u", "score2"]
        )

    return (
        cand_slim.groupBy("qid")
        .cogroup(pairs.groupBy("qid"))
        .applyInPandas(
            _greedy,
            schema="qid long, rank long, vec_id long, rel_u long, score2 long",
        )
    )
