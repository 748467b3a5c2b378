"""Deterministic-sampling catalog queries over ``documents`` (the
training-data curation family: reproducible sampling, split hygiene,
per-source quotas). All three are exactly oracle-checked — the point of
hash-based sampling is that an independent engine computes the SAME
sampled set, which ``rand(seed)``-based sampling can never promise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from irio_mapreduce_spark.io import read_table
from irio_mapreduce_spark.llm.sampling import (
    deterministic_sample,
    per_key_quota,
    token_budget_batches,
    train_val_split,
)
from irio_mapreduce_spark.queries.catalog import register

# DuckDB twin of llm.sampling.hash_bucket(["doc_id"], n, salt)
_DUCK_BUCKET = (
    "(('0x' || substr(md5(doc_id::VARCHAR || '|{salt}'), 1, 8))::BIGINT % {n})"
)


@register(
    "sample_hash_mod",
    oracle=f"""
    SELECT doc_id, lang, source FROM documents
    WHERE {_DUCK_BUCKET.format(salt="r3", n=100)} < 10
    """,
)
def sample_hash_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% deterministic sample of documents by md5 bucket of doc_id —
    the exact sampled SET is the oracle contract (same rows on any
    engine/partitioning/retry), which is the property rand()-sampling
    lacks. Pure narrow map: no shuffle, filter sits on the scan."""
    docs = read_table(spark, sf_dir, "documents")
    return deterministic_sample(
        docs.select("doc_id", "lang", "source"), ["doc_id"], rate_pct=10, salt="r3"
    )


@register(
    "sample_train_val_split",
    oracle=f"""
    SELECT CASE WHEN {_DUCK_BUCKET.format(salt="split", n=100)} < 90
                THEN 'train' ELSE 'val' END AS split,
           count(*) AS n,
           count(DISTINCT source) AS n_sources
    FROM documents
    GROUP BY 1
    """,
)
def sample_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90/10 train/validation split by doc_id hash: leakage-safe under
    corpus growth (a row's split never depends on the rest of the batch).
    Output is the per-split profile (count + distinct sources)."""
    docs = read_table(spark, sf_dir, "documents")
    tagged = train_val_split(docs, ["doc_id"], val_pct=10, salt="split")
    return tagged.groupBy("split").agg(
        F.count("*").alias("n"),
        F.countDistinct("source").alias("n_sources"),
    )


@register(
    "sample_per_source_quota",
    oracle="""
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY ('0x' || substr(md5(doc_id::VARCHAR || '|q'), 1, 8))::BIGINT
                        % 2147483648,
                        doc_id) AS rn
      FROM documents)
    WHERE rn <= 15
    """,
)
def sample_per_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap documents per source at 15, selected by hash order (unbiased,
    reproducible) — the per-domain quota step of corpus curation. One
    window shuffle on source."""
    docs = read_table(spark, sf_dir, "documents")
    return per_key_quota(
        docs.select("doc_id", "source"), "source", quota=15, id_col="doc_id", salt="q"
    )


@register(
    "sample_token_budget_batches",
    oracle="""
    SELECT doc_id, lang, n_tokens,
           CAST(floor(coalesce(sum(n_tokens) OVER (
             PARTITION BY lang ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2000)
           AS BIGINT) AS batch_id
    FROM (SELECT doc_id, lang,
                 len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                 t -> t <> '')) AS n_tokens
          FROM documents)
    """,
)
def sample_token_budget_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into ~2000-token training batches per language
    (contiguous greedy: exclusive running token total div budget — the
    deterministic, retry-stable packing contract; see
    ``llm.sampling.token_budget_batches``). Exact integer math on both
    engines; one window shuffle on lang."""
    from irio_mapreduce_spark.llm.dedup import tokens

    docs = read_table(spark, sf_dir, "documents")
    return token_budget_batches(
        docs.select("doc_id", "lang", "text"),
        ["lang"],
        "doc_id",
        F.size(tokens(F.col("text"))),
        budget=2000,
    ).select("doc_id", "lang", "n_tokens", "batch_id")


@register(
    "sample_mixture_weights",
    oracle="""
    WITH w AS (
      SELECT doc_id, source,
             CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 2.5
                  WHEN source IN ('src5','src6','src7','src8','src9') THEN 1.0
                  WHEN source IN ('src10','src11','src12','src13','src14') THEN 0.5
                  ELSE 0.25 END AS wt
      FROM documents),
    n AS (
      SELECT doc_id, source,
             CAST(floor(wt) AS INT)
               + CASE WHEN (('0x' || substr(md5(doc_id::VARCHAR || '|mix'), 1, 8))::BIGINT
                            % 2147483648) / 2147483648.0 < wt - floor(wt)
                      THEN 1 ELSE 0 END AS n_copies
      FROM w)
    SELECT doc_id, source, i AS copy_id
    FROM n, UNNEST(generate_series(0, n_copies - 1)) AS s(i)
    WHERE n_copies > 0
    """,
)
def sample_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture resampling: per-source weights (2.5x oversample down
    to 0.25x downsample) realized as deterministic row replication —
    floor(w) copies plus a hash-decided fractional copy (expected
    multiplicity exactly w; see ``llm.sampling.mixture_resample``). The
    oracle reproduces the exact replicated multiset including copy ids —
    the mixture a re-run or another engine materializes is bit-identical,
    which rand()-based resampling cannot promise."""
    from irio_mapreduce_spark.llm.sampling import mixture_resample

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "source")
    wt = (
        F.when(F.col("source").isin([f"src{i}" for i in range(5)]), 2.5)
        .when(F.col("source").isin([f"src{i}" for i in range(5, 10)]), 1.0)
        .when(F.col("source").isin([f"src{i}" for i in range(10, 15)]), 0.5)
        .otherwise(0.25)
    )
    return mixture_resample(docs, wt, ["doc_id"], salt="mix")


@register(
    "sample_weighted_priority",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS weight,
           round(priority * 1e9, 6) AS priority_scaled
    FROM (
      SELECT o_orderkey, o_totalprice,
             CAST((('0x' || substr(md5(o_orderkey::VARCHAR || '|wps'), 1, 8))::BIGINT
                   % 2147483648 + 1) AS DOUBLE) / 2147483648.0 / o_totalprice
               AS priority
      FROM orders)
    ORDER BY priority, o_orderkey LIMIT 50
    """,
)
def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted priority sampling of orders (weight = order value,
    k = 50): the fixed-size without-replacement draw a data-mixture
    pipeline uses when it wants value-weighted exemplars rather than
    rate-based sampling (`sample_hash_mod`) or expected-multiplicity
    resampling (`sample_mixture_weights`). Deterministic u/w priorities
    (see ``llm.sampling.weighted_priority_sample`` for the exact-
    arithmetic rationale); the oracle recomputes the identical 50-row
    set in DuckDB. Output scales the priority by 1e9 before rounding —
    raw priorities are ~1e-8 and 6-decimal rounding would zero them."""
    from irio_mapreduce_spark.llm.sampling import weighted_priority_sample

    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    picked = weighted_priority_sample(
        o, ["o_orderkey"], "o_totalprice", k=50, salt="wps", id_col="o_orderkey"
    )
    return picked.select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("weight"),
        F.round(F.col("priority") * 1e9, 6).alias("priority_scaled"),
    )


@register(
    "sample_stratified_lrm",
    oracle="""
    WITH cnt AS (
      SELECT lang, count(*) AS n_s,
             sum(count(*)) OVER () AS n_tot
      FROM documents GROUP BY lang),
    q AS (
      SELECT lang, n_s,
             (100 * n_s) // n_tot AS base,
             (100 * n_s) % n_tot AS rem,
             100 - sum((100 * n_s) // n_tot) OVER () AS leftover
      FROM cnt),
    quota AS (
      SELECT lang,
             base + CASE WHEN row_number() OVER (ORDER BY rem DESC, lang)
                         <= leftover THEN 1 ELSE 0 END AS k_s
      FROM q),
    ranked AS (
      SELECT d.doc_id, d.lang, qq.k_s,
             row_number() OVER (
               PARTITION BY d.lang
               ORDER BY ('0x' || substr(md5(d.doc_id::VARCHAR || '|lrm'),
                         1, 8))::BIGINT,
                        d.doc_id) AS rn
      FROM documents d JOIN quota qq USING (lang))
    SELECT doc_id, lang FROM ranked WHERE rn <= k_s
    """,
)
def sample_stratified_lrm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROPORTIONAL STRATIFIED SAMPLING with EXACT APPORTIONMENT — a
    global budget of 100 documents split across language strata by the
    largest-remainder method (floor(K*n_s/N) each, the K - sum(floors)
    leftovers going to the largest remainders, ties by stratum name):
    the allocation is all-integer, sums to EXACTLY K, and never
    under/over-shoots the way independent per-stratum fractions do —
    the apportionment every fixed-token-budget mixture step needs.
    Selection within a stratum is the standing md5-priority order
    (reproducible, partitioning-invariant). Shape at 100 TB: the
    apportionment runs on the |strata|-row count frame (driver-free,
    one tiny window), selection is one window shuffle on the stratum
    key — identical cost to the plain quota entry, but the quotas are
    now data-derived instead of fixed."""
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "lang")
    cnt = docs.groupBy("lang").agg(F.count("*").alias("n_s"))
    wall = Window.partitionBy()
    q = cnt.select(
        "lang",
        "n_s",
        F.expr("(100 * n_s) div sum(n_s) OVER ()").alias("base"),
        F.expr("(100 * n_s) % sum(n_s) OVER ()").alias("rem"),
    ).withColumn("leftover", F.lit(100) - F.sum("base").over(wall))
    w_rem = Window.orderBy(F.col("rem").desc(), F.col("lang").asc())
    quota = q.select(
        "lang",
        (
            F.col("base")
            + F.when(
                F.row_number().over(w_rem) <= F.col("leftover"), F.lit(1)
            ).otherwise(F.lit(0))
        ).alias("k_s"),
    )
    prio = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|lrm"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    w_sel = Window.partitionBy("lang").orderBy(prio.asc(), F.col("doc_id").asc())
    return (
        docs.join(F.broadcast(quota), "lang")
        .withColumn("_rn", F.row_number().over(w_sel))
        .filter(F.col("_rn") <= F.col("k_s"))
        .select("doc_id", "lang")
    )


@register(
    "sample_negative_pairs",
    oracle="""
    WITH pos AS (
      SELECT DISTINCT o_custkey AS c, l_suppkey AS s
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      WHERE o_orderkey % 101 = 0),
    nsupp AS (SELECT CAST(count(*) AS BIGINT) AS ns FROM supplier),
    raw AS (
      SELECT p.c,
             ('0x' || substr(md5(p.c::VARCHAR || '|' || p.s::VARCHAR
                                 || '|neg' || t.range::VARCHAR), 1, 8))
               ::BIGINT % n.ns + 1 AS neg_s
      FROM pos p CROSS JOIN range(0, 2) t CROSS JOIN nsupp n),
    kept AS (
      SELECT r.c, r.neg_s FROM raw r
      LEFT JOIN pos p ON r.c = p.c AND r.neg_s = p.s
      WHERE p.c IS NULL)
    SELECT pos.c AS custkey,
           CAST(count(DISTINCT pos.s) AS BIGINT) AS n_pos,
           CAST(coalesce(max(k.n_neg), 0) AS BIGINT) AS n_neg,
           CAST(coalesce(max(k.neg_sum), 0) AS BIGINT) AS neg_key_sum
    FROM pos
    LEFT JOIN (SELECT c, CAST(count(*) AS BIGINT) AS n_neg,
                      CAST(sum(neg_s) AS BIGINT) AS neg_sum
               FROM kept GROUP BY c) k ON pos.c = k.c
    GROUP BY 1
    """,
)
def sample_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC NEGATIVE SAMPLING — the contrastive-training
    primitive (word2vec/SGNS, two-tower retrieval, embedding dedup
    training): every observed (customer, supplier) positive pair draws
    k=2 uniform "negative" suppliers, ACCIDENTAL HITS REMOVED — a drawn
    negative that happens to be one of the customer's true positives is
    dropped by an anti-join, the standard false-negative filter.
    Derandomized via md5 of (pair, draw-index) — the `hash_bucket`
    universe trick — so both engines (and any retry, any partitioning)
    draw the identical negatives: reproducible epochs at 100 TB without
    storing a single sampled row. Dataflow: one distinct-pair reduce,
    ×2 literal fan-out, one broadcast scalar (supplier count), one
    anti-join back to the positives on the SAME key — co-partitioned,
    no second shuffle. Output pins the draw exactly: per customer, the
    kept-negative count and key sum."""
    pos = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 101 == 0)
        .join(
            read_table(spark, sf_dir, "lineitem").select(
                "l_orderkey", "l_suppkey"
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(
            F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s")
        )
        .distinct()
    )
    nsupp = read_table(spark, sf_dir, "supplier").agg(
        F.count("*").cast("long").alias("ns")
    )
    draws = spark.range(2).select(F.col("id").alias("i"))
    raw = (
        pos.crossJoin(F.broadcast(draws))
        .crossJoin(F.broadcast(nsupp))
        .select(
            "c",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                "|",
                                F.col("c").cast("string"),
                                F.col("s").cast("string"),
                                F.concat(
                                    F.lit("neg"), F.col("i").cast("string")
                                ),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % F.col("ns")
                + 1
            ).alias("neg_s"),
        )
    )
    kept = raw.join(
        pos.select(F.col("c").alias("pc"), F.col("s").alias("ps")),
        (raw["c"] == F.col("pc")) & (raw["neg_s"] == F.col("ps")),
        "left_anti",
    )
    neg_agg = kept.groupBy("c").agg(
        F.count("*").cast("long").alias("n_neg"),
        F.sum("neg_s").cast("long").alias("neg_sum"),
    )
    pos_agg = pos.groupBy("c").agg(
        F.countDistinct("s").cast("long").alias("n_pos")
    )
    return (
        pos_agg.join(neg_agg, pos_agg["c"] == neg_agg["c"], "left")
        .select(
            pos_agg["c"].alias("custkey"),
            "n_pos",
            F.coalesce(F.col("n_neg"), F.lit(0)).cast("long").alias("n_neg"),
            F.coalesce(F.col("neg_sum"), F.lit(0))
            .cast("long")
            .alias("neg_key_sum"),
        )
    )


@register(
    "sample_neyman_allocation",
    oracle="""
    WITH s AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(len) AS BIGINT) AS sx,
             CAST(sum(len * len) AS BIGINT) AS sxx
      FROM (SELECT lang, CAST(length(text) AS BIGINT) AS len
            FROM documents)
      GROUP BY lang),
    w AS (
      SELECT lang, n,
             CAST(floor(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)))
                  AS BIGINT) AS w
      FROM s),
    t AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM w),
    q AS (
      SELECT lang, n, w,
             CAST(CASE WHEN t.tw = 0 THEN 0
                       ELSE (1000 * w) // t.tw END AS BIGINT) AS base,
             CAST(CASE WHEN t.tw = 0 THEN 0
                       ELSE (1000 * w) % t.tw END AS BIGINT) AS rem
      FROM w CROSS JOIN t),
    lv AS (SELECT CAST(1000 - sum(base) AS BIGINT) AS leftover FROM q),
    r AS (
      SELECT lang, n, w, base, rem,
             row_number() OVER (ORDER BY rem DESC, lang) AS rk
      FROM q)
    SELECT lang, n AS n_docs, w AS weight,
           CAST(base + CASE WHEN rk <= lv.leftover THEN 1 ELSE 0 END
                AS BIGINT) AS alloc
    FROM r CROSS JOIN lv
    """,
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEYMAN SAMPLING-BUDGET ALLOCATION — split a fixed 1000-doc label/
    eval budget across language strata proportional to N_h·S_h (stratum
    size × dispersion, here of document length), the optimal-variance
    allocation every curation team approximates by hand. Exactness
    discipline: N_h·S_h = √(N·Σx²−(Σx)²) — the variance NUMERATOR is an
    exact BIGINT (< 2⁵³, so its double image is exact and the
    correctly-rounded sqrt+floor is ENGINE-IDENTICAL), giving integer
    weights; the split is then pure integer largest-remainder
    apportionment (base = B·w div W, +1 to the largest B·w mod W,
    lang-ordered ties), so Σalloc = B exactly and the driver hash is
    exact — no double ratio ever ranks anything. One map-side-combinable
    moment scan; everything downstream runs on the k-strata frame.
    Integer-sqrt caveat: floor(sqrt(double)) can sit one off true
    isqrt at perfect-square boundaries — identically on both engines,
    which is the contract; allocation weights don't need number-theoretic
    isqrt."""
    from pyspark.sql.window import Window

    s = (
        read_table(spark, sf_dir, "documents")
        .select("lang", F.length("text").cast("long").alias("len"))
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("len").cast("long").alias("sx"),
            F.sum(F.col("len") * F.col("len")).cast("long").alias("sxx"),
        )
    )
    w = s.select(
        "lang",
        "n",
        F.floor(
            F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                   .cast("double"))
        )
        .cast("long")
        .alias("w"),
    )
    tw = w.agg(F.sum("w").cast("long").alias("tw"))
    q = w.crossJoin(F.broadcast(tw)).select(
        "lang",
        "n",
        "w",
        F.when(F.col("tw") == 0, F.lit(0))
        .otherwise(F.expr("(1000 * w) div tw"))
        .cast("long")
        .alias("base"),
        F.when(F.col("tw") == 0, F.lit(0))
        .otherwise(F.expr("(1000 * w) % tw"))
        .cast("long")
        .alias("rem"),
    )
    lv = q.agg((F.lit(1000) - F.sum("base")).cast("long").alias("leftover"))
    r = q.withColumn(
        "rk",
        F.row_number().over(Window.orderBy(F.desc("rem"), F.asc("lang"))),
    )
    return r.crossJoin(F.broadcast(lv)).select(
        "lang",
        F.col("n").alias("n_docs"),
        F.col("w").alias("weight"),
        (
            F.col("base")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("long")
        .alias("alloc"),
    )
