"""Pipeline-API queries: the reference's flagship MapReduce computation
(wordcount, ``mr-bins/map/map.cpp`` + ``mr-bins/reduce/reduce.cpp``) run
through :mod:`irio_mapreduce_spark.pipeline` on the ``documents`` table,
oracle-checked against DuckDB."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from irio_mapreduce_spark.io import read_table, table_path
from irio_mapreduce_spark.pipeline import BatchSpec, submit_batch
from irio_mapreduce_spark.queries.catalog import register


@register(
    "mr_wordcount",
    oracle="""
    SELECT word, count(*) AS cnt
    FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS word
          FROM documents)
    WHERE word <> ''
    GROUP BY word
    """,
)
def mr_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wordcount over documents.text via the Batch pipeline API — exercises
    scan -> map chain -> hash partition -> reduce -> (no sink), i.e. every
    reference operator R1-R7 (SURVEY.md §2.1)."""
    spec = BatchSpec(
        input_path=table_path(sf_dir, "documents"),
        input_format="parquet",
        map_fns=[
            lambda df: df.select(
                F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("word")
            ).filter(F.col("word") != "")
        ],
        partition_key="word",
        r_num=8,
        reduce_agg=[F.count("*").alias("cnt")],
    )
    return submit_batch(spark, spec)


@register(
    "mr_wordcount_top20",
    oracle="""
    SELECT word, count(*) AS cnt
    FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS word
          FROM documents)
    WHERE word <> ''
    GROUP BY word
    ORDER BY cnt DESC, word
    LIMIT 20
    """,
)
def mr_wordcount_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k over the pipeline result (TakeOrdered — no global sort)."""
    return (
        mr_wordcount(spark, sf_dir)
        .orderBy(F.col("cnt").desc(), F.col("word"))
        .limit(20)
    )


@register(
    "mr_terasort_rank",
    oracle="""
    SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
           l_extendedprice, pos
    FROM (SELECT l_orderkey, l_linenumber, l_extendedprice,
                 row_number() OVER (
                   ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS pos
          FROM lineitem)
    WHERE pos % 5000 = 0
    """,
)
def mr_terasort_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TeraSort — the canonical MapReduce benchmark — as a DISTRIBUTED
    total-order sort of the FULL lineitem table (no filter), made
    observable by stamping every row's exact global position and
    decimating to every 5000th rank so the output stays driver-comparable
    at any scale. Parity: the reference's reduce stage emits key-sorted
    output per partition (`mr-bins/reduce/reduce.cpp:19,35-38` —
    ``std::map`` ordering) and hash-partitions keys across reducers
    (`mr-bins/partition/partition.cpp:33-38`); swapping the hash
    partitioner for a RANGE partitioner turns that into a global sort —
    exactly ``operators.topk.global_rank``: repartitionByRange +
    sortWithinPartitions + per-partition offset numbering, never the
    single-reducer ``row_number() OVER (ORDER BY ...)`` the oracle uses
    (an ``Exchange SinglePartition`` cannot exist at 100 TB; the window
    form is correct as an ORACLE precisely because DuckDB runs it on one
    machine anyway). (l_extendedprice, l_orderkey, l_linenumber) is a
    deterministic total order — unique tie-break keys, so range placement
    of equal prices cannot change ranks."""
    from irio_mapreduce_spark.operators.topk import global_rank

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    ranked = global_rank(
        li, ["l_extendedprice", "l_orderkey", "l_linenumber"], rank_col="pos"
    )
    return ranked.filter(F.col("pos") % 5000 == 0).select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        "l_extendedprice",
        "pos",
    )


@register(
    "mr_batch_json_wordcount",
    oracle="""
    SELECT w AS word, CAST(count(*) AS BIGINT) AS cnt FROM (
      SELECT unnest(list_filter(
               string_split_regex(lower(regexp_replace(text, '[\\r\\n]+', ' ', 'g')),
                                  '\\s+'),
               t -> t <> '')) AS w
      FROM documents)
    GROUP BY w ORDER BY cnt DESC, w LIMIT 20
    """,
)
def mr_batch_json_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's FULL client surface, driver-checked: documents flow
    into a directory-storage root (numbered text files — the reference
    data plane), a literal batch JSON in the reference fixture shape
    (``mr-bins/batchJsons/batch1.json:1-9``) is parsed by
    ``batch_json.batch_from_json`` and executed via the ``__BINARY``-style
    id->command registry — real fork/exec'd awk processes through
    ``RDD.pipe`` implementing map.cpp's tokenize-to-"word 1" and
    reduce.cpp's per-key sum contracts — and the resulting lines are
    parsed back and top-20'd against DuckDB counting the same corpus
    straight from parquet. Exercises JSON parse, binary registry, dir
    storage, external-process map/reduce chain, hash partition and the
    exact-R sink in one hash-checked entry."""
    import tempfile

    from irio_mapreduce_spark import pysource
    from irio_mapreduce_spark.batch_json import BinaryRegistry, submit_json_batch

    pysource.register(spark)
    root = tempfile.mkdtemp(prefix="batchjson_q_")
    data = os.path.join(root, "0")
    # The corpus lands in the storage root DISTRIBUTED (the dirtext
    # writer's tmp+driver-commit path — no driver-side collect): 8 data
    # files = the reference's dir-of-files dataset, one map split each.
    (
        read_table(spark, sf_dir, "documents")
        .select(
            F.lower(F.regexp_replace(F.col("text"), r"[\r\n]+", " ")).alias("v")
        )
        .repartition(8)
        .write.format("dirtext")
        .option("path", data)
        .mode("append")
        .save()
    )
    batch = """
    {"map_bin_ids": [0], "partition_bin_id": 1, "reduce_bin_ids": [2],
     "input_id": "0", "final_dest_dir_id": "1",
     "split_count": 8, "r_num": 4}
    """
    reg = (
        BinaryRegistry(root)
        .put(0, "awk '{for (i = 1; i <= NF; i++) print $i, 1}'")
        .put(2, "awk '{c[$1] += $2} END {for (k in c) print k, c[k]}'")
    )
    rdd = submit_json_batch(spark, root, batch, registry=reg)
    counts = rdd.map(lambda line: line.split()).map(
        lambda kv: (kv[0], int(kv[1]))
    )
    out = spark.createDataFrame(counts, "word string, cnt long")
    return out.orderBy(F.col("cnt").desc(), "word").limit(20)


@register(
    "pipeline_curation_end_to_end",
    oracle="""
    WITH t AS (SELECT doc_id, lang, source, text,
                      list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                  t -> t <> '') AS toks
               FROM documents),
    dd AS (SELECT *, row_number() OVER (PARTITION BY sha256(text)
                                        ORDER BY doc_id) AS rn
           FROM t),
    q AS (SELECT doc_id, lang, source, len(toks) AS n_tokens
          FROM dd
          WHERE rn = 1
            AND len(toks) BETWEEN 20 AND 200
            AND len(list_distinct(toks)) * 1.0 / len(toks) >= 0.15),
    qt AS (SELECT *, row_number() OVER (
             PARTITION BY source
             ORDER BY ('0x' || substr(md5(doc_id::VARCHAR || '|q'), 1, 8))::BIGINT
                      % 2147483648, doc_id) AS qrn
           FROM q),
    sp AS (SELECT doc_id, lang, source, n_tokens,
                  CASE WHEN (('0x' || substr(md5(doc_id::VARCHAR || '|split'), 1, 8))::BIGINT
                             % 100) < 90
                       THEN 'train' ELSE 'val' END AS split
           FROM qt WHERE qrn <= 15)
    SELECT doc_id, lang, source, split, n_tokens,
           CAST(floor(coalesce(sum(n_tokens) OVER (
             PARTITION BY split, lang ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2000)
           AS BIGINT) AS batch_id
    FROM sp
    """,
)
def pipeline_curation_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation PIPELINE, composed end-to-end from this repo's
    operators: exact content dedup (sha256 keep-first) -> C4-style quality
    filter (token band + type-token ratio) -> per-source quota (hash-order
    cap at 15) -> leakage-safe 90/10 train/val split -> token-budget batch
    packing per (split, lang). One query plan: a scan-side filter chain,
    three window shuffles (dedup hash, source quota, packing), zero
    collects — the shape a 100 TB curation run actually executes. The
    oracle chains the same five stages as one DuckDB CTE pipeline, so the
    COMPOSITION is hash-checked, not just each stage."""
    from irio_mapreduce_spark.llm.dedup import exact_dedup
    from irio_mapreduce_spark.llm.sampling import (
        per_key_quota,
        token_budget_batches,
        train_val_split,
    )
    from irio_mapreduce_spark.llm.text import quality_features

    docs = read_table(spark, sf_dir, "documents")
    d1 = exact_dedup(
        docs.select("doc_id", "lang", "source", "text"),
        fingerprint=F.sha2(F.col("text"), 256),
        order_by=[F.col("doc_id")],
    )
    d2 = quality_features(d1).filter(
        (F.col("n_tokens") >= 20)
        & (F.col("n_tokens") <= 200)
        & (F.col("ttr") >= 0.15)
    )
    d3 = per_key_quota(
        d2.select("doc_id", "lang", "source", "n_tokens"),
        "source", quota=15, id_col="doc_id", salt="q",
    )
    d4 = train_val_split(d3, ["doc_id"], val_pct=10, salt="split")
    d5 = token_budget_batches(
        d4, ["split", "lang"], "doc_id", F.col("n_tokens"), budget=2000,
        tokens_out="n_tokens",
    )
    return d5.select("doc_id", "lang", "source", "split", "n_tokens", "batch_id")


@register(
    "pipeline_ingest_end_to_end",
    oracle="""
    WITH norm AS (
      SELECT doc_id,
             trim(regexp_replace(regexp_replace(regexp_replace(text,
               'https?://[^ \\t\\n\\r\\f]+', '', 'g'),
               '\\[\\d+\\]', '', 'g'),
               '[ \\t\\n\\r\\f]+', ' ', 'g')) AS text
      FROM documents),
    corpus AS (SELECT * FROM norm WHERE doc_id % 10 <> 0),
    batch AS (SELECT * FROM norm WHERE doc_id % 10 = 0),
    b1 AS (SELECT * FROM batch
           WHERE sha256(text) NOT IN (SELECT sha256(text) FROM corpus)),
    bt AS (SELECT doc_id,
                  list_distinct(list_transform(
                    generate_series(1, len(list_filter(string_split_regex(lower(trim(text)), '\\s+'), t -> t <> '')) - 2),
                    i -> array_to_string(list_filter(string_split_regex(lower(trim(text)), '\\s+'), t -> t <> '')[i:i+2], ' '))) AS s
           FROM b1),
    ct AS (SELECT doc_id,
                  list_distinct(list_transform(
                    generate_series(1, len(list_filter(string_split_regex(lower(trim(text)), '\\s+'), t -> t <> '')) - 2),
                    i -> array_to_string(list_filter(string_split_regex(lower(trim(text)), '\\s+'), t -> t <> '')[i:i+2], ' '))) AS s
           FROM corpus),
    near AS (SELECT DISTINCT b.doc_id
             FROM bt b, ct c
             WHERE len(list_intersect(c.s, b.s)) * 1.0
                   / (len(c.s) + len(b.s) - len(list_intersect(c.s, b.s))) >= 0.8),
    b2 AS (SELECT * FROM b1 WHERE doc_id NOT IN (SELECT doc_id FROM near)),
    b3 AS (SELECT * FROM b2
           WHERE len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                 t -> t <> '')) >= 10)
    SELECT 'batch' AS stage, CAST((SELECT count(*) FROM batch) AS BIGINT) AS n
    UNION ALL SELECT 'after_exact', CAST((SELECT count(*) FROM b1) AS BIGINT)
    UNION ALL SELECT 'after_near', CAST((SELECT count(*) FROM b2) AS BIGINT)
    UNION ALL SELECT 'after_quality', CAST((SELECT count(*) FROM b3) AS BIGINT)
    UNION ALL SELECT 'corpus_before', CAST((SELECT count(*) FROM corpus) AS BIGINT)
    UNION ALL SELECT 'corpus_after',
      CAST((SELECT count(*) FROM corpus) + (SELECT count(*) FROM b3) AS BIGINT)
    """,
)
def pipeline_ingest_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The INGEST pipeline composed end-to-end from this repo's operators —
    the daily-batch production story, as one chained plan whose stage
    counts the oracle replays:

    normalize (C4 cleanup) → Bloom-prefiltered EXACT dedup vs the standing
    corpus (`bloom_prefiltered_new`) → LSH NEAR-dedup vs the corpus index
    (`incremental_dedup`) → quality gate (≥10 tokens) → SCD1 merge of the
    survivors into the corpus (`merge_upsert`; disjoint ids ⇒ all inserts,
    asserted via the stage arithmetic). Complements
    `pipeline_curation_end_to_end` (the corpus-wide curation story) with
    the incremental-ingest topology: corpus is indexed and probed, never
    self-joined; batch payloads never shuffle in the exact pass."""
    from irio_mapreduce_spark.llm.dedup import (
        bloom_prefiltered_new,
        incremental_dedup,
        tokens,
    )
    from irio_mapreduce_spark.llm.text import normalize_text
    from irio_mapreduce_spark.operators.merge import merge_upsert

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", normalize_text(F.col("text")).alias("text")
    )
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    # r12 (guide §1.3/§5): the six count branches below union over a CHAIN
    # (batch → b1 → b2 → b3 → merged), so without pinning, the Bloom pass
    # ran 4× and the whole LSH near-dedup 3× inside one plan. Persisting
    # the two batch-side intermediates (batch-sized — tiny next to the
    # corpus at any scale) runs each pass once; measured 6.6 → ~2.5 s at
    # sf0.1.
    b1 = bloom_prefiltered_new(
        corpus, batch, F.sha2(F.col("text"), 256), expected_items=100_000
    ).persist()  # after_exact count + the LSH probe both read it
    b2 = incremental_dedup(corpus, b1, "doc_id", "text").persist()
    # after_near count, the quality gate, and the merge all read b2
    b3 = b2.filter(F.size(tokens(F.col("text"))) >= 10)
    merged = merge_upsert(corpus, b3, ["doc_id"])

    def stage(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count("*").cast("long").alias("n")).select(
            F.lit(name).alias("stage"), "n"
        )

    out = stage("batch", batch)
    for name, df in [
        ("after_exact", b1),
        ("after_near", b2),
        ("after_quality", b3),
        ("corpus_before", corpus),
        ("corpus_after", merged),
    ]:
        out = out.unionByName(stage(name, df))
    return out


@register(
    "pipeline_backfill_incremental",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL 1 DAY, ts), '%Y-%m-%d') AS day,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN value >= 0 THEN floor(value * 100 + 0.5)
                         ELSE -floor(-value * 100 + 0.5) END) AS BIGINT)
             AS value_cents,
           CASE WHEN strftime(time_bucket(INTERVAL 1 DAY, ts), '%Y-%m-%d')
                     <= '2024-01-15' THEN 'run_a' ELSE 'run_b' END
             AS processed_by
    FROM events
    GROUP BY 1
    """,
)
def pipeline_backfill_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """INCREMENTAL BACKFILL — the scheduled-pipeline idiom at 100 TB:
    each run discovers WHICH day partitions are missing from the target
    (source day list anti-joined against the target's committed
    directories) and processes ONLY those, so a late backfill never
    recomputes or double-writes finished days. Three runs inside the
    entry: run_a with visibility limited to days <= 2024-01-15 (the
    'yesterday's schedule' simulation), run_b over the full source
    (backfills exactly the remaining days), and a THIRD run that must
    find ZERO missing days — the idempotence the pattern exists for,
    asserted in-entry. Each processed day lands as its own partition
    directory tagged with the run that produced it; the oracle derives
    the same day->run assignment from the cutoff. Per-day writes are
    append-of-missing-only: the anti-join IS the exactly-once
    mechanism, no global overwrite ever happens."""
    import tempfile

    ev = read_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    target = tempfile.mkdtemp(prefix="backfill_") + "/daily"

    def run(tag: str, visible) -> int:
        src = visible.select("day").distinct()
        # Only a genuinely-absent target means "first run": any OTHER
        # read failure (transient IO, corrupt footer) must propagate —
        # swallowing it would silently re-append every day and break the
        # exactly-once contract this entry demonstrates.
        if os.path.isdir(target):
            done = (
                spark.read.parquet(target)
                .select(F.col("day").cast("string").alias("day"))
                .distinct()
            )
            missing = src.join(done, "day", "left_anti")
        else:
            missing = src  # first run: no target yet
        days = [r["day"] for r in missing.collect()]
        if not days:
            return 0
        cents = F.when(
            F.col("value") >= 0, F.floor(F.col("value") * 100 + 0.5)
        ).otherwise(-F.floor(-F.col("value") * 100 + 0.5))
        (
            visible.filter(F.col("day").isin(days))
            .groupBy("day")
            .agg(
                F.count("*").cast("long").alias("n"),
                F.sum(cents.cast("long")).cast("long").alias("value_cents"),
            )
            .withColumn("processed_by", F.lit(tag))
            .write.partitionBy("day")
            .mode("append")
            .parquet(target)
        )
        return len(days)

    run("run_a", ev.filter(F.col("day") <= "2024-01-15"))
    run("run_b", ev)
    redo = run("run_b_redo", ev)
    if redo != 0:
        raise RuntimeError(
            f"re-run of a completed backfill processed {redo} days — "
            "the missing-day discovery is not idempotent"
        )
    return spark.read.parquet(target).select(
        F.col("day").cast("string").alias("day"),
        "n",
        "value_cents",
        "processed_by",
    )


@register(
    "mr_secondary_sort",
    oracle="""
    WITH seq AS (
      SELECT o_custkey, o_orderdate, o_orderpriority,
             row_number() OVER w AS rn,
             count(*) OVER (PARTITION BY o_custkey) AS cnt,
             lag(o_orderdate) OVER w AS prev_d
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
    SELECT o_custkey AS custkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           max(CASE WHEN rn = 1 THEN o_orderpriority END) AS first_priority,
           max(CASE WHEN rn = cnt THEN o_orderpriority END) AS last_priority,
           CAST(coalesce(max(date_diff('day', prev_d, o_orderdate)), 0)
                AS BIGINT) AS max_gap_days
    FROM seq GROUP BY o_custkey
    """,
)
def mr_secondary_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SECONDARY SORT — the canonical MapReduce idiom the reference's
    shuffle enables (values arrive at the reducer grouped by key; the
    idiom adds a value-order contract — `partition.cpp:33-38` hashes
    the key, `ReduceProcessor.java:24-52` folds the group): expressed
    Spark-native as ``repartition(key).sortWithinPartitions(key, date,
    id)`` + ONE ``mapInPandas`` pass that streams each partition in
    order, carrying (customer, first/last priority, previous date, max
    gap) across Arrow batch boundaries — the group-spans-a-batch
    carry-over is the part naive ports get wrong. No window machinery:
    the plan is exactly one Exchange + one Sort + one Python stage
    (plan-asserted), which at 100 TB is the cheapest possible shape for
    per-key ORDERED folds (windows would plan the same exchange+sort
    but materialize rank columns per row). The oracle recomputes the
    same per-customer facts with window functions — two different
    routes to one answer."""
    import pandas as pd

    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority"
    )
    n_parts = int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    ordered = o.repartition(n_parts, "o_custkey").sortWithinPartitions(
        "o_custkey", "o_orderdate", "o_orderkey"
    )

    def fold(batches):
        cur = None  # (custkey, n, first_p, last_p, prev_date, max_gap)
        out_rows = {
            "custkey": [],
            "n_orders": [],
            "first_priority": [],
            "last_priority": [],
            "max_gap_days": [],
        }

        def close(c):
            out_rows["custkey"].append(c[0])
            out_rows["n_orders"].append(c[1])
            out_rows["first_priority"].append(c[2])
            out_rows["last_priority"].append(c[3])
            out_rows["max_gap_days"].append(c[5])

        for pdf in batches:
            for ck, d, pri in zip(
                pdf["o_custkey"], pdf["o_orderdate"], pdf["o_orderpriority"]
            ):
                ck = int(ck)
                if cur is None or ck != cur[0]:
                    if cur is not None:
                        close(cur)
                    cur = (ck, 1, pri, pri, d, 0)
                else:
                    gap = (d - cur[4]).days
                    cur = (
                        ck,
                        cur[1] + 1,
                        cur[2],
                        pri,
                        d,
                        max(cur[5], gap),
                    )
        if cur is not None:
            close(cur)
        yield pd.DataFrame(out_rows)

    return ordered.mapInPandas(
        fold,
        "custkey long, n_orders long, first_priority string, "
        "last_priority string, max_gap_days long",
    )


@register(
    "mr_distributed_grep",
    oracle="""
    WITH hits AS (
      SELECT source,
             len(regexp_extract_all(text, 'scan\\s+\\w+\\s+table'))
               AS n_matches
      FROM documents
      WHERE regexp_matches(text, 'scan\\s+\\w+\\s+table'))
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_matches) AS BIGINT) AS n_matches
    FROM hits GROUP BY source
    """,
)
def mr_distributed_grep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTRIBUTED GREP — the other canonical MapReduce program from the
    original paper (map = emit lines matching a pattern, reduce =
    identity/rollup), run through the reference-shaped Batch pipeline
    API exactly like ``mr_wordcount``: scan -> map chain (regex filter +
    per-doc occurrence count, both inside whole-stage codegen — Java
    regex JVM-side, no Python) -> hash partition on source -> reduce
    rollup (reference operators R1-R7, SURVEY.md §2.1). The predicate is
    a real multi-token pattern (``scan <word> table``) so the match
    count per doc exercises non-trivial regex extraction, not substring
    containment. The grep filter sits in the FIRST map stage, so at
    100 TB the shuffle carries only matching docs' (source, count)
    pairs — the selectivity is the scale story, as it was in the
    paper."""
    pat = r"scan\s+\w+\s+table"
    spec = BatchSpec(
        input_path=table_path(sf_dir, "documents"),
        input_format="parquet",
        map_fns=[
            lambda df: df.filter(F.col("text").rlike(pat)).select(
                "source",
                F.size(
                    F.regexp_extract_all("text", F.lit(pat), 0)
                ).alias("n"),
            )
        ],
        partition_key="source",
        r_num=8,
        reduce_agg=[
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n").cast("long").alias("n_matches"),
        ],
    )
    return submit_batch(spark, spec)
