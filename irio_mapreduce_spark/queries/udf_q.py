"""UDF/UDAF catalog queries (SURVEY.md §2.2 "UDF / UDAF / UDTF") — each
Python-UDF mechanism proven against a DuckDB oracle stating the same
semantics in SQL. The external-binary mechanism (``RDD.pipe``) is covered
by tests/test_pipeline.py against the reference's e2e contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from irio_mapreduce_spark.functions import (
    normalize_by_group,
    taxed_price_pandas,
    weighted_avg_grouped_agg,
)
from irio_mapreduce_spark.io import read_table
from irio_mapreduce_spark.queries.catalog import register


@register(
    "udf_pandas_scalar",
    oracle="""
    SELECT l_linestatus,
           round(sum(l_extendedprice * (1 + l_tax)), 2) AS total_taxed
    FROM lineitem WHERE l_orderkey % 41 = 0
    GROUP BY l_linestatus
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized Series->Series pandas UDF in a projection, then a
    built-in aggregate over its output."""
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 41 == 0)
    taxed = li.withColumn(
        "taxed", taxed_price_pandas(F.col("l_extendedprice"), F.col("l_tax"))
    )
    return taxed.groupBy("l_linestatus").agg(
        F.round(F.sum("taxed"), 2).alias("total_taxed")
    )


@register(
    "udf_grouped_agg",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS w_avg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF — the reference reduce-binary analog
    (``reduce.cpp:9-40``): one scalar per group from the group's columns."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(
            weighted_avg_grouped_agg(F.col("l_extendedprice"), F.col("l_quantity")), 4
        ).alias("w_avg_price")
    )


@register(
    "udf_grouped_map",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                  * (count(*) OVER (PARTITION BY o_custkey))
                - (sum(CAST(round(o_totalprice * 100) AS BIGINT))
                   OVER (PARTITION BY o_custkey)) AS BIGINT) AS dev
    FROM orders
    WHERE o_custkey % 151 = 0
    """,
)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map ``applyInPandas`` (per-customer mean-centering, in
    exact cents-scaled integer form — see functions.normalize_by_group for
    why) — the oracle states the same thing as window aggregates, which is
    also the correct built-in at scale (one shuffle, no per-group pandas
    frames)."""
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 151 == 0)
    return normalize_by_group(
        o.select("o_custkey", "o_orderkey", "o_totalprice"), ["o_custkey"], "o_totalprice"
    ).select("o_orderkey", "dev")


@register(
    "udf_python_udtf",
    oracle="""
    SELECT w AS word, length(w) AS wlen, count(*) AS n
    FROM (SELECT unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                    t -> t <> '')) AS w
          FROM documents WHERE doc_id % 29 = 0)
    GROUP BY w
    """,
)
def udf_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (1 row -> N rows, the table-function analog of a map
    binary emitting many lines, reference R2): tokenize each document into
    (word, wlen) rows, then aggregate. The lateral-join shape is
    ``F.udtf`` + ``lateralJoin``; built-in explode remains the fast path
    for anything expressible without Python."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word string, wlen int")
    class Tokenize:
        def eval(self, text: str):
            for w in (text or "").lower().split():
                if w:
                    yield w, len(w)

    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 29 == 0)
    words = docs.lateralJoin(Tokenize(F.col("text").outer()))
    return words.groupBy("word").agg(
        F.max("wlen").alias("wlen"), F.count("*").alias("n")
    )


# NB: udf_row_at_a_time (the documented row-UDF slow-path demo) lives in
# slowpath_q.py so it registers at the catalog tail, keeping this family's
# front-window slots for the vectorized surfaces above.


@register(
    "udf_grouped_map_arrow",
    oracle="""
    SELECT c_custkey,
           CAST(CAST(round(c_acctbal * 100) AS BIGINT)
                - min(CAST(round(c_acctbal * 100) AS BIGINT))
                    OVER (PARTITION BY c_nationkey) AS BIGINT) AS delta_cents
    FROM customer
    WHERE c_custkey % 11 = 0
    """,
)
def udf_grouped_map_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map ``applyInArrow`` (Spark 4): the zero-pandas Arrow-native
    grouped transform — each group arrives as a ``pyarrow.Table``, is
    rebased against its group minimum, and returns a ``pyarrow.Table``.
    Skips the Arrow->pandas->Arrow conversion ``applyInPandas`` pays (no
    index materialization, no object boxing), which is the right grouped
    Python path when the logic is pure columnar compute. Money is
    cents-scaled BEFORE differencing so the result is exact integers on
    both engines (catalog.py half-boundary convention). The oracle states
    the same rebase as a window MIN — also the built-in form a 100 TB run
    should prefer when the logic fits expressions."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def rebase(table: pa.Table) -> pa.Table:
        # half_towards_infinity = round-half-away-from-zero, matching
        # DuckDB/Spark round(); pyarrow's default is banker's rounding,
        # which would break on an exact-half cents boundary
        cents = pc.cast(
            pc.round(
                pc.multiply(table.column("c_acctbal"), 100.0),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        delta = pc.subtract(cents, pc.min(cents))
        return pa.table(
            {"c_custkey": table.column("c_custkey"), "delta_cents": delta}
        )

    c = read_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 11 == 0)
    return (
        c.select("c_nationkey", "c_custkey", "c_acctbal")
        .groupBy("c_nationkey")
        .applyInArrow(rebase, schema="c_custkey long, delta_cents long")
    )


@register(
    "events_variant_props",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           count(CASE WHEN json_extract_string(props, '$.absent') IS NULL
                      THEN NULL ELSE 1 END) AS n_absent
    FROM events
    GROUP BY event_type
    """,
)
def events_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT path over semi-structured data: ``parse_json`` the
    props column ONCE into a VARIANT value, then ``variant_get`` typed
    scalars out of it — the open-schema alternative to ``from_json`` when
    the schema isn't known up front (VARIANT stores a parsed binary form;
    repeated ``get_json_object`` re-parses the string per call). VARIANT
    itself never appears in the output (driver canon can't hash it):
    only extracted scalars do. The miss path (``$.absent``) must come
    back NULL, counted to prove absent-key semantics match JSON SQL."""
    e = read_table(spark, sf_dir, "events")
    v = e.select(
        "event_type", F.parse_json(F.col("props")).alias("pv")
    ).select(
        "event_type",
        F.variant_get(F.col("pv"), "$.k", "bigint").alias("k"),
        F.variant_get(F.col("pv"), "$.absent", "string").alias("absent"),
    )
    return v.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("k").cast("long").alias("sum_k"),
        F.count("absent").alias("n_absent"),
    )


@register(
    "udf_map_in_arrow",
    oracle="""
    SELECT p_partkey,
           CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
           length(p_name) - length(replace(p_name, ' ', '')) + 1
             AS name_words
    FROM part WHERE p_partkey % 13 = 0
    """,
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped ``mapInArrow`` (the per-BATCH Arrow-native map, vs
    ``applyInArrow``'s per-GROUP form): batches arrive as
    ``pyarrow.RecordBatch`` iterators with NO shuffle and NO grouping —
    the narrow-transform quadrant of the Python-compute surface (pandas
    scalar UDF / grouped-agg / grouped-map / UDTF / pipe cover the
    rest). The stage cents-scales money (half-away rounding — pyarrow
    defaults to banker's) and counts name words with Arrow compute
    kernels; zero pandas, zero object boxing. The oracle states both
    transforms in SQL. At 100 TB this is the right shape for columnar
    Python libraries (tokenizers, codecs) that accept Arrow directly:
    partition-parallel, spill-free, batch-sized memory."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def cents(batches):
        for b in batches:
            t = pa.Table.from_batches([b])
            price = pc.cast(
                pc.round(
                    pc.multiply(t.column("p_retailprice"), 100.0),
                    round_mode="half_towards_infinity",
                ),
                pa.int64(),
            )
            words = pc.add(
                pc.subtract(
                    pc.utf8_length(t.column("p_name")),
                    pc.utf8_length(
                        pc.replace_substring(t.column("p_name"), " ", "")
                    ),
                ),
                1,
            )
            yield pa.table(
                {
                    "p_partkey": t.column("p_partkey"),
                    "price_cents": price,
                    "name_words": pc.cast(words, pa.int64()),
                }
            ).to_batches()[0]

    p = read_table(spark, sf_dir, "part").filter(F.col("p_partkey") % 13 == 0)
    return p.select("p_partkey", "p_retailprice", "p_name").mapInArrow(
        cents, schema="p_partkey long, price_cents long, name_words long"
    )


@register(
    "udf_udtf_polymorphic",
    oracle="""
    WITH t AS (
      SELECT p_partkey,
             string_split_regex(p_name, ' ') AS w
      FROM part WHERE p_partkey % 29 = 0)
    SELECT p_partkey,
           COALESCE(w[1], '') AS f0,
           COALESCE(w[2], '') AS f1,
           COALESCE(w[3], '') AS f2
    FROM t
    """,
)
def udf_udtf_polymorphic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4 ``analyze()``): the output schema
    is computed AT PLAN TIME from a constant argument — here "split the
    name into the first n=3 tokens as n typed columns", so the same
    table function serves any arity without code changes (the
    static-schema UDTF entry above is the fixed-arity counterpart).
    ``analyze`` receives each argument's type and foldable value and
    returns the result StructType; Catalyst then plans the lateral join
    against a KNOWN schema — no runtime schema discovery, full column
    pruning through the UDTF boundary. The oracle states the same
    fixed-width split with SQL list indexing."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructField, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class SplitN:
        @staticmethod
        def analyze(s: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            return AnalyzeResult(
                StructType(
                    [
                        StructField(f"f{i}", StringType())
                        for i in range(n.value)
                    ]
                )
            )

        def eval(self, s, n):
            parts = (s or "").split(" ")
            yield tuple((parts + [""] * n)[:n])

    spark.udtf.register("split_n_poly", udtf(SplitN))
    read_table(spark, sf_dir, "part").filter(
        F.col("p_partkey") % 29 == 0
    ).createOrReplaceTempView("part_poly_v")
    return spark.sql(
        """
        SELECT v.p_partkey, t.f0, t.f1, t.f2
        FROM part_poly_v v, LATERAL split_n_poly(v.p_name, 3) t
        """
    )


@register(
    "udf_cogrouped_map",
    oracle="""
    SELECT c.c_custkey,
           CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
           CAST(count(o.o_orderkey)
                  FILTER (o.o_totalprice > c.c_acctbal) AS BIGINT)
             AS n_above_balance,
           CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_cents
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey % 37 = 0
    GROUP BY c.c_custkey, c.c_acctbal
    """,
)
def udf_cogrouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CO-GROUPED pandas map (``df.groupBy(k).cogroup(other.groupBy(k))
    .applyInPandas``) — the last Python-compute quadrant beside scalar /
    grouped-agg / grouped-map / mapIn{Pandas,Arrow}: BOTH sides shuffle
    on the key and each key's two group frames arrive in ONE function
    call, the escape hatch for per-key algorithms over two tables that
    no join expresses (custom as-of alignment, per-entity
    reconciliation, trajectory diffing). Here each customer's orders are
    reconciled against their account row (order count + how many orders
    exceed the balance + exact-cents balance), deliberately re-stating a
    plain join+filter aggregate so the DuckDB oracle hash-checks the
    mechanism end to end. Keys present on only one side still produce a
    call (the other frame arrives EMPTY) — customers with no orders must
    emit n_orders=0, which the LEFT JOIN oracle pins. Scale: one
    co-partitioned shuffle pair, state bounded by the largest single
    key's rows — the same contract as grouped-map."""
    import pandas as pd

    cust = read_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % 37 == 0
    ).select("c_custkey", "c_acctbal")
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    # semi-filter the fact side before the shuffle: only the 1/37 keys
    # the entry reports can contribute (predicate-pushdown analog for
    # the cogroup, keeps the big side's exchange proportional)
    orders = orders.join(
        cust.select(F.col("c_custkey").alias("o_custkey")), "o_custkey", "left_semi"
    )

    def reconcile(key, cdf: pd.DataFrame, odf: pd.DataFrame) -> pd.DataFrame:
        if len(cdf) == 0:
            # order rows whose key has no customer row: impossible here
            # (semi-filtered), but the contract is explicit
            return pd.DataFrame(
                columns=["c_custkey", "n_orders", "n_above_balance", "acctbal_cents"]
            )
        import math

        bal = float(cdf["c_acctbal"].iloc[0])
        return pd.DataFrame(
            {
                "c_custkey": [int(key[0])],
                "n_orders": [len(odf)],
                "n_above_balance": [int((odf["o_totalprice"] > bal).sum())],
                # floor, not int(): acctbal is negative for ~10% of
                # customers and int() truncates toward zero
                "acctbal_cents": [math.floor(bal * 100 + 0.5)],
            }
        )

    return (
        cust.groupBy("c_custkey")
        .cogroup(orders.groupBy(F.col("o_custkey").alias("c_custkey")))
        .applyInPandas(
            reconcile,
            schema=(
                "c_custkey long, n_orders long, n_above_balance long, "
                "acctbal_cents long"
            ),
        )
    )


@register(
    "udf_pandas_scalar_iter",
    oracle="""
    SELECT CAST(month(l_shipdate) AS BIGINT) AS ship_month,
           CAST(sum(CAST(l_quantity AS BIGINT)
                    * (100 + 3 * month(l_shipdate))) AS BIGINT)
             AS surcharge_total,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY 1
    """,
)
def udf_pandas_scalar_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCALAR_ITER pandas UDF — the remaining UDF-surface quadrant: an
    ITERATOR of Arrow batches flows through one function invocation per
    task, so per-task state (a model, a tokenizer, a codec table)
    initializes ONCE and every batch reuses it — the exact shape of
    "load the quality model once per executor, score a billion rows"
    in an LLM curation pipeline, which a plain SCALAR UDF cannot express
    (no once-per-task hook). The deterministic stand-in model is a
    12-entry integer surcharge table (`functions.udfs
    .month_surcharge_iter_udf`); all-integer output, so the oracle
    replays the table inline and the rollup hash-matches exactly."""
    from irio_mapreduce_spark.functions.udfs import month_surcharge_iter_udf

    surcharge = month_surcharge_iter_udf()
    li = read_table(spark, sf_dir, "lineitem").select(
        F.month("l_shipdate").alias("ship_month"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    return (
        li.withColumn(
            "s", surcharge(F.col("ship_month"), F.col("qty"))
        )
        .groupBy(F.col("ship_month").cast("long").alias("ship_month"))
        .agg(
            F.sum("s").cast("long").alias("surcharge_total"),
            F.count("*").cast("long").alias("n"),
        )
    )


@register(
    "udf_arrow_python_scalar",
    oracle="""
    WITH scored AS (
      SELECT list_sum(list_transform(
               regexp_extract_all(o_orderkey::VARCHAR, '\\d'),
               x -> x::BIGINT)) AS digit_sum,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders WHERE o_orderkey % 13 = 0)
    SELECT CAST(digit_sum AS BIGINT) AS digit_sum,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(cents) AS BIGINT) AS cents
    FROM scored GROUP BY 1
    """,
)
def udf_arrow_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARROW-OPTIMIZED PYTHON UDF (``useArrow=True``) — the missing
    quadrant between the row-at-a-time pickle UDF (udf_row_at_a_time,
    the declared slow path: per-row Python call, pickle transport) and
    the pandas UDF (vectorized Series semantics): row-at-a-time CALL
    semantics kept, but ARROW batch transport replaces pickle — Spark
    4's recommended drop-in upgrade when row logic can't vectorize.
    The function is a digit-sum (needs per-value iteration, the honest
    shape for this quadrant); grouping its output and hash-matching
    exact cent sums proves value fidelity through the Arrow boundary.
    At 100 TB the ranking is builtin >> pandas UDF >= arrow UDF >>
    pickle UDF; this entry exists so the catalog demonstrates (and
    times) the third rung explicitly."""
    from pyspark.sql.functions import udf

    @udf("long", useArrow=True)
    def digit_sum(k: int) -> int:
        return sum(int(c) for c in str(k))

    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 13 == 0
    )
    scored = orders.select(
        digit_sum(F.col("o_orderkey")).alias("digit_sum"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    return scored.groupBy("digit_sum").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("cents"),
    )


@register(
    "udf_pandas_agg_over_window",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, l_linenumber,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
             CAST(l_quantity AS BIGINT) AS qty
      FROM lineitem WHERE l_orderkey % 61 = 0)
    SELECT l_orderkey, l_linenumber,
           CAST(sum(cents * qty) OVER w * 1000 // sum(qty) OVER w
                AS BIGINT) AS run_wavg_milli
    FROM li
    WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def udf_pandas_agg_over_window(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PANDAS UDAF AS A WINDOW FUNCTION — the UDF-surface quadrant the
    catalog was missing: a GROUPED_AGG pandas UDF evaluated ``.over()``
    a BOUNDED running frame (SPARK-24561), so custom aggregation logic
    gets frame semantics without a grouped-map rewrite. Spark feeds the
    UDF each row's frame as pandas Series — the running quantity-
    weighted average price per order, in exact fixed-point (cents·qty
    summed in int64 inside the UDF, floor-scaled ×1000; positive
    operands make pandas ``//``, Spark div and DuckDB ``//`` agree), so
    the driver hash is exact despite the DOUBLE transport type. Frame
    order is total (linenumber is unique per order). At 100 TB the cost
    model is the caution: a bounded pandas window re-sends each frame —
    prefer built-in window aggs (the oracle's form) unless the logic
    genuinely needs Python."""
    from pyspark.sql.window import Window as W

    from irio_mapreduce_spark.functions.udfs import running_wavg_milli

    li = (
        read_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 61 == 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.floor(F.col("l_extendedprice") * 100 + 0.5)
            .cast("long")
            .alias("cents"),
            F.col("l_quantity").cast("long").alias("qty"),
        )
    )
    w = (
        W.partitionBy("l_orderkey")
        .orderBy("l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        running_wavg_milli(F.col("cents"), F.col("qty"))
        .over(w)
        .cast("long")
        .alias("run_wavg_milli"),
    )
