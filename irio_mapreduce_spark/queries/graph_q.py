"""Graph-analytics catalog queries: fixed-iteration PageRank over the
customer–supplier purchase graph (who-buys-from-whom), mirrored so every
node has out-edges. Complements the two connectivity entries
(`dedup_cluster_components` driver-loop, `recursive_cte_hierarchy`
in-engine recursion) with the third iterative-algorithm shape: a fixed
unrolled iteration whose fixed-point integer arithmetic is cross-engine
exact, so the DuckDB oracle replays the identical three rounds as chained
CTEs. (A float formulation was tried first and diverged in the last ulp on
5/1600 nodes — see ``operators.graph.pagerank``.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from irio_mapreduce_spark.io import read_table
from irio_mapreduce_spark.operators.graph import PAGERANK_SCALE, pagerank
from irio_mapreduce_spark.queries.catalog import register

# One PageRank round in DuckDB, matching operators.graph.pagerank exactly:
# contribution = ri // outdeg (BIGINT floor division), exact BIGINT sum,
# update = (15*SCALE) // (100*N) + (85*sum) // 100 — all integer ops.
# Like the operator, ranks are rebuilt over the FULL node universe (deg)
# with a LEFT JOIN onto the contribution sums, so a zero-in-degree node
# keeps its teleport share — a GROUP BY e.dst alone would drop it (on the
# mirrored purchase graph both forms agree; the left join keeps the
# fragment faithful for any no-dangling-node graph).
_PR_ROUND = f"""
    {{out}} AS (
      SELECT d0.src AS node,
             ({15 * PAGERANK_SCALE} // (100 * n.n))
               + ((85 * COALESCE(c.s, CAST(0 AS BIGINT))) // 100) AS ri
      FROM deg d0
        CROSS JOIN n
        LEFT JOIN (
          SELECT e.dst, CAST(sum(r.ri // d.outdeg) AS BIGINT) AS s
          FROM edges e
            JOIN {{prev}} r ON e.src = r.node
            JOIN deg d ON e.src = d.src
          GROUP BY e.dst) c ON c.dst = d0.src)
"""


@register(
    "graph_pagerank_purchases",
    oracle=f"""
    WITH pairs AS (
      SELECT DISTINCT concat('C', CAST(o_custkey AS VARCHAR)) AS c,
                      concat('S', CAST(l_suppkey AS VARCHAR)) AS s
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
    edges AS (SELECT c AS src, s AS dst FROM pairs
              UNION ALL
              SELECT s, c FROM pairs),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg
            FROM edges GROUP BY 1),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
    r0 AS (SELECT src AS node, {PAGERANK_SCALE} // n.n AS ri FROM deg, n),
    {_PR_ROUND.format(out="r1", prev="r0")},
    {_PR_ROUND.format(out="r2", prev="r1")},
    {_PR_ROUND.format(out="r3", prev="r2")}
    SELECT node,
           CAST(ri AS BIGINT) AS pr_fp,
           ri / {PAGERANK_SCALE} AS pr
    FROM r3
    """,
)
def graph_pagerank_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three PageRank iterations over the mirrored customer–supplier
    purchase graph (distinct (custkey, suppkey) pairs from orders ⋈
    lineitem; mirroring removes dangling mass). High-rank suppliers are
    hubs serving many well-connected customers — the graph-centrality
    quality signal of a curation pipeline (e.g. host-level link authority
    at web scale). Exactness (fixed-point BIGINT micro-ranks) and the
    per-round shuffle budget are documented in
    ``operators.graph.pagerank``; the oracle unrolls the identical three
    rounds as chained CTEs."""
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("c"),
            F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionByName(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    return pagerank(edges, "src", "dst", iterations=3)
