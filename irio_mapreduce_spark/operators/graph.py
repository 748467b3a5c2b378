"""Graph operators beyond connectivity (see ``llm.dedup`` for connected
components): fixed-iteration PageRank with cross-engine-exact arithmetic.

Reference parity note: the reference (a generic MapReduce runtime,
``src/main`` per SURVEY.md §0) has no graph surface; iterative rank
propagation is the canonical multi-round MapReduce workload its batch model
implies (each iteration = one map(contribute)/reduce(sum) pass), so it
belongs to the declared §2.2 surface the same way connected components does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Fixed-point scale for rank values: 1.0 of rank mass == 10^12 units.
#: Large enough that per-edge floor-truncation (≤1 unit per contribution)
#: is negligible, small enough that 100 * sum(ranks) stays far inside
#: int64 (total mass ≈ 10^12; headroom ~9.2e18).
PAGERANK_SCALE = 10**12


def pagerank(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    dangling: str = "assume_none",
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list, computed in
    **fixed-point integer arithmetic** (BIGINT micro-ranks at
    ``PAGERANK_SCALE`` units per 1.0 of mass) so two independent engines
    produce bit-identical ranks:

    * a float formulation cannot make that promise — summation is
      order-dependent, and even the catalog's double→DECIMAL(38,10) snap
      diverges in the last ulp between engines (Spark rounds the exact
      BigDecimal expansion of the double; DuckDB rounds the
      double-scaled product), observed on 5/1600 nodes after 3 rounds;
    * integer ops have no such freedom: contribution = ``r div outdeg``
      (floor), per-node sum is exact, and the update is
      ``((den-num)*SCALE) div (den*N) + (num*sum) div den`` — every step
      a pure function of integers, in any engine, under any partitioning.
      Floor truncation loses <1 unit per edge (relative error ≤1e-6 at
      realistic degrees), a deterministic bias, not noise.

    ``dangling`` picks the node-universe contract:

    * ``"assume_none"`` (default) — the caller passes a graph where every
      node has at least one out-edge (e.g. mirror the edges for an
      affinity rank); the node universe is the out-degree table and no
      extra work is done. Silently wrong on graphs with sinks.
    * ``"redistribute"`` — arbitrary edge lists: the node universe is
      ``distinct(src) ∪ distinct(dst)``, and each round the rank mass
      sitting on sink nodes (no out-edges) is summed (one extra global
      aggregate, an O(sinks)→1-row broadcast) and every node receives
      ``damping * (dangling_mass div N)`` on top of its in-edge
      contributions — the standard dangling-mass correction, kept in
      exact integer arithmetic. Total mass stays ``PAGERANK_SCALE`` up
      to deterministic floor truncation (≤1 unit per integer division:
      bounded by ``edges + 3·nodes`` units per round — property-tested).
      Because each round reads the previous ranks TWICE (contributions
      and the dangling sum), this mode checkpoints the rank table per
      round (freeing the superseded one) — without the barrier the plan
      would double per iteration.

    ``iterations`` is a small fixed constant by contract — each
    round appends one join + one aggregation to the lineage (at this depth
    no checkpoint barrier is needed; the iterative-state discussion in
    ``llm.dedup.connected_components`` applies if it grows).

    Scale shape per round: contributions shuffle once on ``src`` (the join
    with ranks) and once on ``dst`` (the sum) — the classic Pregel cost —
    plus the node-universe rebuild join (degrees ⋈ sums, both keyed by
    node, so the exchange is shared) that keeps zero-in-degree nodes
    alive with their teleport share. At production scale, pre-partition
    ``edges`` by ``src`` once so every round's join reuses the exchange;
    ranks are O(nodes) rows of (node, int64).

    Returns (node, pr_fp, pr): the exact fixed-point rank and its
    ``pr_fp / SCALE`` double rendering (one IEEE division, deterministic).
    """
    if dangling not in ("assume_none", "redistribute"):
        raise ValueError(
            f"dangling must be 'assume_none' or 'redistribute', got {dangling!r}"
        )
    src, dst = F.col(src_col), F.col(dst_col)
    # Materialize the loop-invariant inputs ONCE: every round's plan
    # references edges and degrees, and without a barrier Catalyst replays
    # the full edge-build lineage per round — measured 7.3 s -> ~3 s on the
    # catalog entry (3 rounds over a join-derived edge list), and the plan
    # shrinks from ~66 exchanges to the per-round Pregel pair. Same
    # discipline as llm.dedup's iterative builders; swap for reliable
    # checkpointing on long cluster jobs.
    e = edges.select(src.alias("_src"), dst.alias("_dst")).localCheckpoint(
        eager=True
    )
    deg = e.groupBy("_src").agg(F.count("*").alias("_outdeg")).localCheckpoint(
        eager=True
    )
    if dangling == "redistribute":
        # Arbitrary edge lists: the universe includes pure sinks (nodes
        # that only ever appear as _dst), which hold rank but emit none.
        nodes = (
            e.select(F.col("_src").alias("_node"))
            .union(e.select(F.col("_dst").alias("_node")))
            .distinct()
            .localCheckpoint(eager=True)
        )
    else:
        nodes = deg.select(F.col("_src").alias("_node"))
    n_df = nodes.agg(F.count("*").alias("_n"))
    base_num = (damping_den - damping_num) * PAGERANK_SCALE
    ranks = nodes.join(F.broadcast(n_df)).select(
        "_node",
        F.expr(f"{PAGERANK_SCALE} div _n").alias("_ri"),
    )
    from irio_mapreduce_spark.llm.dedup import free_checkpoint

    prev_ckpt = None
    for _ in range(iterations):
        if dangling == "redistribute":
            # The round reads `ranks` twice (contrib AND the dangling
            # aggregate); materialize it once per round so the lineage
            # stays linear instead of doubling per iteration, and free
            # the superseded round's blocks immediately.
            ranks = ranks.localCheckpoint(eager=True)
            if prev_ckpt is not None:
                free_checkpoint(prev_ckpt)
            prev_ckpt = ranks
        contrib = (
            e.join(ranks, e["_src"] == ranks["_node"])
            .join(deg, "_src")
            .select("_dst", F.expr("_ri div _outdeg").alias("_ci"))
        )
        sums = contrib.groupBy("_dst").agg(F.sum("_ci").alias("_s"))
        if dangling == "redistribute":
            # Rank mass parked on sink nodes this round: one global
            # aggregate (anti-join against the out-degree table, broadcast
            # back as a single row). Every node then receives
            # damping * (dangling_mass div N) alongside its in-edge sum —
            # all-integer, so still cross-engine exact.
            dm_df = ranks.join(
                deg, ranks["_node"] == deg["_src"], "left_anti"
            ).agg(F.coalesce(F.sum("_ri"), F.lit(0).cast("long")).alias("_dm"))
            update = (
                f"({base_num} div ({damping_den} * _n))"
                f" + (({damping_num} * (coalesce(_s, 0L) + (_dm div _n)))"
                f" div {damping_den})"
            )
        else:
            update = (
                f"({base_num} div ({damping_den} * _n))"
                f" + (({damping_num} * coalesce(_s, 0L)) div {damping_den})"
            )
        # Rebuild ranks over the FULL node universe (nodes), not just the
        # aggregation's keys: a node with out-edges but zero in-edges
        # receives no contributions yet must keep its teleport share —
        # dropping it would delete its outgoing mass from every later
        # round.
        ranks = nodes.join(
            sums, nodes["_node"] == F.col("_dst"), "left"
        ).join(F.broadcast(n_df))
        if dangling == "redistribute":
            ranks = ranks.join(F.broadcast(dm_df))
        ranks = ranks.select("_node", F.expr(update).alias("_ri"))
    return ranks.select(
        F.col("_node").alias("node"),
        F.col("_ri").cast("long").alias("pr_fp"),
        (F.col("_ri") / F.lit(PAGERANK_SCALE)).alias("pr"),
    )


def pagerank_personalized(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    sources: DataFrame,
    source_col: str,
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
) -> DataFrame:
    """PERSONALIZED PageRank (random walk with restart): identical
    fixed-point integer arithmetic to :func:`pagerank`, but the teleport
    mass restarts ONLY onto the ``sources`` set — rank becomes "proximity
    to S weighted by graph structure", the recommendation / trust-rank
    / related-entity primitive (vs global centrality). Differences from
    the global form, all exactness-preserving:

    * init: ``SCALE div |S|`` on source nodes, 0 elsewhere (S is
      intersected with the node universe first — teleporting onto a
      node with no edges would strand mass invisibly);
    * update: the ``(1-d)`` teleport term is paid only to members of S;
      non-members receive pure in-edge mass. Mass LEAKS by design on
      non-mirrored graphs (walks that die restart at S) — on a mirrored
      graph no mass is lost to sinks, as with the global entry.

    Same per-round Pregel shuffle pair; the S-membership flag is a
    column on the rank table (one semi-join at init), so rounds add no
    extra join over the global operator. ``assume_none`` dangling
    contract only — personalize over a graph with sinks by mirroring or
    pre-filtering, the caller's choice, kept explicit."""
    src, dst = F.col(src_col), F.col(dst_col)
    e = edges.select(src.alias("_src"), dst.alias("_dst")).localCheckpoint(
        eager=True
    )
    deg = e.groupBy("_src").agg(F.count("*").alias("_outdeg")).localCheckpoint(
        eager=True
    )
    nodes = deg.select(F.col("_src").alias("_node"))
    s = (
        sources.select(F.col(source_col).alias("_node"))
        .distinct()
        .join(nodes, "_node", "left_semi")
    )
    # membership flag rides the rank table: one row per node, _in_s 0/1
    flagged = nodes.join(
        s.withColumn("_in_s", F.lit(1)), "_node", "left"
    ).select("_node", F.coalesce("_in_s", F.lit(0)).alias("_in_s"))
    flagged = flagged.localCheckpoint(eager=True)
    ns_df = flagged.agg(F.sum("_in_s").alias("_ns"))
    base_num = (damping_den - damping_num) * PAGERANK_SCALE
    ranks = flagged.join(F.broadcast(ns_df)).select(
        "_node",
        "_in_s",
        F.expr(f"CASE WHEN _in_s = 1 THEN {PAGERANK_SCALE} div _ns ELSE 0L END").alias(
            "_ri"
        ),
    )
    for _ in range(iterations):
        contrib = (
            e.join(ranks, e["_src"] == ranks["_node"])
            .join(deg, "_src")
            .select("_dst", F.expr("_ri div _outdeg").alias("_ci"))
        )
        sums = contrib.groupBy("_dst").agg(F.sum("_ci").alias("_s"))
        update = (
            f"(CASE WHEN _in_s = 1 THEN {base_num} div ({damping_den} * _ns) "
            f"ELSE 0L END)"
            f" + (({damping_num} * coalesce(_s, 0L)) div {damping_den})"
        )
        ranks = (
            flagged.join(sums, flagged["_node"] == F.col("_dst"), "left")
            .join(F.broadcast(ns_df))
            .select("_node", "_in_s", F.expr(update).alias("_ri"))
        )
    return ranks.select(
        F.col("_node").alias("node"),
        F.col("_ri").cast("long").alias("pr_fp"),
        (F.col("_ri") / F.lit(PAGERANK_SCALE)).alias("pr"),
    )


def triangle_count(edges: DataFrame, src_col: str, dst_col: str) -> DataFrame:
    """Exact triangle count of an undirected graph given as an edge list
    (either orientation, self-loops and duplicates tolerated), returning a
    single row ``(n_nodes, n_edges, n_triangles)``.

    Algorithm: **degree orientation** (Suri & Vassilvitskii, "Counting
    Triangles and the Curse of the Last Reducer", WWW 2011 — the canonical
    MapReduce formulation). Canonicalize each edge to ``a < b``, dedup,
    compute degrees, then orient every edge from its lower-(degree, id)
    endpoint to the higher one. Wedges are enumerated ONLY at each edge's
    low-degree endpoint (self-join of the oriented list on the source),
    and a wedge closes into a triangle iff its (v, w) leg exists in the
    oriented list (one semi-ish inner join). Every triangle is produced
    exactly once — at its minimum-(degree, id) vertex.

    Why this survives 100 TB: the naive wedge join explodes as
    ``sum(deg²)`` — one celebrity hub with degree 10⁷ alone yields 10¹⁴
    wedges ("the curse of the last reducer"). Orientation caps every
    out-degree at O(sqrt(edges)) (a node of degree d only keeps neighbors
    of degree ≥ d, and there can be at most 2·|E|/d of those), so the
    wedge stage is O(E^{3/2}) total work, evenly spreadable — the best
    known bound for exact counting. Shuffle budget: 2 exchanges to build
    the oriented list (dedup + degree join, both keyed on the edge), then
    1 self-join exchange on the wedge pivot and 1 on the closing-edge
    key; all rows are (long, long) pairs.

    The closing join's equi-keys are the edge pair itself, so Catalyst
    plans plain shuffled/broadcast hash joins — no theta join, no
    CartesianProduct (the catalog plan sweep enforces this).
    """
    a, b = F.col(src_col), F.col(dst_col)
    # Spark performs no common-subplan reuse across DataFrame references:
    # without a persist, the canonical edge list (often itself a join, as
    # in the co-supply entry) is REBUILT by every consumer below — deg,
    # the orientation join, both wedge legs, the closing probe and the
    # stats row, ~8 replays of the upstream lineage. persist() (not
    # localCheckpoint) keeps the lineage visible to the planner, so scan
    # pushdown assertions and recovery still see the true plan. The
    # blocks stay cached past the returned DataFrame's lifetime (the
    # lazy result still reads them); Spark's LRU eviction reclaims them
    # — callers running many censuses per session can unpersist after
    # materializing.
    und = (
        edges.select(
            F.least(a, b).alias("_a"), F.greatest(a, b).alias("_b")
        )
        .filter(F.col("_a") != F.col("_b"))
        .distinct()
        .persist()
    )
    deg = (
        und.select(F.col("_a").alias("_n"))
        .unionAll(und.select(F.col("_b").alias("_n")))
        .groupBy("_n")
        .agg(F.count("*").alias("_d"))
    )
    # Orient from lower (degree, id) to higher: ties broken by id, so the
    # orientation is a strict total order and the oriented list is acyclic.
    da = deg.select(F.col("_n").alias("_a"), F.col("_d").alias("_da"))
    db = deg.select(F.col("_n").alias("_b"), F.col("_d").alias("_db"))
    oriented = (
        und.join(da, "_a")
        .join(db, "_b")
        .select(
            F.when(
                (F.col("_da") < F.col("_db"))
                | ((F.col("_da") == F.col("_db")) & (F.col("_a") < F.col("_b"))),
                F.struct(F.col("_a").alias("u"), F.col("_b").alias("v")),
            )
            .otherwise(F.struct(F.col("_b").alias("u"), F.col("_a").alias("v")))
            .alias("_e")
        )
        .select(F.col("_e.u").alias("_u"), F.col("_e.v").alias("_v"))
        .persist()
    )
    e1 = oriented.select(F.col("_u").alias("_p"), F.col("_v").alias("_x"))
    e2 = oriented.select(F.col("_u").alias("_p"), F.col("_v").alias("_y"))
    wedges = e1.join(e2, "_p").filter(F.col("_x") < F.col("_y"))
    # The closing leg between the two wedge tips can be oriented either way
    # (orientation is by degree, not id), and an OR-of-two-equalities would
    # plan as a nested-loop join — so both sides canonicalize to the
    # (min, max) pair and the match is a plain hashable equi-key.
    closing = oriented.select(
        F.col("_u").alias("_cu"), F.col("_v").alias("_cv")
    )
    tri = wedges.select(
        # _x < _y already (wedge filter), so the pair is canonical as-is.
        F.col("_x").alias("_cu"), F.col("_y").alias("_cv")
    ).join(
        closing.select(
            F.least("_cu", "_cv").alias("_cu"),
            F.greatest("_cu", "_cv").alias("_cv"),
        ),
        ["_cu", "_cv"],
    )
    counts = tri.agg(F.count("*").alias("n_triangles"))
    stats = und.agg(F.count("*").alias("n_edges")).join(
        deg.agg(F.count("*").alias("n_nodes"))
    )
    return stats.join(counts).select(
        F.col("n_nodes").cast("long").alias("n_nodes"),
        F.col("n_edges").cast("long").alias("n_edges"),
        F.col("n_triangles").cast("long").alias("n_triangles"),
    )


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    src_col: str,
    dst_col: str,
    node_col: str,
    max_hops: int,
) -> DataFrame:
    """Bounded-hop breadth-first search over a directed edge list: the
    minimum hop distance (0..``max_hops``) from any node in ``sources`` to
    every reachable node within ``max_hops`` hops. Returns
    ``(node, hops)`` — integers, so cross-engine exact by construction.

    Shape per round (identical to one PageRank round, minus the degree
    join): frontier ⋈ edges on the source key (1 exchange), then
    ``min(hops)`` against the accumulated distance map (1 exchange) to
    keep only NEWLY reached nodes as the next frontier — the classic
    frontier-based BFS that Pregel/GraphX run, expressed as DataFrame
    joins. The frontier-only join (not visited ⋈ edges) is what keeps
    round cost proportional to the expanding wave, not the whole graph.
    ``max_hops`` is a small fixed constant by contract (the catalog entry
    unrolls 3), so lineage stays shallow without checkpoint barriers; an
    unbounded variant would reuse the ``llm.dedup.connected_components``
    convergence-probe + checkpoint-free pattern.

    At 100 TB: pre-partition ``edges`` by ``src`` once so every round's
    frontier join reuses the layout; state is O(reached) rows of
    (node, int).
    """
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    e = edges.select(
        F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst")
    ).localCheckpoint(eager=True)
    dist = sources.select(
        F.col(node_col).alias("_node"), F.lit(0).alias("_hops")
    ).distinct()
    frontier = dist
    for h in range(1, max_hops + 1):
        reached = (
            frontier.join(e, frontier["_node"] == e["_src"])
            .select(F.col("_dst").alias("_node"), F.lit(h).alias("_hops"))
            .distinct()
        )
        # New frontier = reached nodes not already at a smaller distance.
        frontier = reached.join(dist, "_node", "left_anti")
        dist = dist.unionByName(frontier)
    # A node can enter `dist` at most once (anti-join guard), so the
    # min-agg below is belt-and-braces for the unioned lineage.
    return dist.groupBy("_node").agg(F.min("_hops").alias("hops")).select(
        F.col("_node").alias("node"), F.col("hops").cast("int").alias("hops")
    )


def multi_source_bfs(
    edges: DataFrame,
    seeds: DataFrame,
    src_col: str,
    dst_col: str,
    seed_col: str,
    max_hops: int,
) -> DataFrame:
    """Per-seed bounded-hop BFS: minimum hop distance from EACH seed to
    every node reachable within ``max_hops`` — :func:`bfs_hops` with the
    distance map keyed by (seed, node) instead of node, the primitive
    under closeness/ego-network statistics. Returns
    ``(seed, node, hops)``, integers, cross-engine exact.

    Shape per round is bfs_hops' exactly (frontier ⋈ edges, then an
    anti-join against the accumulated map); the seed label rides the
    frontier rows, so k seeds cost one traversal with k-wide frontiers,
    NOT k traversals — state is O(k · reached). ``max_hops`` is a small
    fixed constant by contract (the catalog entry unrolls 4), keeping
    lineage shallow without checkpoint barriers."""
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    e = edges.select(
        F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst")
    ).localCheckpoint(eager=True)
    dist = seeds.select(
        F.col(seed_col).alias("_seed"),
        F.col(seed_col).alias("_node"),
        F.lit(0).alias("_hops"),
    ).distinct()
    frontier = dist
    for h in range(1, max_hops + 1):
        reached = (
            frontier.join(e, frontier["_node"] == e["_src"])
            .select(
                "_seed",
                F.col("_dst").alias("_node"),
                F.lit(h).alias("_hops"),
            )
            .distinct()
        )
        # Materialize each round's frontier: the anti-join consumes the
        # accumulated dist (a union of every earlier frontier), so
        # without a per-round barrier round h re-evaluates rounds
        # 1..h-1's joins — lineage cost compounds with hop count (the
        # connected_components discipline; measured 14.3 s -> in-family
        # without/with on the catalog entry at sf0.1).
        frontier = reached.join(
            dist, ["_seed", "_node"], "left_anti"
        ).localCheckpoint(eager=True)
        dist = dist.unionByName(frontier)
    return dist.groupBy("_seed", "_node").agg(
        F.min("_hops").alias("_h")
    ).select(
        F.col("_seed").alias("seed"),
        F.col("_node").alias("node"),
        F.col("_h").cast("int").alias("hops"),
    )


def label_propagation(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    iterations: int,
) -> DataFrame:
    """SYNCHRONOUS label propagation (community detection): every node
    starts labeled with itself; each round, every node adopts the most
    frequent label among its OUT-neighbors (the nodes it points to —
    mirror the edge list for undirected semantics, as the catalog entry
    does), ties broken by the SMALLEST label; a node with no out-edges
    keeps its label. Returns ``(node, label)`` after ``iterations``
    rounds.

    The deterministic tie-break is what makes this oracle-replayable:
    textbook LPA breaks ties randomly and is therefore unverifiable
    across engines; (count DESC, label ASC) is a total order, so two
    engines agree bit-for-bit on every round. Synchronous (Jacobi-style)
    update for the same reason — asynchronous LPA depends on visit
    order, which no distributed engine should promise.

    Round shape = the Pregel pair: one join keyed on the edge source
    (neighbor labels), one aggregation on (node, label) for the votes,
    one per-node window for the argmax, then a left join back onto the
    node universe so isolated nodes keep their labels. Per-round
    ``localCheckpoint`` keeps the lineage linear (each round reads the
    previous labels twice: votes + carry-forward), mirroring
    ``pagerank``'s redistribute mode. ``iterations`` is a small fixed
    constant by contract; communities typically stabilize in a handful
    of rounds on short-diameter graphs.
    """
    from pyspark.sql.window import Window

    from irio_mapreduce_spark.llm.dedup import free_checkpoint

    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    e = edges.select(
        F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst")
    ).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("_src").alias("_node"))
        .union(e.select(F.col("_dst").alias("_node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = nodes.select("_node", F.col("_node").alias("_lab"))
    prev_ckpt = None
    w = Window.partitionBy("_vnode").orderBy(
        F.col("_c").desc(), F.col("_vlab").asc()
    )
    for _ in range(iterations):
        labels = labels.localCheckpoint(eager=True)
        if prev_ckpt is not None:
            free_checkpoint(prev_ckpt)
        prev_ckpt = labels
        votes = (
            e.join(labels, e["_dst"] == labels["_node"])
            .groupBy(
                F.col("_src").alias("_vnode"), F.col("_lab").alias("_vlab")
            )
            .agg(F.count("*").alias("_c"))
        )
        pick = (
            votes.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(
                F.col("_vnode").alias("_pnode"), F.col("_vlab").alias("_plab")
            )
        )
        labels = labels.join(
            pick, labels["_node"] == F.col("_pnode"), "left"
        ).select(
            "_node", F.coalesce(F.col("_plab"), F.col("_lab")).alias("_lab")
        )
    return labels.select(
        F.col("_node").alias("node"), F.col("_lab").alias("label")
    )


def kcore_peel(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    k: int,
    rounds: int,
) -> DataFrame:
    """Bounded k-core PEELING: ``rounds`` synchronous rounds of "drop
    every node with degree < k (and its edges)" over an undirected edge
    list (canonicalized + deduped like ``triangle_count``). Returns the
    surviving ``(node, degree)`` after the last round — the dense-core
    extraction used for graph-quality curation (spam farms and
    boilerplate rings peel away; genuine dense communities survive).

    A FIXED round count keeps the operator oracle-replayable (chained
    CTEs) and the lineage shallow; it is an upper bound on the true
    k-core (peeling is monotone — nodes only ever leave), converging to
    it once a round removes nothing. An exact variant runs the same
    round under the ``llm.dedup.connected_components`` driver-loop
    convergence probe; the per-round dataflow — one degree aggregation
    + one semi-join per endpoint to drop dead edges — is identical, so
    the bounded form is the honest benchmarkable unit.

    Scale shape per round: degree aggregation (1 exchange of (node,
    count)), then two semi-joins keyed on the endpoints (broadcastable
    while the survivor set is small; AQE picks). Edges are persisted
    per round and unpersisted after the next round materializes.
    """
    if k < 1 or rounds < 1:
        raise ValueError(f"need k >= 1 and rounds >= 1, got k={k}, rounds={rounds}")
    a, b = F.col(src_col), F.col(dst_col)
    cur = (
        edges.select(F.least(a, b).alias("_a"), F.greatest(a, b).alias("_b"))
        .filter(F.col("_a") != F.col("_b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    from irio_mapreduce_spark.llm.dedup import free_checkpoint

    deg = None
    for _ in range(rounds):
        deg = (
            cur.select(F.col("_a").alias("_n"))
            .unionAll(cur.select(F.col("_b").alias("_n")))
            .groupBy("_n")
            .agg(F.count("*").alias("_d"))
        )
        keep = deg.filter(F.col("_d") >= k).select("_n")
        nxt = (
            cur.join(keep, cur["_a"] == keep["_n"], "left_semi")
            .join(keep, F.col("_b") == keep["_n"], "left_semi")
            .localCheckpoint(eager=True)
        )
        free_checkpoint(cur)
        cur = nxt
    final_deg = (
        cur.select(F.col("_a").alias("_n"))
        .unionAll(cur.select(F.col("_b").alias("_n")))
        .groupBy("_n")
        .agg(F.count("*").alias("_d"))
        .filter(F.col("_d") >= k)
    )
    return final_deg.select(
        F.col("_n").alias("node"), F.col("_d").cast("long").alias("degree")
    )


def sssp_rounds(
    edges: DataFrame,
    sources: DataFrame,
    src_col: str,
    dst_col: str,
    weight_col: str,
    node_col: str,
    rounds: int,
) -> DataFrame:
    """Bounded Bellman-Ford: minimum WEIGHTED distance from any node in
    ``sources`` to every node reachable within ``rounds`` edges, over a
    directed edge list with non-negative integer weights. Returns
    ``(node, dist)`` — exact BIGINT arithmetic, so cross-engine exact.

    The weighted twin of ``bfs_hops`` with the same frontier discipline:
    each round relaxes edges only out of nodes whose distance IMPROVED
    last round (frontier ⋈ edges, 1 exchange; then a min-merge against
    the accumulated distance map, 1 exchange). Relaxing from the frontier
    only is equivalent to full Bellman-Ford relaxation — a node that did
    not improve already propagated its distance the round it entered —
    but keeps round cost proportional to the improving wave, the same
    reason Pregel SSSP vote-to-halt beats naive BF at scale. ``rounds``
    is a small fixed constant by contract (the catalog entry unrolls 3),
    so lineage stays shallow without checkpoint barriers.

    At 100 TB: pre-partition ``edges`` by ``src`` once so every round's
    frontier join reuses the layout; state is O(reached) rows of
    (node, BIGINT).
    """
    if rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    e = edges.select(
        F.col(src_col).alias("_src"),
        F.col(dst_col).alias("_dst"),
        F.col(weight_col).cast("long").alias("_w"),
    ).localCheckpoint(eager=True)
    dist = (
        sources.select(F.col(node_col).alias("_node"))
        .distinct()
        .select("_node", F.lit(0).cast("long").alias("_dist"))
    )
    frontier = dist
    for _ in range(rounds):
        cand = (
            frontier.join(e, frontier["_node"] == e["_src"])
            .select(
                F.col("_dst").alias("_node"),
                (F.col("_dist") + F.col("_w")).alias("_dist"),
            )
            .groupBy("_node")
            .agg(F.min("_dist").alias("_dist"))
        )
        improved = (
            cand.join(
                dist.withColumnRenamed("_dist", "_old"), "_node", "left"
            )
            .where(F.col("_old").isNull() | (F.col("_dist") < F.col("_old")))
            .select("_node", "_dist")
        )
        dist = (
            dist.unionByName(cand)
            .groupBy("_node")
            .agg(F.min("_dist").alias("_dist"))
        )
        frontier = improved
    return dist.select(
        F.col("_node").alias("node"), F.col("_dist").alias("dist")
    )


def truss_peel_rounds(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    k: int,
    rounds: int,
) -> list[DataFrame]:
    """Bounded k-TRUSS peeling: ``rounds`` synchronous rounds of "drop
    every edge supported by fewer than k−2 triangles", recomputing
    per-edge triangle support each round over the canonicalized
    undirected edge list. Returns the edge frames for rounds 0..rounds
    (round 0 = the input, canonicalized), each ``localCheckpoint``-ed so
    callers can consume all of them without lineage blow-up — the
    trajectory IS the result for audit-style consumers.

    k-truss strictly refines k-core (``kcore_peel``): a (k)-truss edge
    needs k−2 common neighbours, not merely k−1 neighbours per endpoint
    — the standard cohesive-subgraph ladder. As with the other bounded
    iterators here, a FIXED round count keeps the operator
    oracle-replayable as chained CTEs and is an upper bound on the true
    truss (peeling is monotone), exact once a round removes nothing;
    production runs the identical round body under a driver-loop
    convergence probe.

    Scale shape per round: ONE support aggregation — edge ⋈ sym ⋈ sym
    on endpoint keys (the wedge-closing equi-join of
    ``triangle_count``, never an all-pairs product) — then an
    anti-join of under-supported edges. Superseded rounds stay
    checkpointed because the caller reads the whole trajectory;
    one-shot consumers should ``free_checkpoint`` all but the last.
    """
    if k < 3 or rounds < 1:
        raise ValueError(f"need k >= 3 and rounds >= 1, got k={k}, rounds={rounds}")
    a, b = F.col(src_col), F.col(dst_col)
    cur = (
        edges.select(F.least(a, b).alias("_a"), F.greatest(a, b).alias("_b"))
        .filter(F.col("_a") != F.col("_b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    out = [cur]
    for _ in range(rounds):
        sym = cur.select(
            F.col("_a").alias("_src"), F.col("_b").alias("_dst")
        ).unionAll(
            cur.select(F.col("_b").alias("_src"), F.col("_a").alias("_dst"))
        )
        sup = (
            cur.join(
                sym.select(
                    F.col("_src").alias("_ua"), F.col("_dst").alias("_wa")
                ),
                F.col("_a") == F.col("_ua"),
            )
            .join(
                sym.select(
                    F.col("_src").alias("_ub"), F.col("_dst").alias("_wb")
                ),
                (F.col("_b") == F.col("_ub"))
                & (F.col("_wa") == F.col("_wb")),
            )
            .groupBy("_a", "_b")
            .agg(F.count("*").alias("_tri"))
        )
        cur = (
            cur.join(sup, ["_a", "_b"], "left")
            .filter(F.coalesce(F.col("_tri"), F.lit(0)) >= k - 2)
            .select("_a", "_b")
            .localCheckpoint(eager=True)
        )
        out.append(cur)
    return out
