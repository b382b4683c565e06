"""Graph analytics over the materialized KG.

Reference behaviors:
* degree centrality — nx.degree_centrality top-n
  (get_kg_query_params.py:16-25): degree / (V-1);
* eigenvector centrality — nx.eigenvector_centrality with tolerance
  escalation ×10 on convergence failure (calculate_network_change.py:22-31);
  rebuilt as power iteration over the edge DataFrame (join + groupBy per
  step, localCheckpoint to cut lineage);
* centrality delta — (after-before)/(before+1) per node over a full
  outer join (calculate_network_change.py:17-54);
* key-triple scoring — score(edge) = gain(head)+gain(tail), top-k
  (calculate_network_change.py:81-133).

The graph is treated as undirected and unlabeled, exactly like the
reference building nx.Graph from the first two edge columns
(get_kg_query_params.py:28-33, predict_kg.py:205-212).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _sym(edges: DataFrame, src: str = "head_id",
         dst: str = "tail_id") -> DataFrame:
    """Undirected view: both directions, self-loop-free, distinct
    neighbor pairs (nx.Graph semantics: parallel edges collapse)."""
    a = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    b = edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    return a.union(b).filter(F.col("u") != F.col("v")).distinct()


def degree_centrality(edges: DataFrame, src: str = "head_id",
                      dst: str = "tail_id") -> DataFrame:
    """(node, degree, centrality_micro): degree/(V-1) scaled to integer
    micro-units for cross-engine comparison.

    One pass over the edge table: the degree aggregate is materialized
    once (localCheckpoint — node-count sized) and the node count V is
    its row count, instead of a second distinct-count action that
    recomputed the symmetrized edge set from scratch (guide §2.4:
    the two actions shared no work; this halves the edge scans)."""
    sym = _sym(edges, src, dst)
    deg = (sym.groupBy(F.col("u").alias("node"))
           .agg(F.count("*").alias("degree"))
           .localCheckpoint())
    n_nodes = deg.count()  # == count(distinct u): deg has one row per node
    return deg.withColumn(
        "centrality_micro",
        F.floor(F.col("degree") * 1_000_000 / F.lit(max(n_nodes - 1, 1)))
        .cast("long"))


def eigenvector_centrality(edges: DataFrame, max_iter: int = 30,
                           tol: float = 1e-6,
                           src: str = "head_id",
                           dst: str = "tail_id",
                           checkpoint_every: int = 5,
                           driver_fastpath_edges: int = 1_000_000
                           ) -> DataFrame:
    """Power iteration; mirrors the reference's tolerance-escalation loop
    (calculate_network_change.py:22-31) by relaxing tol ×10 if the
    iteration fails to converge within max_iter.

    **Driver fast path** (graphs whose symmetric edge list is ≤
    ``driver_fastpath_edges``): collect the edge list once and iterate
    in numpy — the same formula, norm, convergence bound, and
    escalation schedule, without paying one scheduled Spark job per
    iteration (~0.3s × up to 90 iterations of pure latency on a small
    graph). Same design precedent as canon.cluster_entities: work that
    does not grow with the corpus runs where latency is lowest. Pass
    ``driver_fastpath_edges=0`` to force the distributed path.

    **Distributed path**: ONE driver action per iteration (VERDICT r1
    #7) — the norm and the convergence delta come from a single fused
    aggregate — s2 = Σ raw², dot = Σ raw·prev — because prev is
    unit-norm, so ‖x_new − x_prev‖₂ = √(2 − 2·dot/√s2). Convergence
    uses the L2 bound √n·‖Δ‖₂ < n·tol (nx checks L1 < n·tol; L1 ≤
    √n·L2, so this is the conservative side of the same criterion).
    Lineage (and carried join statistics) is cut by a stats_barrier
    every ``checkpoint_every`` rounds — 1 job/iter + 1 every k, down
    from 3/iter."""
    from ..session import stats_barrier

    # stats_barrier, not bare localCheckpoint: the iteration joins the
    # score frame against sym and itself, so carried origin statistics
    # (potentially already huge if `edges` came out of the CC stage)
    # would compound every round — see stats_barrier docstring.
    sym = stats_barrier(_sym(edges, src, dst))
    nodes = stats_barrier(sym.select(F.col("u").alias("node")).distinct())
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("score", F.lit(0.0))

    if driver_fastpath_edges:
        n_sym = sym.count()
        if n_sym <= driver_fastpath_edges:
            return _eigenvector_driver(edges.sparkSession, sym, n,
                                       max_iter, tol)

    x = nodes.withColumn("score", F.lit(1.0 / n ** 0.5))
    current_tol = tol
    it_total = 0
    for attempt in range(3):  # tolerance escalation ×10 per attempt
        for _ in range(max_iter):
            msgs = (sym.join(x, sym.v == x.node)
                    .groupBy("u").agg(F.sum("score").alias("raw")))
            nxt = (nodes.join(msgs, nodes.node == msgs.u, "left")
                   .select("node", F.coalesce("raw", F.lit(0.0)).alias("raw")))
            row = (nxt.join(x.select("node",
                                     F.col("score").alias("prev")), "node")
                   .agg(F.sum(F.col("raw") ** 2).alias("s2"),
                        F.sum(F.col("raw") * F.col("prev")).alias("dot"))
                   .collect()[0])
            s2 = row["s2"] or 0.0
            if s2 == 0.0:
                return x
            norm = s2 ** 0.5
            cos = min(1.0, max(-1.0, (row["dot"] or 0.0) / norm))
            x = nxt.select("node", (F.col("raw") / norm).alias("score"))
            it_total += 1
            if it_total % checkpoint_every == 0:
                x = stats_barrier(x)
            delta_l2 = max(0.0, 2.0 - 2.0 * cos) ** 0.5
            if delta_l2 * n ** 0.5 < n * current_tol:
                return x
        current_tol *= 10
    return x


def _eigenvector_driver(spark, sym: DataFrame, n: int,
                        max_iter: int, tol: float) -> DataFrame:
    """numpy twin of the distributed loop: identical update, norm,
    L2 convergence bound, and ×10 tolerance escalation. Validated
    against the pinned integer oracle (entry `eigenvector_centrality`)
    and the two-component pytest."""
    import numpy as np
    import pandas as pd

    rows = sym.collect()
    node_ids = sorted({r["u"] for r in rows})
    idx = {v: i for i, v in enumerate(node_ids)}
    u = np.fromiter((idx[r["u"]] for r in rows), dtype=np.int64,
                    count=len(rows))
    v = np.fromiter((idx[r["v"]] for r in rows), dtype=np.int64,
                    count=len(rows))

    x = np.full(n, 1.0 / n ** 0.5)
    current_tol = tol
    for _attempt in range(3):
        for _ in range(max_iter):
            raw = np.bincount(u, weights=x[v], minlength=n)
            s2 = float(raw @ raw)
            if s2 == 0.0:
                break
            norm = s2 ** 0.5
            cos = min(1.0, max(-1.0, float(raw @ x) / norm))
            x = raw / norm
            delta_l2 = max(0.0, 2.0 - 2.0 * cos) ** 0.5
            if delta_l2 * n ** 0.5 < n * current_tol:
                return spark.createDataFrame(
                    pd.DataFrame({"node": node_ids, "score": x}))
        else:
            current_tol *= 10
            continue
        break
    return spark.createDataFrame(pd.DataFrame({"node": node_ids,
                                               "score": x}))


def centrality_delta(before: DataFrame, after: DataFrame,
                     key: str = "node", val: str = "score") -> DataFrame:
    """(after-before)/(before+1) per node (generate_node_changes,
    calculate_network_change.py:46-54); missing nodes count as 0."""
    b = before.select(F.col(key), F.col(val).alias("_b"))
    a = after.select(F.col(key), F.col(val).alias("_a"))
    return (b.join(a, key, "outer")
            .select(key,
                    ((F.coalesce("_a", F.lit(0.0)) - F.coalesce("_b", F.lit(0.0)))
                     / (F.coalesce("_b", F.lit(0.0)) + 1.0)).alias("gain")))


def top_triples_by_gain(edges: DataFrame, gains: DataFrame,
                        k: int = 25) -> DataFrame:
    """score(edge) = gain(head) + gain(tail); top-k desc
    (get_top_triples, calculate_network_change.py:81-133)."""
    gh = gains.select(F.col("node").alias("head_id"),
                      F.col("gain").alias("_gh"))
    gt = gains.select(F.col("node").alias("tail_id"),
                      F.col("gain").alias("_gt"))
    return (edges.join(F.broadcast(gh), "head_id")
            .join(F.broadcast(gt), "tail_id")
            .withColumn("score", F.col("_gh") + F.col("_gt"))
            .orderBy(F.desc("score"), F.asc("head_id"), F.asc("tail_id"))
            .limit(k)
            .select("head_id", "tail_id", "rel_id", "score"))


def pagerank(edges: DataFrame, damping: float = 0.85,
             max_iter: int = 50, tol: float = 1e-8,
             src: str = "head_id", dst: str = "tail_id",
             checkpoint_every: int = 5,
             driver_fastpath_edges: int = 1_000_000) -> DataFrame:
    """Directed PageRank over the KG edge table → (node, score).

    Beyond the reference's centrality pair (degree/eigenvector,
    get_kg_query_params.py:16-25, calculate_network_change.py:22-31):
    the standard entity-importance ranking for a directed KG.
    Semantics follow networkx ``pagerank`` on a DiGraph: parallel
    edges collapse, self-loops retained, uniform 1/outdeg transition
    weights, dangling-node mass redistributed uniformly, L1
    convergence ``Σ|Δ| < n·tol``; scores sum to 1.

    **Driver fast path** (bounded graphs — the canonical KG's node set
    is dictionary-bounded): one collect of the distinct edge list,
    numpy iteration. **Distributed path** (``driver_fastpath_edges=0``
    to force): ONE action per iteration — the L1 delta and the NEXT
    iteration's dangling mass come from a single fused aggregate; the
    only shuffle per round is the keyed groupBy(dst) of contributions;
    ``stats_barrier`` every ``checkpoint_every`` rounds cuts the
    self-join lineage exactly like eigenvector_centrality above.
    """
    from ..session import stats_barrier

    e = stats_barrier(edges.select(F.col(src).alias("u"),
                                   F.col(dst).alias("v")).distinct())
    nodes = (e.select(F.col("u").alias("node"))
             .union(e.select(F.col("v").alias("node"))).distinct())
    outdeg = e.groupBy(F.col("u").alias("node")) \
        .agg(F.count("*").alias("outdeg"))
    # (node, outdeg|null) — null marks a dangling node
    base = stats_barrier(nodes.join(outdeg, "node", "left"))
    n = base.count()
    if n == 0:
        return base.select("node", F.lit(0.0).alias("score"))

    if driver_fastpath_edges and e.count() <= driver_fastpath_edges:
        return _pagerank_driver(edges.sparkSession, e, n,
                                damping, max_iter, tol)

    x = base.withColumn("score", F.lit(1.0 / n))
    dangling = (x.filter(F.col("outdeg").isNull())
                .agg(F.sum("score")).collect()[0][0]) or 0.0
    for it in range(max_iter):
        w = (x.filter(F.col("outdeg").isNotNull())
             .select(F.col("node").alias("u"),
                     (F.col("score") / F.col("outdeg")).alias("w")))
        msgs = (e.join(w, "u").groupBy(F.col("v").alias("node"))
                .agg(F.sum("w").alias("msg")))
        nxt = (x.join(msgs, "node", "left")
               .withColumn("new_score",
                           F.lit((1.0 - damping) / n)
                           + damping * (F.coalesce("msg", F.lit(0.0))
                                        + F.lit(dangling / n))))
        row = (nxt.agg(
            F.sum(F.abs(F.col("new_score") - F.col("score"))).alias("l1"),
            F.sum(F.when(F.col("outdeg").isNull(),
                         F.col("new_score"))).alias("dang"))
            .collect()[0])
        x = nxt.select("node", "outdeg", F.col("new_score").alias("score"))
        if (it + 1) % checkpoint_every == 0:
            x = stats_barrier(x)
        dangling = row["dang"] or 0.0
        if row["l1"] < n * tol:
            break
    return x.select("node", "score")


def _pagerank_driver(spark, e: DataFrame, n: int, damping: float,
                     max_iter: int, tol: float) -> DataFrame:
    """numpy twin of the distributed loop: identical update order,
    dangling redistribution, and L1 stop rule."""
    import numpy as np
    import pandas as pd

    rows = e.collect()
    node_ids = sorted({r["u"] for r in rows} | {r["v"] for r in rows})
    idx = {v: i for i, v in enumerate(node_ids)}
    u = np.fromiter((idx[r["u"]] for r in rows), dtype=np.int64,
                    count=len(rows))
    v = np.fromiter((idx[r["v"]] for r in rows), dtype=np.int64,
                    count=len(rows))
    outdeg = np.bincount(u, minlength=n).astype(np.float64)
    dangling_mask = outdeg == 0.0

    x = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        w = np.where(dangling_mask, 0.0, x / np.where(outdeg == 0.0,
                                                      1.0, outdeg))
        msgs = np.bincount(v, weights=w[u], minlength=n)
        dangling = float(x[dangling_mask].sum())
        nxt = (1.0 - damping) / n + damping * (msgs + dangling / n)
        l1 = float(np.abs(nxt - x).sum())
        x = nxt
        if l1 < n * tol:
            break
    return spark.createDataFrame(pd.DataFrame({"node": node_ids,
                                               "score": x}))


def k_hop(edges: DataFrame, seeds: DataFrame, k: int,
          direction: str = "both", src: str = "head_id",
          dst: str = "tail_id") -> DataFrame:
    """K-hop neighborhood extraction → (node, hops) with hops = the
    MINIMUM distance from any seed (0 for the seeds themselves,
    whether or not they appear in the edge table).

    The subgraph-extraction primitive for KG question answering
    (restrict a query to the k-neighborhood of its seed entities)
    that the reference delegates to in-memory networkx traversals.
    Frontier BFS: each round expands only the newest frontier through
    one keyed equi-join + distinct, anti-joins away already-visited
    nodes, and cuts lineage with ``stats_barrier`` — k rounds total,
    never an all-pairs expansion. ``direction``: ``out`` follows
    src→dst, ``in`` follows dst→src, ``both`` treats edges as
    undirected.
    """
    from ..session import stats_barrier

    if direction not in ("out", "in", "both"):
        raise ValueError(f"direction must be out|in|both, got {direction}")
    fwd = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    rev = edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    adj = {"out": fwd, "in": rev, "both": fwd.union(rev)}[direction]
    adj = stats_barrier(adj.filter(F.col("u") != F.col("v")).distinct())

    seed_col = seeds.columns[0]
    visited = seeds.select(F.col(seed_col).alias("node")).distinct() \
        .withColumn("hops", F.lit(0))
    frontier = visited.select("node")
    for depth in range(1, k + 1):
        nxt = (adj.join(frontier.withColumnRenamed("node", "u"), "u")
               .select(F.col("v").alias("node")).distinct()
               .join(visited.select("node"), "node", "left_anti"))
        frontier = stats_barrier(nxt)
        if frontier.isEmpty():
            break
        visited = stats_barrier(
            visited.unionByName(
                frontier.withColumn("hops", F.lit(depth))))
    return visited
