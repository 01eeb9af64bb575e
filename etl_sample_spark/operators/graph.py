"""Iterative graph algorithms: fixed-point PageRank, two execution tiers.

Reference analog: none (the reference is a single-pass normalizer,
``Sample-Json-to-SQL-Full-Pipeline-EO-10-03-2019.py``); this is [EXT]
scale surface for graph-shaped analytics over fact tables.

Two tiers, one algorithm (integer fixed-point on a ``scale`` grid so the
result is bit-identical across engines, partition layouts, and summation
orders — floating-point PageRank is none of those):

- :func:`pagerank_fixed_point` — pure-Python power iteration for
  DIMENSION-SIZED graphs (nodes = a dimension table, edges <= |V|^2).
  The distributed-heavy step is extracting the edge list from the
  facts; once the graph is provably bounded (nation network: <= 25
  nodes, <= 625 edges), iterating driver-side over the bounded collect
  is the same discipline as IVF's Lloyd loop over n_centroids rows —
  and avoids 5 rounds of shuffle-stage overhead for a 600-row dataset.

- :func:`pagerank_distributed` — the join-agg power iteration for
  graphs that do NOT fit the driver (user-interaction graphs,
  entity-resolution components): each iteration is one equi-join of
  edges against ranks plus one map-side-combinable grouped sum, i.e.
  k shuffles for k iterations; at 100 TB pre-partition edges and ranks
  on the node key so iterations co-locate without re-shuffling. Tested
  equal to the driver tier on the same graph (tests/test_operators.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_fixed_point(
    edges: list[tuple[int, int]],
    nodes: list[int],
    iters: int = 5,
    scale: int = 10**12,
    damping_pct: int = 85,
) -> dict[int, int]:
    """Integer fixed-point PageRank over an in-memory edge list.

    Every update is integer multiply // divide on the ``scale`` grid, so
    the output is exactly the unrolled-CTE SQL twin's, term for term.
    Dangling mass (nodes with no out-edges) is dropped, matching the
    LEFT-JOIN-on-outdeg convention of the SQL oracle. Edges whose src
    (or dst) is not in ``nodes`` are IGNORED — the same inner-join-on-
    nodes semantics the distributed tier gets for free (r11 review: the
    pure tier used to raise KeyError on a stale edge list while the
    distributed tier silently dropped it; both now drop).
    """
    n = len(nodes)
    if n == 0:
        return {}
    node_set = set(nodes)
    edges = [(s, d) for s, d in edges if s in node_set and d in node_set]
    base = ((100 - damping_pct) * scale) // (100 * n)
    outdeg: dict[int, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank = {v: scale // n for v in nodes}
    for _ in range(iters):
        contrib: dict[int, int] = {}
        for s, d in edges:
            contrib[d] = contrib.get(d, 0) + (damping_pct * rank[s]) // (
                100 * outdeg[s]
            )
        rank = {v: base + contrib.get(v, 0) for v in nodes}
    return rank


def pagerank_distributed(
    edges: DataFrame,
    nodes: DataFrame,
    iters: int = 5,
    scale: int = 10**12,
    damping_pct: int = 85,
) -> DataFrame:
    """Distributed power iteration: ``edges(src, dst)`` x ``nodes(node)``
    -> ``(node, rank)`` on the integer ``scale`` grid.

    Pin (localCheckpoint/cache) ``edges`` before calling if it is
    derived from an expensive join — it feeds the outdeg aggregate plus
    every iteration's subtree.
    """
    n_nodes = nodes.count()  # bounded: one scalar per call
    if n_nodes == 0:
        # match pagerank_fixed_point's {} on the empty graph instead of
        # ZeroDivisionError (r11 review)
        return nodes.withColumn("rank", F.lit(0).cast("bigint")).limit(0)
    base = ((100 - damping_pct) * scale) // (100 * n_nodes)
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ranks = nodes.withColumn("rank", F.lit(scale // n_nodes).cast("bigint"))
    for _ in range(iters):
        contrib = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .join(outdeg, "src")
            .select(
                "dst",
                F.expr(f"({damping_pct} * rank) div (100 * deg)").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(contrib, nodes["node"] == contrib["dst"], "left").select(
            "node",
            (F.lit(base) + F.coalesce("s", F.lit(0))).cast("bigint").alias("rank"),
        )
    return ranks
