"""Iterative graph operators: convergence-mode PageRank over an edge
list.

The query layer (plans/queries_graph.py) pins a 2-iteration unrolled
PageRank to a DuckDB oracle; this module is the PRODUCTION form of the
same computation — iterate until the rank vector stops moving instead
of a fixed unroll. Per iteration: one equi-join of the (node, rank)
vector to the normalized edge list on ``src`` and one re-aggregation on
``dst`` — the sparse matrix-vector product expressed relationally, with
only rank tuples shuffling after the transition matrix is built once.

Scale discipline (100 TB graphs):
* the normalized transition list is persisted ONCE — every iteration
  reuses its shuffle instead of re-scanning the fact table;
* ``checkpoint_every=k`` truncates the rank vector's lineage with an
  eager ``localCheckpoint`` every k iterations — without it, iteration
  N's plan nests N joins deep, the DAG grows quadratically, and the
  scheduler (not the data) becomes the bottleneck somewhere around
  iteration 15-20 (on a cluster, prefer ``spark.sparkContext.
  setCheckpointDir`` + ``checkpoint()`` to survive executor loss;
  localCheckpoint trades that durability for speed);
* the convergence test is one tiny action per iteration (a full-outer
  join of two (node, rank) vectors reduced to a single L1 scalar) —
  the driver sees one double per round, never the vector.

The reference has no graph surface (extension brief); the edge-list
join+reaggregate shape follows the standard formulation (Page et al.,
"The PageRank Citation Ranking", 1999; Malewicz et al., Pregel,
SIGMOD'10 — here without vertex programs, as plain relational algebra).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_until(
    edges: DataFrame,
    *,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iters: int = 40,
    checkpoint_every: int = 5,
) -> tuple[DataFrame, int, float]:
    """Power-iteration PageRank over a weighted directed edge list
    ``(src, dst, w)``, iterating UNTIL the L1 movement of the rank
    vector drops below ``tol`` (or ``max_iters`` is hit).

    Node universe = nodes with out-edges (matches the query-layer
    oracle's convention; for graphs with dangling nodes, add reverse
    edges or redistribute dangling mass before calling).

    Returns ``(ranks, n_iters, final_delta)`` where ``ranks`` is a
    persisted (node, rank) DataFrame, ``n_iters`` the iterations run,
    and ``final_delta`` the last L1 movement (< tol unless max_iters
    stopped the loop first).
    """
    outw = edges.groupBy("src").agg(F.sum("w").alias("wtot"))
    trans = (
        edges.join(outw, "src")
        .select("src", "dst", (F.col("w") / F.col("wtot")).alias("tw"))
        .persist()
    )
    n = outw.count()
    if n == 0:
        raise ValueError("pagerank_until: edge list is empty")
    teleport = (1.0 - damping) / n

    rank = outw.select(
        F.col("src").alias("node"), F.lit(1.0 / n).alias("r")
    ).localCheckpoint(eager=True)

    n_iters = 0
    delta = float("inf")
    for i in range(1, max_iters + 1):
        new_rank = (
            trans.join(rank, trans.src == rank.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(
                (F.lit(teleport) + damping * F.sum(F.col("r") * F.col("tw")))
                .alias("r")
            )
        )
        # Lineage truncation cadence: an eager localCheckpoint every k
        # iterations; in between, the un-truncated plan is at most k
        # joins deep. The checkpoint also materializes new_rank for the
        # delta action below, so convergence testing costs no extra
        # pass on checkpoint iterations.
        if i % checkpoint_every == 0:
            new_rank = new_rank.localCheckpoint(eager=True)
        delta = (
            new_rank.alias("a")
            .join(rank.alias("b"), "node", "full_outer")
            .agg(
                F.sum(
                    F.abs(
                        F.coalesce(F.col("a.r"), F.lit(0.0))
                        - F.coalesce(F.col("b.r"), F.lit(0.0))
                    )
                ).alias("d")
            )
            .first()["d"]
        )
        rank = new_rank
        n_iters = i
        if delta < tol:
            break
    # Eager checkpoint (not a lazy persist): materializes the final
    # vector BEFORE the transition matrix is released below, so later
    # actions on the returned ranks never re-derive the unpersisted
    # lineage.
    rank = rank.localCheckpoint(eager=True)
    trans.unpersist()
    return rank, n_iters, float(delta)
