"""Iterative connected components (label propagation) — the dedup
cluster closure.

Pairwise dedup (exact digests, MinHash/SimHash candidates, cosine
pairs) yields EDGES; what a pipeline keeps is one survivor per
CLUSTER, i.e. per connected component of the pair graph — a transitive
closure no single join computes. This is the engine's one genuinely
iterative operator: small-step min-label propagation driven by a
driver-side loop (the standard Pregel-without-Pregel shape).

Scale notes: each iteration is one join + one aggregation, all
DataFrame ops — rows never come to the driver except the single
`isEmpty` convergence probe. Iteration count is bounded by component
DIAMETER (dup clusters are near-cliques: a handful of rounds), not
component size. ``localCheckpoint`` truncates the growing lineage so
iteration i+1 does not replan/re-execute iterations 1..i.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    a: str = "a",
    b: str = "b",
    max_iter: int = 20,
    with_rounds: bool = False,
) -> DataFrame:
    """(a,b) undirected edges → (node, component) with component = the
    minimum node id reachable from ``node``. Deterministic by
    construction (min is order-free).

    ``with_rounds=True`` appends a constant ``rounds_to_fixpoint``
    column — the number of propagation rounds executed before the
    convergence probe came back empty — so the bounded-iteration
    contract is SELF-DESCRIBING at larger scale factors (r11 verdict
    item 7): a caller watching that number approach ``max_iter`` knows
    the component diameter is outgrowing the bound long before the
    loud RuntimeError fires. Registry queries keep the default (their
    oracle-pinned schemas must not change); diagnostics and tests opt
    in."""
    sym = (
        edges.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .unionAll(edges.select(F.col(b).alias("src"), F.col(a).alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    converged = False
    rounds = 0
    try:
        for rounds in range(1, max_iter + 1):
            neighbor_min = (
                sym.join(labels, sym.dst == labels.node)
                .groupBy("src")
                .agg(F.min("component").alias("nbr_component"))
            )
            updated = (
                labels.join(
                    neighbor_min, labels.node == neighbor_min.src, "left"
                )
                .select(
                    "node",
                    F.least(
                        F.col("component"),
                        F.coalesce(F.col("nbr_component"), F.col("component")),
                    ).alias("component"),
                    (
                        F.coalesce(F.col("nbr_component"), F.col("component"))
                        < F.col("component")
                    ).alias("changed"),
                )
                .localCheckpoint()  # truncate lineage each round
            )
            converged = updated.where(F.col("changed")).isEmpty()
            labels = updated.drop("changed")
            if converged:
                break
        if not converged:
            # Partially-propagated labels would silently split one real
            # cluster into several — downstream dedup would keep extra
            # "survivors". Fail loud instead.
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} "
                "iterations (component diameter exceeds max_iter); "
                "raise max_iter"
            )
        if with_rounds:
            labels = labels.withColumn(
                "rounds_to_fixpoint", F.lit(rounds).cast("int")
            )
        return labels
    finally:
        sym.unpersist()
