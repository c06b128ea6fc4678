"""Distributed connected components (transitive dedup clusters).

Near-duplicate detection (``operators.dedup``) emits PAIRS; corpus
dedup needs CLUSTERS — if A~B and B~C, one representative should
survive for {A, B, C} even when A~C was never emitted. That is
connected components over the similarity graph.

Implementation: iterative min-label propagation expressed as DataFrame
joins — the dataflow-native baseline that large-star/small-star methods
(Kiveris et al., "Connected components in MapReduce and beyond", SoCC
2014) optimize. Every node starts labeled with itself; each round, a
node adopts the minimum label among itself and its neighbors;
convergence in O(graph diameter) rounds. Near-dup graphs have tiny
diameters (clusters are quasi-cliques), so a handful of rounds
suffices.

Scale mechanics this encodes:

- each round is one join + one aggregation, both shuffling on the node
  key — the per-round cost is bounded and AQE-balanced;
- ``localCheckpoint`` after every round TRUNCATES LINEAGE: without it,
  iteration k's plan contains k nested joins and the driver's
  optimizer/DAG work grows quadratically (the classic iterative-
  algorithm failure mode);
- convergence is detected with a count of changed labels (one action
  per round — unavoidable for a data-dependent loop);
- labels are node ids, so the final representative per cluster is the
  minimum node id — deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 25,
    out_node: str = "node",
    out_label: str = "component",
) -> DataFrame:
    """Label every node of the undirected graph ``edges`` with the
    minimum node id of its connected component.

    Returns ``(node, component)`` for every node that appears in an
    edge. Raises if the loop hits ``max_iter`` without converging
    (diameter larger than expected — for similarity graphs that means
    the threshold is too loose, not that more iterations are needed).
    """
    sym = edges.select(
        F.col(src).alias("s"), F.col(dst).alias("d")
    ).union(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
    sym = sym.distinct().localCheckpoint(eager=False)

    labels = (
        sym.select(F.col("s").alias("n"))
        .distinct()
        .withColumn("lbl", F.col("n"))
        .localCheckpoint(eager=False)
    )

    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["d"] == labels["n"])
            .groupBy("s")
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        # Change detection rides along in the update join (a label only
        # ever decreases, so "changed" == "a neighbor label was
        # smaller") — the old separate new-vs-old self-join cost one
        # extra shuffle join per round for information the update
        # already had.
        new_labels = (
            labels.join(nbr_min, labels["n"] == nbr_min["s"], "left")
            .select(
                F.col("n"),
                F.least(
                    F.col("lbl"), F.coalesce(F.col("nbr_lbl"), F.col("lbl"))
                ).alias("lbl"),
                F.coalesce(
                    F.col("nbr_lbl") < F.col("lbl"), F.lit(False)
                ).alias("__chg"),
            )
            .localCheckpoint(eager=False)  # truncate per-round lineage
        )
        # Existence check, not a count: isEmpty stops at the first
        # changed row instead of scanning every partition.
        converged = new_labels.filter(F.col("__chg")).isEmpty()
        labels = new_labels.drop("__chg")
        if converged:
            return labels.select(
                F.col("n").alias(out_node), F.col("lbl").alias(out_label)
            )
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )
