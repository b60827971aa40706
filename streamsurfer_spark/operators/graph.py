"""Connected components over candidate-pair graphs (dedup clustering).

No counterpart in the reference (/root/reference/main.go:1-312 — SURVEY
§2.2); engine-side capability: near-duplicate PAIRS (MinHash-LSH, cosine,
n-gram Jaccard — operators/dedup.py, operators/similarity.py) become
deduplication CLUSTERS by taking connected components of the pair graph,
labeling each document with its cluster's minimum id (the canonical
"keep the smallest id, drop the rest" curation rule).

Algorithm: min-label propagation to fixpoint — per iteration every node
takes the min label among itself and its neighbors. Each iteration is one
equi-join + one groupBy (both shuffle on the node id, so the partitioning
is reused); iterations = graph diameter. Labels decrease monotonically, so
convergence is detected by comparing sum(label) between iterations — a
1-row aggregate, no extra join.

Scale notes (100 TB): near-dup graphs are overwhelmingly tiny components
(pairs/triples), so diameter — and the iteration count — stays single-digit
even at trillions of edges. Each iteration persists its labels and
localCheckpoints every few rounds to truncate lineage (else the plan grows
per iteration). For adversarial long-chain graphs, swap the per-iteration
step for the large-star/small-star contraction (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) — same join primitives,
O(log n) rounds.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

CHECKPOINT_EVERY = 5


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node of the undirected pair graph with min(component).

    Returns (id, cluster_id). Raises if the graph has not converged after
    ``max_iter`` rounds (diameter larger than max_iter — see module doc for
    the log-rounds alternative).
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).union(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    labels = (
        sym.select(F.col("a").alias("id")).distinct().withColumn("lbl", F.col("id"))
    ).persist()
    prev_sum = labels.agg(F.sum("lbl")).collect()[0][0]

    for it in range(max_iter):
        # candidate labels: own label ∪ every neighbor's label, then min.
        nbr = sym.join(labels, sym["b"] == labels["id"]).select(
            F.col("a").alias("id"), F.col("lbl")
        )
        new_labels = (
            labels.select("id", "lbl")
            .union(nbr)
            .groupBy("id")
            .agg(F.min("lbl").alias("lbl"))
        ).persist()
        if (it + 1) % CHECKPOINT_EVERY == 0:
            new_labels = new_labels.localCheckpoint()
        cur_sum = new_labels.agg(F.sum("lbl")).collect()[0][0]
        labels.unpersist()
        labels = new_labels
        if cur_sum == prev_sum:  # labels are monotone non-increasing
            return labels.select("id", F.col("lbl").alias("cluster_id"))
        prev_sum = cur_sum

    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations"
    )
