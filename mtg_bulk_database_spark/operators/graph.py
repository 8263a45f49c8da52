"""Iterative graph operators for dedup post-processing: near-duplicate
PAIRS (from ``dedup.ngram_jaccard_pairs`` / ``minhash_lsh_pairs``) only
say "a ~ b"; producing one representative per duplicate GROUP needs the
transitive closure — connected components.

Implementation: minimum-label propagation. Every node starts labeled
with its own id; each round a node takes the min label among itself and
its neighbors; fixpoint = every node carries the min id of its
component. Rounds needed = graph diameter, and near-dup clusters are
shallow (a handful of hops), so convergence is fast in practice.

Scale notes (100 TB): each round is ONE shuffle (join on dst +
groupBy src) over the edge list — the textbook iterative-Spark shape.
Label state is localCheckpoint'd per round to truncate lineage (swap for
``persist(DISK_ONLY)``/checkpoint on a real cluster). The driver sees
only a 1-row convergence probe per round, never the data. For
web-scale graphs with deep diameters, swap the propagation loop for the
large-star/small-star algorithm (Kiveris et al., "Connected Components
in MapReduce and Beyond") — same Spark primitives, O(log²) rounds; the
per-round plan here is deliberately identical to that paper's building
block.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``, where
    ``component`` is the minimum node id of its connected component —
    deterministic, so results are oracle-checkable.

    Raises if the propagation hasn't converged after ``max_iter`` rounds
    (a correctness guard: an unconverged labeling silently splits
    components).
    """
    fwd = pairs.select(
        F.col(id_a).cast("long").alias("src"), F.col(id_b).cast("long").alias("dst")
    )
    edges = (
        fwd.unionByName(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = edges.select("src").distinct().withColumn("component", F.col("src"))
    for _ in range(max_iter):
        # neighbor labels: edge (src,dst) contributes dst's current label
        # to src; union with own label, keep the min per node
        nbr = (
            edges.join(
                labels.select(
                    F.col("src").alias("dst"), F.col("component")
                ),
                on="dst",
            ).select("src", "component")
        )
        new_labels = (
            nbr.unionByName(labels)
            .groupBy("src")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=False)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="src")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select(
                F.col("src").alias("node"), F.col("component")
            )
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "raise max_iter (diameter exceeds it) before trusting the labels"
    )
