"""Iterative graph operators for dedup post-processing: near-duplicate
PAIRS (from ``dedup.ngram_jaccard_pairs`` / ``minhash_lsh_pairs``) only
say "a ~ b"; producing one representative per duplicate GROUP needs the
transitive closure — connected components.

Implementation: two-mode, sized to the graph.

- Distributed (the 100 TB path): minimum-label propagation. Every node
  starts labeled with its own id; each round a node takes the min label
  among itself and its neighbors; fixpoint = every node carries the min
  id of its component. Rounds needed = graph diameter, and near-dup
  clusters are shallow (a handful of hops), so convergence is fast.
  Each round is ONE shuffle (join on dst + groupBy src) over the edge
  list — the textbook iterative-Spark shape. Label state is
  localCheckpoint'd per round to truncate lineage (swap for
  ``persist(DISK_ONLY)``/checkpoint on a real cluster). The driver sees
  only a 1-row convergence probe per round, never the data. For
  web-scale graphs with deep diameters, swap the propagation loop for
  the large-star/small-star algorithm (Kiveris et al., "Connected
  Components in MapReduce and Beyond") — same Spark primitives, O(log²)
  rounds; the per-round plan here is deliberately identical to that
  paper's building block.

- Local tail solve: when the (deduplicated) edge list fits comfortably
  on the driver, iterating Spark jobs is pure scheduling overhead — a
  near-dup pair graph of a few thousand edges costs 3-6 s of empty-task
  rounds for microseconds of actual work. Below ``local_threshold``
  edges the operator collects ONCE and runs union-find (O(E·α)), then
  parallelizes (node, component) back. This is the same move the
  MapReduce-CC literature makes ("finish the contracted graph locally");
  the threshold bounds driver memory explicitly (2M edges ≈ 32 MB of
  longs). Set ``local_threshold=0`` to force the distributed path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _local_components(edge_rows: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Union-find over a collected edge list → (node, min-id component).
    Path-halving + union-by-lower-root keeps the min id at the root, so
    labels match the distributed fixpoint exactly."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in edge_rows:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # lower id becomes the root → root IS the component min
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    return [(n, find(n)) for n in parent]


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    local_threshold: int = 2_000_000,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``, where
    ``component`` is the minimum node id of its connected component —
    deterministic, so results are oracle-checkable, and identical from
    both execution modes (pinned in tests).

    Raises if the distributed propagation hasn't converged after
    ``max_iter`` rounds (a correctness guard: an unconverged labeling
    silently splits components).
    """
    fwd = pairs.select(
        F.col(id_a).cast("long").alias("src"), F.col(id_b).cast("long").alias("dst")
    )
    edges = (
        fwd.unionByName(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # one count off the materialized checkpoint decides the mode; it is
    # not wasted on the distributed path (it also primes the checkpoint
    # every round reuses)
    n_edges = edges.count()
    spark = edges.sparkSession

    if n_edges <= local_threshold:
        # both (a,b) and (b,a) are present; union-find needs each edge once
        rows = edges.filter(F.col("src") < F.col("dst")).collect()
        comp = _local_components([(r["src"], r["dst"]) for r in rows])
        return spark.createDataFrame(comp, "node long, component long")

    labels = edges.select("src").distinct().withColumn("component", F.col("src"))
    # convergence probe: labels only DECREASE under min-propagation and
    # the node set is fixed, so Σcomponent strictly decreases until the
    # fixpoint — comparing two scalar sums replaces the naive
    # new-vs-old join (an extra shuffle per round). decimal(38,0) sum:
    # overflow-proof for any realistic node count × id magnitude.
    def _label_sum(lb: DataFrame) -> int:
        return lb.agg(
            F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
        ).first()[0]

    prev_sum = _label_sum(labels)
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
        labels = (
            nbr.unionByName(labels)
            .groupBy("src")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=False)
        )
        new_sum = _label_sum(labels)
        if new_sum == prev_sum:
            return labels.select(
                F.col("src").alias("node"), F.col("component")
            )
        prev_sum = new_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "raise max_iter (diameter exceeds it) before trusting the labels"
    )
