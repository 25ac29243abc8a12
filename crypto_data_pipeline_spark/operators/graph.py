"""Connected components over a pair/edge DataFrame — the step that
turns pairwise near-duplicate output (dedup.py's minhash / simhash /
n-gram Jaccard pairs) into transitive DEDUP CLUSTERS, so "keep one doc
per cluster" is a groupBy away. The reference has no graph operators
(its dedup is the UNIQUE-key upsert of sql/create_tables.sql:11,27);
this is part of the training-data extension surface.

Algorithm: iterative min-label propagation. Every vertex starts
labeled with itself; each round every vertex takes the min of its own
and its neighbors' labels; at the fixpoint every vertex holds the min vertex id
of its component. Spark shape per round: one equi-join of the
(symmetrized) edge list against the label table plus one groupBy-min —
both shuffle on vertex id, so AQE reuses the same hash partitioning
round to round. Rounds needed = graph diameter, and near-dup clusters
are dense blobs with tiny diameter (2-4), so the loop runs ~3 joins in
practice. ``localCheckpoint`` truncates the lineage each round —
without it the plan doubles every iteration and the driver, not the
data, becomes the bottleneck. For adversarial long-chain graphs at
scale, the alternating small-star/large-star formulation (Kiveris et
al., "Connected Components in MapReduce") converges in O(log d)
rounds; min-label is the right default for dedup-shaped graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame, src: str, dst: str, max_iter: int = 25
) -> DataFrame:
    """(src, dst) undirected edge pairs → (v, component) where
    ``component`` is the minimum vertex id of v's connected component.
    Vertices are those appearing in at least one edge; isolated rows
    never enter the edge list, so attach them afterward if needed.

    Converges when a full round changes no label. Each round runs
    exactly ONE job: the new label table is marked for a lazy
    ``localCheckpoint`` and the changed-label count is aggregated over
    it — that single action both materializes the checkpoint and
    returns the convergence scalar (previously checkpoint + label-sum
    were two separate jobs per round). Raises if ``max_iter`` rounds
    aren't enough, rather than silently returning half-merged clusters.
    """
    sym = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).union(
        edges.select(F.col(dst).alias("s"), F.col(src).alias("d"))
    )
    sym = sym.distinct().localCheckpoint()
    labels = sym.select(F.col("s").alias("v")).distinct().withColumn("lbl", F.col("v"))

    for _ in range(max_iter):
        msgs = sym.join(labels, sym.s == labels.v).select(
            F.col("d").alias("v"), F.col("lbl"), F.lit(None).cast("long").alias("old")
        )
        mine = labels.select("v", "lbl", F.col("lbl").alias("old"))
        # min(old) recovers each vertex's previous label (msgs carry
        # null old); lbl < old marks a change — no second join needed.
        labels = (
            mine.unionByName(msgs)
            .groupBy("v")
            .agg(F.min("lbl").alias("lbl"), F.min("old").alias("old"))
            .withColumn("chg", (F.col("lbl") < F.col("old")).cast("long"))
            .localCheckpoint(eager=False)
        )
        n_changed = labels.agg(F.sum("chg")).collect()[0][0]
        labels = labels.select("v", "lbl")
        if n_changed == 0:
            return labels.select("v", F.col("lbl").alias("component"))
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
