"""Connected components over near-dup pairs (north-star X1/X2 extension).

Near-dup detection emits PAIRS; dedup needs CLUSTERS (keep one doc per
component, drop the rest). The bridge is connected components: label every
doc with the minimum doc_id reachable through the pair graph.

Spark-first shape: Pregel-style min-label propagation as a driver-bounded
loop of DataFrame joins — each iteration is one shuffle join of the label
frame against the (symmetrized) edge list plus a min-agg, label frames are
localCheckpoint()ed to cut lineage, and the loop exits when an iteration
changes no label (one scalar count per iteration; the data never leaves the
cluster). Iterations needed = graph diameter, and near-dup components are
shallow (dup clusters are cliques or near-cliques from banding, diameter
≤ ~3), so the loop runs 2-4 rounds in practice. For adversarially deep
graphs the same loop admits the large-star/small-star optimization
(Kiveris et al., "Connected Components in MapReduce"), which is the
documented 100 TB path; GraphFrames' run is the same pattern packaged.

No reference citation: the reference dedups only by exact file_id match
(extract_and_embed.py:85-131); components are the driver-mandated
LLM-pipeline extension (BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ITERATIONS = 20


def connected_components(
    pairs: DataFrame, a_col: str = "id_a", b_col: str = "id_b"
) -> DataFrame:
    """Resolve undirected pairs to components.

    Returns (doc_id, component_id) for every node appearing in `pairs`,
    where component_id is the minimum doc_id in the node's component.
    Deterministic fixpoint — engine-portable, so oracle-checkable against
    a recursive-CTE transitive closure.
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
    )
    # sticky labels: start every node at itself
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(MAX_ITERATIONS):
        neighbor_min = (
            edges.join(labels, on=edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, on=labels.node == neighbor_min.src, how="left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("component_id"))
