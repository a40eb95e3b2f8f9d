"""Iterative graph analytics as unrolled relational plans (north-star ext).

pagerank_bipartite runs PageRank (Brin & Page 1998, damping 0.85) on the
bipartite user <-> event-type interaction graph, with a FIXED number of
iterations (3) unrolled into the plan. Unrolling is the honest way to make
an iterative algorithm oracle-checkable: both engines evaluate the exact
same finite dataflow, so every intermediate rank is comparable — unlike a
converge-until-epsilon loop whose trip count could differ per engine.
The open-ended variant of iterate-to-fixpoint already exists in the repo as
the large-star/small-star connected-components operator
(operators/components.py), which is the right tool when the iteration count
is data-dependent.

Scale posture (100 TB): each iteration is one join edges⋈ranks on src
(ranks is |nodes| rows — co-partitioned with edges on the join key after
the first shuffle, and AQE reuses that partitioning across the unrolled
iterations) followed by a groupBy(dst) sum with map-side partials. Degree
is precomputed once and rides along the edge rows. This is exactly the
Pregel-as-joins formulation GraphX/GraphFrames lower to; Spark caches the
loop-invariant edge relation once. Emitting only the event-type side keeps
the result constant-size; per-user ranks stay distributed.

No reference citation: the reference has no graph stage; driver-mandated
extension (BASELINE.json north_star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_parse_vector_db_spark.plans.registry import QuerySpec
from pdf_parse_vector_db_spark.sources.registry import load_table

_DAMP = 0.85
_ITERS = 3


def pagerank_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration PageRank over the user<->event_type bipartite graph;
    returns the event-type nodes' rank after each iteration (r1..r3), so
    the oracle checks the whole trajectory, not just the endpoint."""
    events = load_table(spark, sf_dir, "events", spread=True)
    directed = events.select(
        F.concat(F.lit("u:"), F.col("user_id").cast("string")).alias("src"),
        F.concat(F.lit("t:"), F.col("event_type")).alias("dst"),
    ).distinct()
    edges = directed.unionByName(
        directed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    # every node has degree >= 1 in both directions, so deg's key set IS the
    # node set; edges_w carries the source degree along each edge row
    edges_w = edges.join(deg, on="src")
    nodes = deg.select(F.col("src").alias("node"))
    nn = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))

    ranks = nodes.crossJoin(F.broadcast(nn)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("r")
    )
    iter_ranks = []
    for _ in range(_ITERS):
        contribs = (
            edges_w.join(ranks, edges_w["src"] == ranks["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("r") / F.col("od")).alias("c"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(nn))
            .join(contribs, nodes["node"] == contribs["dst"], "left")
            .select(
                "node",
                (
                    F.lit(1 - _DAMP) / F.col("n")
                    + F.lit(_DAMP) * F.coalesce(F.col("c"), F.lit(0.0))
                ).alias("r"),
            )
        )
        iter_ranks.append(ranks)

    out = iter_ranks[0].select("node", F.round("r", 6).alias("r1"))
    for i, df in enumerate(iter_ranks[1:], start=2):
        out = out.join(df.select("node", F.round("r", 6).alias(f"r{i}")), on="node")
    return out.filter(F.col("node").startswith("t:")).orderBy("node")


def _pr_iter_sql(prev: str, cur: str) -> str:
    return f"""
c{cur} AS (
  SELECT e.dst AS node, sum(r.r / e.od) AS c
  FROM edges_w e JOIN r{prev} r ON e.src = r.node
  GROUP BY 1
),
r{cur} AS (
  SELECT nodes.node,
         {1 - _DAMP} / nn.n + {_DAMP} * coalesce(c{cur}.c, 0.0) AS r
  FROM nodes CROSS JOIN nn LEFT JOIN c{cur} ON nodes.node = c{cur}.node
)"""


PAGERANK_BIPARTITE_SQL = (
    """
WITH directed AS (
  SELECT DISTINCT 'u:' || CAST(user_id AS VARCHAR) AS src,
                  't:' || event_type AS dst
  FROM events
),
edges AS (
  SELECT src, dst FROM directed
  UNION ALL
  SELECT dst AS src, src AS dst FROM directed
),
deg AS (SELECT src, count(*) AS od FROM edges GROUP BY 1),
edges_w AS (SELECT e.src, e.dst, d.od FROM edges e JOIN deg d USING (src)),
nodes AS (SELECT src AS node FROM deg),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
r0 AS (SELECT node, 1.0 / n AS r FROM nodes CROSS JOIN nn),"""
    + ",".join(_pr_iter_sql(i, i + 1) for i in range(_ITERS))
    + """
SELECT r1.node,
       round(r1.r, 6) AS r1, round(r2.r, 6) AS r2, round(r3.r, 6) AS r3
FROM r1 JOIN r2 USING (node) JOIN r3 USING (node)
WHERE node LIKE 't:%'
ORDER BY node
"""
)


QUERIES = [
    QuerySpec("pagerank_bipartite", pagerank_bipartite, PAGERANK_BIPARTITE_SQL, "3-iteration unrolled PageRank on the interaction graph"),
]
