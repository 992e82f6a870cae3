"""Iterative graph analytics — PageRank as pure DataFrame joins.

The engine's second iterative algorithm (the first: dedup_clusters'
min-label propagation). PageRank is the canonical "driver loop over
distributed joins" shape: each iteration is

    contribs = edges ⋈ ranks (on src)  →  groupBy(dst).sum
    ranks    = nodes ⟕ contribs        →  damped update

No collect() anywhere — the driver only composes plans; K iterations =
K shuffle rounds on the same key. At 100 TB you'd pre-partition edges
and ranks on the join key once (bucketing) so every round co-locates,
and persist each iteration's ranks to cut lineage; at fixture scale AQE
handles both.

Determinism (and the SQL oracle) comes from integer-micro rank
arithmetic: ranks live in millionths, contributions are integer
divisions, and the damped update is `150000 + (850 * S) DIV 1000` —
order-independent, so Spark and DuckDB agree bit-for-bit, unlike a
float PageRank whose low bits depend on partition merge order.

The graph is deterministic-synthetic over the documents table (each doc
links to 3 pseudo-random neighbors via modular hashing — out-degree
exactly 3, no dangling nodes), so the operator is a pure function of
the fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

QUERIES: dict = {}

PR_ITERS = 4
PR_OUT_DEG = 3
PR_TOPK = 15


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    nodes = docs.select("doc_id")
    total = nodes.agg(F.count(F.lit(1)).alias("n"))
    # 3 deterministic out-edges per node: dst = (src*7 + k*13) mod n
    edges = (nodes.crossJoin(F.broadcast(total))
             .select(F.col("doc_id").alias("src"),
                     F.explode(F.array(*[
                         (F.col("doc_id") * 7 + 13 * k) % F.col("n")
                         for k in range(1, PR_OUT_DEG + 1)])).alias("dst"))
             # reused by every iteration: persist so K rounds scan the
             # edge table instead of re-deriving it through the lineage
             .persist())
    ranks = nodes.select("doc_id", F.lit(1000000).cast("bigint").alias("r"))
    for _ in range(PR_ITERS):
        contribs = (edges.join(ranks, edges.src == ranks.doc_id)
                    .select("dst", F.expr(f"r div {PR_OUT_DEG}").alias("c"))
                    .groupBy("dst").agg(F.sum("c").alias("s")))
        ranks = (nodes.join(contribs, nodes.doc_id == contribs.dst, "left")
                 .select(nodes.doc_id,
                         F.expr("cast(150000 + (850 * coalesce(s, 0)) div 1000"
                                " as bigint)").alias("r")))
    return ranks.orderBy(F.desc("r"), "doc_id").limit(PR_TOPK)


def _pagerank_sql() -> str:
    edge_dsts = ", ".join(
        f"(doc_id * 7 + {13 * k}) % n" for k in range(1, PR_OUT_DEG + 1))
    cte = [
        "WITH nodes AS (SELECT doc_id FROM documents),",
        "tot AS (SELECT COUNT(*) AS n FROM nodes),",
        "edges AS (SELECT doc_id AS src,",
        f"  unnest([{edge_dsts}]) AS dst FROM nodes, tot),",
        "r0 AS (SELECT doc_id, CAST(1000000 AS BIGINT) AS r FROM nodes)",
    ]
    for k in range(PR_ITERS):
        cte.append(f""",
r{k + 1} AS (
  SELECT n.doc_id,
         CAST(150000 + (850 * COALESCE(SUM(p.r // {PR_OUT_DEG}), 0)) // 1000
              AS BIGINT) AS r
  FROM nodes n
  LEFT JOIN edges e ON e.dst = n.doc_id
  LEFT JOIN r{k} p ON p.doc_id = e.src
  GROUP BY n.doc_id)""")
    cte.append(f"""
SELECT doc_id, r FROM r{PR_ITERS}
ORDER BY r DESC, doc_id
LIMIT {PR_TOPK}""")
    return "\n".join(cte)


QUERIES["graph_pagerank"] = (graph_pagerank, _pagerank_sql())
