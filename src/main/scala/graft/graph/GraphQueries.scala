package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Graph-analytics queries + DuckDB oracles (SURVEY §2.12 extension —
  * link-graph layer). The graphs are DERIVED from fact tables by the
  * kind of join+agg a 100 TB pipeline would run (that is the
  * expensive, Catalyst-planned part); the iterative/combinatorial
  * kernels then operate on the aggregated, nodes-bounded frames.
  */
object GraphQueries {

  /** Nation-level trade graph: supplier-nation → customer-nation,
    * weighted by lineitem count, PageRank'd (10 exact-integer sweeps).
    * The edge derivation is the fact-scale work: lineitem ⋈ orders ⋈
    * customer ⋈ supplier, one groupBy(src, dst) — nation/supplier
    * dims broadcast, AQE sizes the fact joins.
    */
  def graphPagerank(s: SparkSession, dir: String): DataFrame = {
    val li = lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"))
    val o = orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
    val c = customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
    val sup = supplier(s, dir).select(col("s_suppkey"), col("s_nationkey"))
    val edges = li
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
      .agg(count(lit(1)).as("w"))
    val nodes = nation(s, dir).select(col("n_nationkey").as("v"))
    PageRank.run(nodes, edges)
      .join(broadcast(nation(s, dir).select(col("n_nationkey"), col("n_name"))),
        col("v") === col("n_nationkey"))
      .select(col("v"), col("n_name"), col("rank_scaled"), col("rank"))
      .orderBy(col("rank_scaled").desc, col("v"))
  }

  val graphPagerankOracle: String =
    s"""WITH edges AS (
       |  SELECT s_nationkey AS src, c_nationkey AS dst,
       |         CAST(count(*) AS BIGINT) AS w
       |  FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  GROUP BY 1, 2),
       |nodes AS (SELECT n_nationkey AS v FROM nation),
       |${PageRank.oracleSql()}
       |SELECT r10.v, n_name, r AS rank_scaled,
       |       (CAST(r AS DOUBLE) / 1000000000000.0) AS rank
       |FROM r10 JOIN nation ON n_nationkey = r10.v
       |ORDER BY rank_scaled DESC, v""".stripMargin

  /** Supplier co-supply graph: two suppliers are adjacent when they
    * ship lines of the same order. The per-order self-join fans out
    * at most items² per order (orders are small — bounded fanout, no
    * skew), then dedups to an undirected edge set; triangle counts +
    * degrees per supplier follow by ordered wedge-closure.
    */
  def graphTriangles(s: SparkSession, dir: String): DataFrame = {
    val li = lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"))
    val pairs = li.as("x").join(li.as("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_suppkey") < col("y.l_suppkey"))
      .select(col("x.l_suppkey").as("id1"), col("y.l_suppkey").as("id2"))
    val nodes = supplier(s, dir).select(col("s_suppkey").as("v"))
    Triangles.vertexTriangles(nodes, pairs).orderBy("v")
  }

  val graphTrianglesOracle: String =
    s"""WITH edges AS (
       |  SELECT x.l_suppkey AS id1, y.l_suppkey AS id2
       |  FROM lineitem x JOIN lineitem y
       |    ON y.l_orderkey = x.l_orderkey AND x.l_suppkey < y.l_suppkey),
       |nodes AS (SELECT s_suppkey AS v FROM supplier),
       |${Triangles.oracleSql}
       |SELECT v, degree, triangles FROM tri ORDER BY v""".stripMargin

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> (graphPagerank _),
    "graph_triangles" -> (graphTriangles _)
  )

  def oracles: Map[String, String] = Map(
    "graph_pagerank" -> graphPagerankOracle,
    "graph_triangles" -> graphTrianglesOracle
  )
}
