package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.{PageRank, Triangles}

/** Graph-analytics kernels: exact-integer PageRank invariants on
  * known topologies, and triangle counts on hand-checkable graphs.
  */
class GraphSpec extends AnyFunSuite {
  import TestSpark._

  private val S = 1000000000000L

  test("pagerank: symmetric 2-cycle → equal ranks; mass never exceeds scale") {
    val spark2 = spark
    import spark2.implicits._
    val nodes = Seq(1L, 2L).toDF("v")
    val edges = Seq((1L, 2L, 5L), (2L, 1L, 5L)).toDF("src", "dst", "w")
    val r = PageRank.run(nodes, edges).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) == r(2L))
    assert(r.values.sum <= S) // floors only leak mass, never create it
    assert(r(1L) > S / 3)     // and the leak is tiny on this graph
  }

  test("pagerank: star sinks rank into the center; isolated node keeps teleport mass") {
    val spark2 = spark
    import spark2.implicits._
    val nodes = Seq(0L, 1L, 2L, 3L, 9L).toDF("v") // 9 is isolated
    val edges = Seq((1L, 0L, 1L), (2L, 0L, 1L), (3L, 0L, 1L),
      (0L, 1L, 1L), (0L, 2L, 1L), (0L, 3L, 1L)).toDF("src", "dst", "w")
    val r = PageRank.run(nodes, edges).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(0L) > r(1L) && r(1L) == r(2L) && r(2L) == r(3L))
    // isolated vertex: contributions come only from teleport each sweep
    assert(r(9L) == (S / 100 * 15) / 5)
  }

  test("pagerank: bit-identical under repartition (exact integer state)") {
    val spark2 = spark
    import spark2.implicits._
    val edges = (1L to 200L)
      .map(i => (i % 13, (i * 7) % 13, 1L + i % 3)).toDF("src", "dst", "w")
      .where(col("src") =!= col("dst"))
    val nodes = (0L until 13L).toDF("v")
    val a = PageRank.run(nodes, edges).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    val b = PageRank.run(nodes.repartition(7), edges.repartition(11))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(a == b)
  }

  test("triangles: K4 counts, duplicate/self-loop edges dropped, isolated zeros") {
    val spark2 = spark
    import spark2.implicits._
    val k4 = for { i <- 1L to 4L; j <- 1L to 4L if i < j } yield (j, i) // reversed orientation
    val edges = (k4 ++ Seq((1L, 2L), (3L, 3L))).toDF("id1", "id2") // dup + loop
    val nodes = Seq(1L, 2L, 3L, 4L, 7L).toDF("v")
    val r = Triangles.vertexTriangles(nodes, edges).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert((1L to 4L).forall(v => r(v) == (3L, 3L))) // K4: deg 3, C(3,2)=3 tris each
    assert(r(7L) == (0L, 0L))
  }
}
