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

  test("mutualInformation: X=Y gives ln|X|, independent bits give ~0") {
    val spark2 = spark
    import spark2.implicits._
    val dep = (0L until 400L).map(i => (i % 4, i % 4)).toDF("x", "y")
    val miDep = graft.profiling.Profiler.mutualInformation(dep, "x", "y")
      .collect().head.getDouble(4)
    assert(math.abs(miDep - math.log(4.0)) < 1e-6)
    val ind = (0L until 400L).map(i => (i % 2, (i / 2) % 2)).toDF("x", "y")
    val miInd = graft.profiling.Profiler.mutualInformation(ind, "x", "y")
      .collect().head.getDouble(4)
    assert(math.abs(miInd) < 1e-6)
  }

  test("cluster sampling query: quota = ceil(sqrt(size)), kept = min(quota, size)") {
    val r = graft.dedup.DedupQueries.dedupClusterSample(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      val (size, quota, rank) = (x.getLong(2), x.getLong(3), x.getLong(4))
      assert(quota == math.ceil(math.sqrt(size.toDouble)).toLong)
      assert(rank >= 1L && rank <= quota)
    }
    // every cluster keeps exactly min(quota, size) members
    val perCluster = r.groupBy(_.getLong(1))
    perCluster.foreach { case (_, rows) =>
      val size = rows.head.getLong(2)
      val quota = rows.head.getLong(3)
      assert(rows.length.toLong == math.min(quota, size))
    }
  }

  test("funnel ordering: a view BEFORE signup does not convert") {
    val spark2 = spark
    import spark2.implicits._
    // user 1: view(10) < signup(20) → stuck at stage 1
    // user 2: signup(10) < view(20) < purchase(30) → stage 3
    // user 3: signup(10), purchase(5) with no qualifying view → stage 1
    val e = Seq(
      (1L, "view", 10L), (1L, "signup", 20L),
      (2L, "signup", 10L), (2L, "view", 20L), (2L, "purchase", 30L),
      (3L, "signup", 10L), (3L, "purchase", 5L))
      .toDF("user_id", "event_type", "us")
      .select(col("user_id"), col("event_type"),
        timestamp_micros(col("us")).as("ts"))
    val dir = java.nio.file.Files.createTempDirectory("funnel").toString
    e.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.ExtraQueries.eventsFunnel(spark, dir).collect()
      .map(x => x.getLong(0) -> x.getLong(4)).toMap
    assert(r == Map(1L -> 1L, 2L -> 3L, 3L -> 1L))
  }

  test("labelCentroidSim: duplicated label → cosine 1, orthogonal labels → 0") {
    val spark2 = spark
    import spark2.implicits._
    val vs = Seq(
      (1, Seq(1.0f, 0.0f, 0.0f, 0.0f)), (1, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2, Seq(1.0f, 0.0f, 0.0f, 0.0f)),   // same direction as label 1
      (3, Seq(0.0f, 1.0f, 0.0f, 0.0f)))   // orthogonal
      .toDF("label", "embedding")
    val r = graft.ann.Ann.labelCentroidSim(vs, "label", "embedding", 4)
      .collect().map(x => (x.getInt(0), x.getInt(1)) -> x.getDouble(2)).toMap
    assert(r.size == 3) // C(3,2), i<j only
    assert(r((1, 2)) == 1.0 && r((1, 3)) == 0.0 && r((2, 3)) == 0.0)
  }

  test("triangles: skewed hub with SMALL id — degree ordering keeps wedge fanout off the hub") {
    val spark2 = spark
    import spark2.implicits._
    // hub = vertex 0 (the smallest id — the adversarial case for an
    // id-based orientation) connected to 60 leaves, plus a 3-cycle of
    // leaves (1,2,3) so there are triangles through the hub.
    val star = (1L to 60L).map(l => (0L, l))
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val edges = (star ++ tri).toDF("id1", "id2")
    // wedge work actually enumerated = Σ_v C(outdeg(v), 2)
    val ed = Triangles.orientedEdges(edges)
    val wedges = ed.groupBy("src").count().collect()
      .map(r => { val d = r.getLong(1); d * (d - 1) / 2 }).sum
    // Degree orientation points every star edge leaf→hub (hub has the
    // max degree), so the hub's out-degree is 0 and total wedges are
    // O(1) — id orientation would enumerate C(60,2) = 1770 at the hub.
    assert(wedges <= 6, s"wedge fanout not degree-bounded: $wedges")
    val hubOut = ed.where(col("src") === 0L).count()
    assert(hubOut == 0L)
    // and the counts are still exact: triangles (0,1,2),(0,2,3),(0,1,3),(1,2,3)
    val r = Triangles.vertexTriangles((0L to 60L).toDF("v"), edges).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r(0L) == (60L, 3L))
    assert(r(1L) == (3L, 3L) && r(2L) == (3L, 3L) && r(3L) == (3L, 3L))
    assert((4L to 60L).forall(v => r(v) == (1L, 0L)))
  }

  test("kcore: peels a tail into the clique core; whole graph below k is empty") {
    val spark2 = spark
    import spark2.implicits._
    import graft.graph.KCore
    // K5 (1..5) + node 6 wired to {4, 5, 7} + pendant 7: the 3-core is
    // exactly the K5, and it takes TWO sweeps to find — sweep 1 drops
    // only 7 (deg 1; 6 still has deg 3), sweep 2 drops 6 (now deg 2) —
    // so the fixpoint loop is exercised, not just one pass.
    val k5 = for { i <- 1L to 5L; j <- 1L to 5L if i < j } yield (i, j)
    val edges = (k5 ++ Seq((5L, 6L), (4L, 6L), (6L, 7L))).toDF("id1", "id2")
    val r = KCore.kCore(edges, 3).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == (1L to 5L).map(_ -> 4L).toMap, s"got $r")
    // k above the max clique degree → empty core
    assert(KCore.kCore(edges, 5).count() == 0L)
    // k=1 keeps everything with its full degree
    val all1 = KCore.kCore(edges, 1).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(all1(6L) == 3L && all1(7L) == 1L && all1(1L) == 4L)
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
