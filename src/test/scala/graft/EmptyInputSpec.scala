package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Kernel behavior on EMPTY and single-row inputs — the degenerate
  * partitions every 100 TB run contains (an empty source split, a
  * filter that drops everything). A kernel that throws on zero rows
  * (head() on an empty stats frame, division by a zero count) fails
  * the whole stage at scale; these pin that each family degrades to an
  * empty (or well-defined) frame instead.
  */
class EmptyInputSpec extends AnyFunSuite {
  import TestSpark._

  private def emptyDocs = {
    val spark2 = spark
    import spark2.implicits._
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  }

  private def oneDoc = {
    val spark2 = spark
    import spark2.implicits._
    Seq((1L, "one single document with a few plain words")).toDF("doc_id", "text")
  }

  test("dedup kernels: empty and singleton corpora produce zero pairs, no throw") {
    import graft.dedup.Dedup
    for (d <- Seq(emptyDocs, oneDoc)) {
      assert(Dedup.minhashLsh(d, "doc_id", "text").count() == 0L)
      assert(Dedup.ngramJaccard(d, "doc_id", "text", 3, 0.8).count() == 0L)
      assert(Dedup.containment(d, "doc_id", "text").count() == 0L)
    }
  }

  test("text kernels: empty corpus yields empty frames, no throw") {
    import graft.text.TextOps
    assert(TextOps.langId(emptyDocs, "doc_id", "text").count() == 0L)
    assert(TextOps.quality(emptyDocs, "doc_id", "text").count() == 0L)
    assert(TextOps.lineDedup(emptyDocs, "doc_id", "text", 5).count() == 0L)
    assert(TextOps.gopherRules(emptyDocs, "doc_id", "text").count() == 0L)
    assert(TextOps.readability(emptyDocs, "doc_id", "text").count() == 0L)
  }

  test("graph kernels: empty edge frames yield zero-triangle / self-label results") {
    val spark2 = spark
    import spark2.implicits._
    val nodes = Seq(1L, 2L).toDF("v")
    val noEdges = Seq.empty[(Long, Long)].toDF("id1", "id2")
    val tri = graft.graph.Triangles.vertexTriangles(nodes, noEdges)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(tri == Map(1L -> 0L, 2L -> 0L))
    val lpa = graft.graph.Lpa.run(nodes, noEdges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(lpa == Map(1L -> 1L, 2L -> 2L)) // isolated nodes keep own label
    assert(graft.graph.KCore.kCore(noEdges, 2).count() == 0L)
  }

  test("as-of join: empty right side keeps every left row with null payload") {
    val spark2 = spark
    import spark2.implicits._
    val l = Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("k", "ts", "pay")
    val r = Seq.empty[(Long, Long, Long)].toDF("k", "ts", "quote")
    val got = graft.operators.AsofJoin.asofBackward(l, r, "k", "ts").collect()
    assert(got.length == 2 && got.forall(_.isNullAt(3)))
  }

  test("profiling: empty frame profiles to zero counts, inclusionDeps degenerates cleanly") {
    val spark2 = spark
    import spark2.implicits._
    val e = Seq.empty[(Long, String)].toDF("a", "b")
    val p = graft.profiling.Profiler.profile(e).collect()
    assert(p.length == 2 && p.forall(_.getLong(1) == 0L))
    // one empty side: nothing to refute, nothing to hold — empty output
    val full = Seq((1L, "x")).toDF("a", "b")
    val ind = graft.profiling.Profiler.inclusionDeps(Seq(
      ("e.a", e, "a"), ("f.a", full, "a")))
      .collect().map(r => (r.getString(0), r.getBoolean(4))).toMap
    // e.a has zero values → appears in no value group → no lhs rows;
    // f.a's single value refutes f.a ⊆ e.a
    assert(ind == Map(("f.a", false)))
  }
}
