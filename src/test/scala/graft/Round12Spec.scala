package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-12: the selectivity-derived k-oversampling post-filter ANN
  * operator (the deployment answer to ann_filtered's 0-400 milli
  * naive-composition recall), plus the nDCG extension's laws living in
  * Round11Spec's sandwich test.
  */
class Round12Spec extends AnyFunSuite {
  import TestSpark._

  test("ann_filtered_oversample: search_k = ceil(k/selectivity), and the " +
      "oversampled cut dominates the naive post-filter per query") {
    val rows = graft.ann.AnnQueries.annFilteredOversample(spark, sf).collect()
    assert(rows.nonEmpty)
    // corpus law at the test SF: 500 vectors, 167 satisfy %3=0 —
    // selectivity 334 milli, search_k = ceil(5*500/167) = 15
    val sks = rows.filter(!_.isNullAt(4)).map(r => (r.getLong(4), r.getLong(5))).distinct
    assert(sks.sameElements(Array((15L, 334L))),
      s"search_k/selectivity: ${sks.mkString(",")}")
    // subset law: the filtered survivors of top-5 are a prefix of the
    // filtered survivors of top-search_k, so over-recall can never lose
    // to the naive post-filter recall on ANY query
    val byQ = rows.groupBy(_.getLong(0))
    byQ.foreach { case (qid, rs) =>
      val post = rs.head.getLong(6); val over = rs.head.getLong(7)
      assert(over >= post, s"qid $qid: over $over < post $post")
      assert(rs.forall(r => r.getLong(6) == post && r.getLong(7) == over),
        s"qid $qid: recall columns must be constant within a query")
    }
    // the operator must actually close most of the gap at the test SF:
    // naive post-filter measured 0-400 milli (ann_filtered, r11); the
    // oversampled cut reaches at least 400 everywhere and beats the
    // naive cut strictly wherever the naive cut lost recall
    byQ.foreach { case (qid, rs) =>
      val post = rs.head.getLong(6); val over = rs.head.getLong(7)
      assert(over >= 400, s"qid $qid: oversampled recall $over below floor")
      if (post < 400) assert(over > post, s"qid $qid: no gain over naive")
    }
    // every emitted id satisfies the predicate
    rows.foreach { r =>
      assert(r.getLong(2) % 3 == 0, "pre_id must satisfy the predicate")
      if (!r.isNullAt(3)) assert(r.getLong(3) % 3 == 0,
        "over_id must satisfy the predicate")
    }
  }

  test("io_zorder_pruned: measured file skipping — single sort cannot " +
      "prune the non-sorted dimension, z-order prunes both") {
    import org.apache.spark.sql.functions._
    val rows = graft.io.IoQueries.ioZorderPruned(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows.size == 6, s"expected 2 layouts x 3 preds: ${rows.keys}")
    // 16 real files per layout, every predicate's matching-row count
    // identical across layouts (layout changes WHERE rows live, never
    // WHICH rows match)
    rows.values.foreach { case (total, read, _) =>
      assert(total == 16); assert(read >= 1 && read <= total)
    }
    Seq("box", "bal_range", "nat_eq").foreach { p =>
      assert(rows(("zorder", p))._3 == rows(("single", p))._3,
        s"pred $p: matched rows must be layout-independent")
    }
    // the lesson, measured on bytes written to disk:
    // 1. a predicate on the NON-sorted dimension defeats the single
    //    sort completely (its files all span the full nat range)...
    assert(rows(("single", "nat_eq"))._2 == 16,
      "single sort must be unable to prune nat")
    // ...while the z-layout bounds nat per file and skips
    assert(rows(("zorder", "nat_eq"))._2 < 16,
      "z-order must prune files on the non-sorted dimension")
    // 2. on the 2-D box, z-order needs no more files than the single
    //    sort; 3. on the sorted column's own range, the single sort is
    //    at least as good — the honest trade
    assert(rows(("zorder", "box"))._2 <= rows(("single", "box"))._2)
    assert(rows(("single", "bal_range"))._2 <= rows(("zorder", "bal_range"))._2)
    // plan pin: the selective read of the written layout carries the
    // predicate INTO the parquet scan (PushedFilters) — stats-based
    // skipping happens below Spark, but only for pushed filters
    val sel = spark.read.parquet(graft.io.IoQueries.zorderPath(sf) + "/zorder")
      .filter(col("nat") === 7 && col("bal").between(4, 7))
    val plan = sel.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") && plan.contains("EqualTo(nat,7)"),
      s"predicate must reach the parquet scan, got:\n$plan")
  }
}
