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
}
