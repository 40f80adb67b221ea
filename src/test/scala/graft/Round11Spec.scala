package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.Sssp
import graft.streaming.Streams

/** Round-11: weighted shortest paths, calibration-aware threshold
  * selection, the extended ANN recall evaluator, the sharded-KMV
  * union face, and the streaming micro-batch-count pins (r10 verdict
  * ask #1: a silent doubling of AvailableNow batches is a perf
  * regression the result hash can never see).
  */
class Round11Spec extends AnyFunSuite {
  import TestSpark._

  // ---------- Sssp kernel ----------

  private def ssspOf(seeds: Seq[Long], edges: Seq[(Long, Long, Long)],
      iters: Int): Map[Long, Long] = {
    val spark2 = spark
    import spark2.implicits._
    Sssp.run(seeds.toDF("v"), edges.toDF("id1", "id2", "w"), iters)
      .as[(Long, Long)].collect().toMap
  }

  // chain 1-2-3-4-5 at w=3 with w=7 skip edges — skip is DELIBERATELY
  // dearer than two chain hops, so min-weight disagrees with min-hops
  private val line = Seq(
    (1L, 2L, 3L), (2L, 3L, 3L), (3L, 4L, 3L), (4L, 5L, 3L),
    (1L, 3L, 7L), (2L, 4L, 7L), (3L, 5L, 7L))

  test("sssp: weighted min disagrees with hop min (2 chains beat 1 skip)") {
    val d = ssspOf(Seq(1L), line, iters = 4)
    assert(d(1L) == 0L)
    assert(d(2L) == 3L)
    assert(d(3L) == 6L, "two w=3 hops must beat the direct w=7 skip")
    assert(d(4L) == 9L)
    assert(d(5L) == 12L)
  }

  test("sssp: iters caps the path-edge count (Bellman-Ford sweep law)") {
    val d1 = ssspOf(Seq(1L), line, iters = 1)
    // one sweep = direct neighbors only: node 3 must take the skip
    assert(d1(2L) == 3L)
    assert(d1(3L) == 7L, "within 1 edge the only route to 3 is the skip")
    assert(!d1.contains(4L) || d1(4L) == 7L) // 2-4 skip unreachable from seed in 1 edge
    assert(!d1.contains(5L), "5 is 2+ edges away")
    // two sweeps refine: 3 improves 7 -> 6, 5 appears via 1-3-5 (7+7) or 1-2-4? cheapest ≤2-edge
    val d2 = ssspOf(Seq(1L), line, iters = 2)
    assert(d2(3L) == 6L)
    assert(d2(5L) == 14L, "cheapest ≤2-edge route to 5 is skip+skip")
  }

  test("sssp: duplicate seeds dedup; parallel edges keep the cheapest; " +
      "multi-source takes the nearest seed") {
    val edges = Seq((1L, 2L, 5L), (1L, 2L, 2L), (2L, 3L, 2L))
    val d = ssspOf(Seq(1L, 1L, 1L), edges, iters = 3)
    assert(d(1L) == 0L)
    assert(d(2L) == 2L, "parallel (1,2) edges must resolve to min weight")
    assert(d(3L) == 4L)
    assert(d.size == 3, "duplicate seed rows must not duplicate output rows")
    val multi = ssspOf(Seq(1L, 3L), edges, iters = 3)
    assert(multi(2L) == 2L, "nearest seed wins: via 3 costs 2 as well")
    assert(multi(1L) == 0L && multi(3L) == 0L)
  }

  // ---------- streaming micro-batch pins ----------

  test("stream_asof completes in exactly 1 micro-batch and " +
      "stream_asof_buffered in exactly 2 (data + timeout drain) — " +
      "a silent batch-count doubling cannot recur unseen") {
    ExtraQueries.streamAsof(spark, sf).collect()
    val asofName = "graft_stream_asof_" + java.lang.Integer.toHexString(sf.hashCode)
    assert(Streams.lastRunBatches(asofName) == 1,
      s"stream_asof batches: ${Streams.lastRunBatches.get(asofName)}")
    ExtraQueries.streamAsofBuffered(spark, sf).collect()
    val bufName = "graft_stream_asofb_" + java.lang.Integer.toHexString(sf.hashCode)
    assert(Streams.lastRunBatches(bufName) == 2,
      s"stream_asof_buffered batches: ${Streams.lastRunBatches.get(bufName)}")
  }

  // ---------- calibration-aware threshold pick ----------

  test("match_threshold_pick: pick laws hold against the sweep frames") {
    val spark2 = spark
    import spark2.implicits._
    val picks = graft.matching.MatchQueries.matchThresholdPick(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(picks.contains("max_f1"), "max_f1 pick must exist")
    // every pick's threshold sits on the 0.01 grid
    picks.values.foreach { r =>
      val th = r.getDouble(1)
      assert(math.abs(th * 100 - math.rint(th * 100)) < 1e-9, s"off-grid θ $th")
    }
    // max_f1 dominates the coarse sweep's best F1 (fine grid ⊇ coarse)
    val coarseBest = graft.matching.MatchQueries.matchThresholdSweep(spark, sf)
      .agg(max(col("f1"))).collect()(0).getDouble(0)
    val f1 = picks("max_f1").getDouble(8)
    assert(f1 >= coarseBest - 1e-9,
      s"fine-grid max F1 $f1 must dominate coarse best $coarseBest")
    // the service-level pick honors its own constraint
    picks.get("min_theta_p95").foreach { r =>
      assert(r.getDouble(6) >= 0.95, s"p95 pick precision ${r.getDouble(6)}")
      assert(r.getDouble(8) <= f1 + 1e-9, "max_f1 must dominate any other pick")
    }
    // confusion-row arithmetic: n_pred = tp + fp on every pick
    picks.values.foreach { r =>
      assert(r.getLong(5) == r.getLong(2) + r.getLong(3), "n_pred = tp + fp")
    }
  }

  // ---------- extended ANN recall evaluator ----------

  test("ann_recall_eval ranks all seven index tiers in one frame") {
    val rows = graft.ann.AnnQueries.annRecallEval(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(rows.keySet ==
        Set("lsh", "lsh_tuned", "ivf", "pq", "ivfpq", "sq8", "pq_refine"),
      s"methods: ${rows.keySet}")
    rows.values.foreach(v => assert(v >= 0 && v <= 1000))
    // The cross-tier orderings below are DATA-DEPENDENT (they hold on
    // the driver-generated sf0.01 embeddings but are not laws of the
    // index families), so pin them with ≥ (no strict gap): a
    // regenerated corpus may tie, but OR-construction can never
    // RETRIEVE LESS than the single table it extends when the recall
    // differences we currently observe (820 vs 0, 920 vs 340 milli)
    // collapse entirely.
    assert(rows("lsh_tuned") >= rows("lsh"),
      s"lsh_tuned ${rows("lsh_tuned")} vs lsh ${rows("lsh")}")
    // 8-bit/dim scalar codes vs 4-subspace PQ: finer on this corpus
    assert(rows("sq8") >= rows("pq"),
      s"sq8 ${rows("sq8")} vs pq ${rows("pq")}")
    // exact re-ranking of the PQ candidates vs raw ADC order: a law
    // under the refine metric (ann_pq_refine hash-gates THAT); against
    // this evaluator's cosine truth it is data-dependent like the rest
    // of this block (refine promotes L2-nearest, not cosine-nearest)
    assert(rows("pq_refine") >= rows("pq"),
      s"pq_refine ${rows("pq_refine")} vs pq ${rows("pq")}")
    // recorded expected values at the test SF (sf0.01, driver-generated
    // seed): regenerating the corpus shifts these — update the pins
    // with the data, they exist to catch CODE regressions at fixed data
    assert(rows("lsh_tuned") >= 500 && rows("ivf") >= 500 && rows("sq8") >= 500,
      s"strong tiers lost recall on fixed data: $rows")
  }

  // ---------- t-closeness ----------

  test("profile_tclose: EMD milli values are bounded and the audit is " +
      "non-degenerate") {
    val r = graft.profiling.ProfileQueries.profileTclose(spark, sf).collect()(0)
    val (nClasses, minE, maxE) = (r.getLong(0), r.getLong(3), r.getLong(4))
    assert(nClasses > 0)
    assert(minE >= 0 && maxE <= 1000, s"EMD out of [0,1000]: $minE..$maxE")
    assert(maxE > minE, "a uniform-EMD audit would mean the law collapsed")
  }

  test("profile_privacy_gate fails closed: release_ok is the conjunction " +
      "of the three audit flags") {
    val r = graft.profiling.ProfileQueries.profilePrivacyGate(spark, sf).collect()(0)
    val (ka, ld, tc, ok) =
      (r.getBoolean(6), r.getBoolean(7), r.getBoolean(8), r.getBoolean(9))
    assert(ok == (ka && ld && tc), "gate must be the conjunction, nothing weaker")
    // a violated audit names at least one row at risk, a passing one none
    // (every violating class holds >= 1 row)
    assert(ka == (r.getLong(3) == 0L))
    assert(ld == (r.getLong(4) == 0L))
    assert(tc == (r.getLong(5) == 0L))
  }

  // ---------- perceptual-hash near-dup ----------

  test("aHash64: identical payloads collide; the fingerprint is a pure " +
      "function of the bytes") {
    val spark2 = spark
    import spark2.implicits._
    val rows = Seq(
      graft.multimodal.MediaRecord(1L, "image", 8, 8,
        "the quick brown fox jumps over the lazy dog".getBytes("UTF-8")),
      graft.multimodal.MediaRecord(2L, "image", 8, 8,
        "the quick brown fox jumps over the lazy dog".getBytes("UTF-8")),
      graft.multimodal.MediaRecord(3L, "image", 8, 8,
        "completely different content with other words here".getBytes("UTF-8")))
    val ds = spark2.createDataset(rows)
    val h = graft.multimodal.Multimodal.aHash64(ds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) == h(2L), "same bytes must fingerprint identically")
    assert(h(1L) != h(3L), "different content must (here) differ")
    // banding pigeonhole: at Hamming 0 every band collides
    (0 until 4).foreach { b =>
      assert(((h(1L) >> (b * 16)) & 0xffffL) == ((h(2L) >> (b * 16)) & 0xffffL))
    }
  }

  test("mm_phash_neardup returns verified pairs only (hamming <= 9, id1 < id2)") {
    val rows = ExtraQueries.mmPhashNeardup(spark, sf).collect()
    assert(rows.nonEmpty, "sf0.001 must surface at least one near-dup pair")
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getLong(2) >= 0 && r.getLong(2) <= 9)
    }
  }

  // ---------- retrieval evaluator ----------

  test("text_retrieval_eval: metric sandwich recall@1 <= MRR <= recall@10 " +
      "and monotone recall") {
    val r = graft.text.TextQueries.textRetrievalEval(spark, sf).collect()(0)
    val (nq, nf) = (r.getLong(0), r.getLong(1))
    val (mrr, r1, r5, r10) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    val ndcg = r.getLong(6)
    assert(nq > 0 && nf <= nq)
    assert(r1 <= r5 && r5 <= r10, s"recall must be monotone: $r1/$r5/$r10")
    assert(r1 <= mrr && mrr <= r10,
      s"MRR $mrr must sit between recall@1 $r1 and recall@10 $r10")
    // nDCG sandwich: per query 1/r <= ln2/ln(r+1) <= 1 for r in 1..10,
    // so MRR <= nDCG@10 <= recall@10 in milli (±1 for the finer micro
    // flooring on the nDCG side).
    assert(mrr - 1 <= ndcg && ndcg <= r10,
      s"nDCG@10 $ndcg must sit between MRR $mrr and recall@10 $r10")
    Seq(mrr, r1, r5, r10, ndcg).foreach(v => assert(v >= 0 && v <= 1000))
  }

  // ---------- incremental IVF / filtered ANN ----------

  test("ann_ivf_incremental equals the full rebuild row for row " +
      "(pointwise-assignment law)") {
    val inc = graft.ann.AnnQueries.annIvfIncremental(spark, sf).collect()
    val full = graft.ann.AnnQueries.annIvfSearch(spark, sf).collect()
    assert(inc.length == full.length && inc.nonEmpty)
    inc.zip(full).foreach { case (a, b) => assert(a == b, s"$a != $b") }
  }

  test("ann_filtered: pre-filter rows always match the predicate; " +
      "post-filter never beats pre-filter recall") {
    val rows = graft.ann.AnnQueries.annFiltered(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) % 3 == 0, "pre_id must satisfy the predicate")
      if (!r.isNullAt(4))
        assert(r.getLong(4) % 3 == 0, "post_id must satisfy the predicate")
      val rec = r.getLong(5)
      assert(rec >= 0 && rec <= 1000)
    }
  }

  // ---------- sharded KMV union ----------

  test("profile_kmv_sharded: merged shard sketches equal the whole-input " +
      "sketch exactly (the mergeable-sketch law, visible in the frame)") {
    val rows = graft.profiling.ProfileQueries.profileKmvSharded(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows.contains("merged") && rows.contains("whole"))
    assert(rows("merged") == rows("whole"),
      s"merged ${rows("merged")} must equal whole ${rows("whole")}")
    (0 to 3).foreach(i => assert(rows.contains(s"shard_$i")))
  }
}
