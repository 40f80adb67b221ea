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

  test("ann_ivf_filtered_oversample: the same laws hold composed with the " +
      "index tier, and search_k only changed the cut, not the plan") {
    val rows = graft.ann.AnnQueries.annIvfFilteredOversample(spark, sf).collect()
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_.getLong(0))
    byQ.foreach { case (qid, rs) =>
      val post = rs.head.getLong(6); val over = rs.head.getLong(7)
      // subset law survives the composition: the filtered survivors of
      // the tier's top-5 are a prefix of its top-search_k survivors
      assert(over >= post, s"qid $qid: over $over < post $post")
    }
    rows.foreach { r =>
      assert(r.getLong(2) % 3 == 0, "pre_id must satisfy the predicate")
      if (!r.isNullAt(3)) assert(r.getLong(3) % 3 == 0,
        "over_id must satisfy the predicate")
      if (!r.isNullAt(4)) assert(r.getLong(4) == 15L,
        "search_k must be the measured ceil(5*500/167)")
    }
    // at the test SF the oversampled cut holds the same 400-milli floor
    // as the brute-force face on every query (naive loses up to all 5)
    byQ.foreach { case (qid, rs) =>
      assert(rs.head.getLong(7) >= 400, s"qid $qid: over recall too low")
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

  test("driftWindowBins: streamed bins equal the batch histogram exactly " +
      "(watermark-closed window, real stateful agg)") {
    import org.apache.spark.sql.execution.streaming.runtime.{MemoryStream, StreamingQueryWrapper}
    import org.apache.spark.sql.functions._
    import graft.streaming.Streams
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(t: String) = java.sql.Timestamp.valueOf(t)
    // batches must ascend in event time across addData calls (late rows
    // beyond the watermark are dropped) — day 1 in two batches, then a
    // day-3 marker to close day 1's window
    val day1a = (1 to 200).map(i => (ts("2024-01-01 06:00:00"), i * 2.37))
    val day1b = (1 to 150).map(i => (ts("2024-01-01 18:00:00"), i * 3.11 + 120.0))
    val mem = MemoryStream[(java.sql.Timestamp, Double)]
    val q = Streams.driftWindowBins(
        mem.toDF.toDF("ts", "value").withWatermark("ts", "1 hour"))
      .writeStream.format("memory").queryName("drift_sink")
      .outputMode("append")
      .option("checkpointLocation", Streams.freshCheckpointDir("drift_spec"))
      .start()
    try {
      mem.addData(day1a: _*)
      q.processAllAvailable()
      mem.addData(day1b: _*)
      q.processAllAvailable()
      mem.addData((ts("2024-01-03 12:00:00"), 1.0))
      q.processAllAvailable()
      val streamed = spark.table("drift_sink")
        .filter($"window_start" === ts("2024-01-01 00:00:00"))
        .select("bin", "n")
      val batch = (day1a ++ day1b).toDF("ts", "value")
        .select(Streams.driftBin($"value").as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("n"))
      assert(streamed.count() > 0, "day-1 window must have emitted")
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "streamed bin counts must equal the batch histogram exactly")
      val exec = q.asInstanceOf[StreamingQueryWrapper].streamingQuery.lastExecution
      assert(exec.executedPlan.toString.contains("StateStoreSave"),
        "must be a real stateful streaming aggregation")
    } finally q.stop()
  }

  test("stream_drift_audit: every shifted window fires and the planted " +
      "shift separates cleanly from pre-cutoff noise") {
    val rows = graft.ExtraQueries.streamDriftAudit(spark, sf).collect()
    assert(rows.nonEmpty)
    val cut = java.sql.Timestamp.valueOf("2024-01-24 00:00:00")
    val byW = rows.groupBy(_.getTimestamp(0))
    val (post, pre) = byW.partition { case (w, _) => !w.before(cut) }
    assert(post.nonEmpty && pre.nonEmpty)
    // every shifted window must fire — the assertion a monitor exists for
    post.foreach { case (w, rs) =>
      assert(rs.head.getBoolean(6), s"shifted window $w did not fire")
    }
    // the planted +100.00 shift must separate from sampling noise: the
    // QUIETEST shifted window scores far above the LOUDEST unshifted
    // one. (At sf0.01's ~330-event windows the unshifted side also sits
    // under the 0.2 flag threshold; the ~33-event windows at this SF
    // smooth-noise above it, which is a window-sizing lesson, not a
    // monitor defect — hence the separation pin, not a threshold pin.)
    val maxPre = pre.values.map(_.head.getLong(5)).max
    val minPost = post.values.map(_.head.getLong(5)).min
    assert(minPost > 4L * maxPre,
      s"planted shift must dominate noise: min post $minPost vs max pre $maxPre")
    // psi is constant within a window and contribs sum to it
    byW.foreach { case (w, rs) =>
      val psi = rs.head.getLong(5)
      assert(rs.forall(_.getLong(5) == psi))
      assert(rs.map(_.getLong(4)).sum == psi, s"window $w: contribs must sum to psi")
    }
  }

  test("stream_drift_trailing: the change-point window dominates and the " +
      "monitor adapts — post-shift windows go quiet again") {
    val rows = graft.ExtraQueries.streamDriftTrailing(spark, sf).collect()
    assert(rows.nonEmpty)
    val cut = java.sql.Timestamp.valueOf("2024-01-24 00:00:00")
    val byW = rows.groupBy(_.getTimestamp(0))
    // the earliest window has no predecessor and must be excluded
    val first = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    assert(!byW.contains(first), "first window must be excluded (no lag)")
    assert(byW.contains(cut), "change-point window must be present")
    val cpPsi = byW(cut).head.getLong(5)
    assert(byW(cut).head.getBoolean(6), "change-point window must fire")
    // adaptation is the trailing monitor's whole point: every OTHER
    // window — including the post-shift ones, which compare to an
    // already-shifted neighbour — scores far below the change-point.
    // (measured: 2.40 vs ≤0.41 at sf0.001, 6.02 vs ≤0.07 at sf0.01; the
    // 4× pin survives window-count noise at ~33-event test windows)
    val maxOther = (byW - cut).values.map(_.head.getLong(5)).max
    assert(cpPsi > 4L * maxOther,
      s"change-point must dominate: cp $cpPsi vs max other $maxOther")
    // contribs sum to psi within each window
    byW.foreach { case (w, rs) =>
      assert(rs.map(_.getLong(4)).sum == rs.head.getLong(5),
        s"window $w: contribs must sum to psi")
    }
  }

  test("io_bucketed_join: the registered query's join subtree is " +
      "shuffle-free and the answer equals the raw join's") {
    import org.apache.spark.sql.functions._
    // (BucketingSpec proves the general contract; this pins the
    // REGISTERED query's own frame.) Materialize so AQE finalizes, then
    // scan only the final plan section — AQE nests exchanges in query
    // stages whose `children` is empty, so rendered text is the
    // reliable view (BucketingSpec idiom).
    val joined = graft.io.IoQueries.bucketedJoinFrame(spark, sf)
    joined.collect()
    val finalPlan = joined.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(finalPlan.contains("SortMergeJoin"),
      s"expected a sort-merge join, got:\n$finalPlan")
    assert("ShuffleQueryStage".r.findAllIn(finalPlan).isEmpty,
      s"bucketed join must not shuffle either side, got:\n$finalPlan")
    // and the bucketed answer equals the raw answer (bucketing never
    // changes results) — the oracle re-proves this against DuckDB
    val c = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey", "c_mktsegment")
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey")
    val a = graft.io.IoQueries.ioBucketedJoin(spark, sf).collect().toSeq
    assert(a.nonEmpty)
    val b = c.join(o, c("c_custkey") === o("o_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_orders"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    a.foreach { r =>
      assert(r.getLong(1) == b(r.getString(0)), s"row-count mismatch: $r")
    }
  }

  test("io_zorder_compact: compaction restores pruning without touching " +
      "unaffected base files, and the bill stays partial") {
    import org.apache.spark.sql.functions._
    val out = graft.io.IoQueries.ioZorderCompact(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // invariants that hold at any SF (the sf0.01 magnitudes are the
    // oracle's to check): totals are 20 pre-, 16 post-compact; the
    // repaired read never needs MORE files than the eroded one; row
    // counts are phase-invariant (no row lost or duplicated by the
    // rewrite); the bill is scoped (≥1, ≤16 chunks)
    for (pred <- Seq("box", "bal_range")) {
      assert(out(("post_append", pred))._1 == 20L)
      assert(out(("post_compact", pred))._1 == 16L)
      assert(out(("post_compact", pred))._2 <= out(("post_append", pred))._2,
        s"$pred: compaction must not worsen the read")
      assert(out(("post_append", pred))._3 == out(("post_compact", pred))._3,
        s"$pred: row counts must be phase-invariant")
    }
    val (billTotal, rewrittenFiles, rewrittenRows) = out(("rewrite", "cost"))
    assert(billTotal == 16L)
    assert(rewrittenFiles >= 1L && rewrittenFiles <= 16L)
    assert(rewrittenRows > 0L)
    // unaffected base chunk files must be byte-identical after the
    // query ran (compaction reads them, never rewrites them): their
    // parquet files' modification set lives under base/, while the
    // rewritten chunks live under compact/ — assert both dirs exist and
    // compact holds exactly the billed chunk count
    val root = java.nio.file.Paths.get(
      graft.io.IoQueries.zorderCompactPath(sf))
    val compactChunks = {
      val st = java.nio.file.Files.list(root.resolve("compact"))
      try st.filter(p => p.getFileName.toString.startsWith("chunk="))
        .count()
      finally st.close() // Files.list leaks a dir handle if unclosed
    }
    assert(compactChunks == rewrittenFiles,
      s"compact dir holds $compactChunks chunk dirs, billed $rewrittenFiles")
  }

  test("join_skew_salted: result equals the unsalted join; the SMJ keys " +
      "carry the salt so a hot key spreads across partitions") {
    import org.apache.spark.sql.functions._
    val salted = graft.ExtraQueries.joinSkewSalted(spark, sf)
    val li = Tables.lineitem(spark, sf)
    val sup = Tables.supplier(spark, sf)
    val plain = li
      .select(col("l_suppkey"), Tables.cents(col("l_extendedprice")).as("_pc"))
      .join(sup.select(col("s_suppkey").as("l_suppkey"), col("s_nationkey")),
        "l_suppkey")
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_items"),
        Tables.centsToDouble(sum("_pc")).as("revenue"))
    assert(salted.count() > 0)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
      "salting must not change the join's answer")
    // plan half: the salted join's sort-merge keys include _salt
    val joined = graft.operators.Skew.saltedJoin(
      li.select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber")),
      sup.select(col("s_suppkey").as("l_suppkey"), col("s_nationkey")),
      "l_suppkey", 8, xxhash64(col("l_orderkey"), col("l_linenumber")))
    joined.collect()
    val fp = joined.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(fp.contains("SortMergeJoin"), s"expected SMJ:\n$fp")
    assert(fp.contains("_salt"), s"join keys must carry the salt:\n$fp")
  }

  test("agg_skew_distinct: the two-phase decomposition equals the direct " +
      "count distinct, and phase 1 shuffles on BOTH columns") {
    import org.apache.spark.sql.functions._
    val two = graft.ExtraQueries.aggSkewDistinct(spark, sf)
    val direct = Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct("user_id").as("n_users"))
    assert(two.count() > 0)
    assert(two.exceptAll(direct).isEmpty && direct.exceptAll(two).isEmpty)
    two.collect()
    val fp = two.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("hashpartitioning\\(event_type#\\d+, user_id#\\d+".r
        .findFirstIn(fp).isDefined,
      s"phase-1 exchange must hash (event_type, user_id):\n$fp")
  }

  test("stream_enrich: streamed enrichment equals the batch frame; the dim " +
      "joins broadcast (stateless) and only the window agg is stateful") {
    import org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper
    import org.apache.spark.sql.functions._
    import graft.streaming.Streams
    val batch = graft.ExtraQueries.streamEnrich(spark, sf)
      .collect().map(_.toSeq).toSet
    val dim = Tables.customer(spark, sf).select(
      (col("c_custkey") - 1).cast("long").as("user_id"), col("c_mktsegment"))
    val q = Streams.enrichAgg(Streams.eventsStream(spark, sf), dim)
      .writeStream.format("memory").queryName("enrich_sink")
      .option("checkpointLocation", Streams.freshCheckpointDir("enrich_spec"))
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("enrich_sink").collect().map(_.toSeq).toSet
    assert(batch.nonEmpty && streamed == batch,
      "streamed enrichment must equal the batch frame")
    val plan = q.asInstanceOf[StreamingQueryWrapper]
      .streamingQuery.lastExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"dim must broadcast:\n$plan")
    assert(plan.contains("StateStoreSave"), "window agg must be stateful")
    assert(!plan.contains("StreamingSymmetricHashJoin"),
      "enrichment must not buffer the fact side in a stream-stream join")
  }

  test("ann_pq_refine: refinement never evicts truth — refined recall " +
      "dominates PQ recall per query, at 20 exact reads per query") {
    val rows = graft.ann.AnnQueries.annPqRefine(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pq = r.getLong(1); val ref = r.getLong(2)
      assert(ref >= pq, s"qid ${r.getLong(0)}: refined $ref < pq $pq")
      assert(r.getLong(3) == pq * 200 && r.getLong(4) == ref * 200)
      assert(ref <= 5L)
    }
    // the refine must actually buy recall somewhere at this SF, or the
    // composition is vacuous (measured: it does — PQ with 16 fixed
    // codes loses truth that exact re-ranking recovers)
    assert(rows.map(_.getLong(2)).sum > rows.map(_.getLong(1)).sum,
      "refine should recover recall PQ lost at this SF")
  }

  test("join_dim_scd: the asof plan equals the SCD2 interval join, " +
      "boundary semantics included") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val asof = graft.ExtraQueries.joinDimScd(spark, sf)
    // Spark-side recompute of the ORACLE formulation (the naive
    // interval join) — proves the equivalence independent of DuckDB
    val e = Tables.events(spark, sf)
    val d1 = e.filter(col("event_type") === "signup")
      .select(col("user_id"), unix_micros(col("ts")).as("ts"),
        least(greatest(floor(col("value") / lit(100.0)).cast("long"), lit(0L)),
          lit(4L)).as("_t0"))
      .groupBy("user_id", "ts").agg(min("_t0").as("tier"))
    val dim = d1.select(col("user_id").as("_du"), col("ts").as("valid_from"),
      coalesce(lead(col("ts"), 1).over(
          Window.partitionBy("user_id").orderBy("ts")),
        lit(Long.MaxValue)).as("valid_to"),
      col("tier"))
    val f = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("ts"),
        col("event_id"), Tables.cents(col("value")).as("value_cents"))
    val interval = f.join(dim,
        f("user_id") === dim("_du") && dim("valid_from") <= f("ts") &&
          f("ts") < dim("valid_to"), "left")
      .select(f("user_id"), f("ts"), col("event_id"), col("value_cents"),
        col("tier"))
    assert(asof.count() > 0)
    assert(asof.exceptAll(interval).isEmpty && interval.exceptAll(asof).isEmpty,
      "asof enrichment must equal the SCD2 interval join")
    // both boundary populations exist at the test SF, or the law is
    // only half-exercised: some fact matched a non-first version, and
    // some fact predates every version (tier null)
    val rows = asof.collect()
    assert(rows.exists(_.isNullAt(4)), "need pre-first-version facts")
    assert(rows.exists(!_.isNullAt(4)), "need matched facts")
  }

  test("cluster_cc_incremental: contracted-arrival labeling equals the " +
      "full recompute, and arrivals genuinely merge base components") {
    import org.apache.spark.sql.functions._
    val inc = graft.clustering.ClusterQueries.clusterCcIncremental(spark, sf)
    val full = graft.clustering.Clusterers.connectedComponents(
      graft.clustering.ClusterQueries.edges(spark, sf))
    assert(inc.count() > 0)
    assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty,
      "incremental labeling must equal the full recompute")
    // the split must exercise real merges at this SF: some base
    // component's root is relabeled by the arrival pass (otherwise the
    // contraction law was never load-bearing)
    val all = graft.clustering.ClusterQueries.edges(spark, sf)
    val e0 = all.filter(!(col("id1") % 5 === 0))
    val base = graft.clustering.Clusterers.connectedComponents(e0)
      .select(col("id"), col("cluster").as("base_cluster"))
    val mergedSome = inc.join(base, Seq("id"))
      .filter(col("cluster") =!= col("base_cluster")).count()
    assert(mergedSome > 0, "arrival edges must merge base components")
  }

  test("events_cube: one Expand pass produces every margin and the " +
      "margins reconcile with the cells") {
    import org.apache.spark.sql.functions._
    val df = graft.ExtraQueries.eventsCube(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    def n(r: org.apache.spark.sql.Row) = r.getLong(2)
    val byGid = rows.groupBy(_.getLong(4))
    assert(byGid.keySet == Set(0L, 1L, 2L, 3L), s"gids: ${byGid.keySet}")
    // margin law: each margin level's counts sum to the grand total
    val grand = n(byGid(3L).head)
    assert(byGid(3L).size == 1)
    Seq(0L, 1L, 2L).foreach { g =>
      assert(byGid(g).map(n).sum == grand, s"gid $g margins must reconcile")
    }
    // single-pass plan: CUBE compiles to Expand + one aggregate
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"cube must plan as Expand:\n$plan")
  }

  test("io_dpp_join: the fact scan carries a dynamicpruning partition " +
      "filter fed by the dim broadcast") {
    import org.apache.spark.sql.functions._
    val df = graft.io.IoQueries.ioDppJoin(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // urgent = priorities starting 1/2 only
    assert(rows.forall(r => Set("1", "2")(r.getString(0).substring(0, 1))))
    // the executed plan must prune the fact partitions DYNAMICALLY:
    // the dim filter lives on a derived dim-only column, so only the
    // runtime subquery can skip the non-urgent partitions
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"fact scan must carry a dynamicpruning partition filter:\n$plan")
  }

  test("fuse_incremental: reuse + affected-cluster recompute equals full " +
      "fusion, and the arrival actually changes fused rows") {
    import org.apache.spark.sql.functions._
    val inc = graft.fusion.FuseQueries.fuseIncremental(spark, sf)
    val full = graft.fusion.FuseQueries.fuseEngine(spark, sf)
    assert(inc.count() > 0)
    assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty,
      "incremental fusion must equal full fusion")
    // the arrival must be load-bearing: some affected cluster's fused
    // row differs from what the base-only fusion produced
    val src = graft.fusion.FuseQueries.sources(spark, sf)
    val baseOnly = src.filter(!(col("src") === "C" && col("cluster") % 7 === 0))
    val affectedChanged = inc
      .filter(col("cluster") % 7 === 0)
      .join(graft.fusion.Fusion.runEngine(baseOnly, "cluster",
          Seq("price" -> "average"))
          .select(col("cluster"), col("price").as("_base_price")),
        Seq("cluster"))
      .filter(col("price") =!= col("_base_price"))
      .count()
    assert(affectedChanged > 0, "arrival records must change fused values")
  }

  test("norm_fd_repair: every repaired row moves to its group majority, " +
      "clean groups are untouched, planted corruption is fixed") {
    import org.apache.spark.sql.functions._
    val rows = graft.normalization.NormQueries.normFdRepair(spark, sf).collect()
    assert(rows.nonEmpty)
    def key(r: org.apache.spark.sql.Row) = r.getAs[Number](0).longValue
    // within a determinant group the repaired value is constant
    rows.groupBy(_.getAs[Number](1).longValue).foreach { case (k, rs) =>
      assert(rs.map(_.getString(3)).distinct.length == 1,
        s"group $k: repaired value must be the single majority")
    }
    // was_repaired marks exactly the rows whose value differs
    rows.foreach { r =>
      assert(r.getBoolean(4) == (r.getString(2) != r.getString(3)))
    }
    // the planted corruption (custkey % 97 == 0) is repaired at this SF
    // (every nation has enough clean rows for the majority to win)
    val planted = rows.filter(key(_) % 97 == 0)
    assert(planted.nonEmpty && planted.forall(_.getBoolean(4)),
      "planted violations must be repaired")
    assert(rows.filterNot(key(_) % 97 == 0).forall(!_.getBoolean(4)),
      "clean rows must not be rewritten")
  }

  test("match_uncertainty_sample: the batch is the 20 boundary-nearest " +
      "pairs and sits where labels disagree") {
    val rows = graft.matching.MatchQueries
      .matchUncertaintySample(spark, sf).collect()
    assert(rows.length == 20)
    // ranks are 1..20 and distances ascend with rank
    assert(rows.map(_.getLong(0)).toSeq == (1L to 20L))
    val dists = rows.sortBy(_.getLong(0)).map(_.getLong(4))
    assert(dists.zip(dists.tail).forall { case (a, b) => a <= b })
    // the boundary batch genuinely mixes labels at this SF — the
    // uncertainty-sampling point (an all-gold or no-gold batch would
    // mean the threshold sits nowhere near the decision boundary)
    val golds = rows.map(_.getLong(5)).toSet
    assert(golds == Set(0L, 1L), s"expected mixed labels, got $golds")
  }

  test("sample_stratified: per stratum exactly min(k, n) rows survive and " +
      "they are the k smallest hashes — verified against a brute recompute") {
    import org.apache.spark.sql.functions._
    val out = graft.ExtraQueries.sampleStratified(spark, sf).collect()
    assert(out.nonEmpty)
    // brute-force truth: full customer table, JVM-side md5-nibble hash
    // (the same law Sketches.hash52 compiles to)
    def h52(key: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(key.toString.getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.substring(0, 13)
      java.lang.Long.parseLong(hex, 16)
    }
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_mktsegment"), col("c_custkey").cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val bySeg = cust.groupBy(_._1)
    val outBySeg = out.groupBy(_.getString(0))
    assert(outBySeg.keySet == bySeg.keySet)
    bySeg.foreach { case (seg, rows) =>
      val expect = rows.map(_._2).sortBy(k => (h52(k), k)).take(20).toSet
      val got = outBySeg(seg).map(_.getLong(3)).toSet
      assert(got == expect, s"stratum $seg: sample mismatch")
      val nTotal = outBySeg(seg).head.getLong(1)
      val nSampled = outBySeg(seg).head.getLong(2)
      assert(nTotal == rows.length.toLong)
      assert(nSampled == math.min(20L, nTotal) && got.size.toLong == nSampled)
    }
  }
}
