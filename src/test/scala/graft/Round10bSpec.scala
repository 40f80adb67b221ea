package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.bottomk.bottomK
import graft.profiling.Sketches
import graft.streaming.Streams

/** Round-10 (session b): KMV / theta-sketch primitives and the
  * streaming CMS.
  *  - [[graft.functions.BottomK]] is a pure set property of the input
  *    (smallest k distinct longs): partition-invariant, shard-mergeable,
  *    planned as an ObjectHashAggregate with a map-side partial;
  *  - KMV estimates are exact below k and tight above it;
  *  - theta overlap estimation recovers a planted Jaccard;
  *  - [[Streams.cmsWindowCounters]] emits the identical counter cells
  *    from a real stateful streaming windowed agg.
  */
class Round10bSpec extends AnyFunSuite {
  import TestSpark._

  private def sketchOf(values: Seq[Long], k: Int, parts: Int): Seq[Long] = {
    val spark2 = spark
    import spark2.implicits._
    values.toDF("x").repartition(parts)
      .agg(bottomK(col("x"), k).as("ks"))
      .collect()(0).getSeq[Long](0)
  }

  test("bottom_k: equals sorted distinct take-k, partition-invariant, " +
      "and plans a partial ObjectHashAggregate") {
    val spark2 = spark
    import spark2.implicits._
    // duplicates + out-of-order arrivals
    val values: Seq[Long] = (1L to 500L).flatMap(i => Seq(i * 977 % 1009, i * 977 % 1009))
    val expected = values.distinct.sorted.take(16)
    assert(sketchOf(values, 16, 1) == expected)
    assert(sketchOf(values, 16, 7) == expected, "7-partition run must agree")
    // fewer distinct than k -> the sketch IS the distinct set
    assert(sketchOf(Seq(5L, 3L, 5L, 9L), 16, 3) == Seq(3L, 5L, 9L))
    val plan = values.toDF("x").repartition(7)
      .agg(bottomK(col("x"), 16).as("ks"))
    plan.collect()
    val exec = plan.queryExecution.executedPlan.toString
    assert(exec.contains("ObjectHashAggregate"),
      s"bottom_k must plan as ObjectHashAggregate (map-side partial), got:\n$exec")
    assert("partial_bottom_k|partial bottom_k|Partial".r.findFirstIn(exec).isDefined,
      s"expected a partial aggregation stage in:\n$exec")
  }

  test("bottom_k shard merge law: merging two shard sketches equals the " +
      "whole-input sketch (the property that makes KMV a sketch)") {
    val a = (1L to 300L).map(i => i * 7919 % 100003)
    val b = (1L to 300L).map(i => i * 104729 % 100003)
    val k = 32
    val ska = sketchOf(a, k, 3)
    val skb = sketchOf(b, k, 3)
    val merged = (ska ++ skb).distinct.sorted.take(k)
    assert(sketchOf(a ++ b, k, 5) == merged,
      "union-of-shards sketch must equal capped merge of shard sketches")
  }

  test("KMV estimate: exact below k, within 3 sigma above it") {
    val spark2 = spark
    import spark2.implicits._
    val k = 256
    def estOf(n: Int): Long =
      (1 to n).map(_.toString).toDF("x")
        .agg(bottomK(Sketches.hash52(col("x")), k).as("ks"))
        .select(Sketches.kmvEstimate(col("ks"), k).as("est"))
        .collect()(0).getLong(0)
    assert(estOf(200) == 200L, "below k the sketch is exact")
    val est = estOf(5000)
    // RSE ~ 1/sqrt(k-1) ~ 6.3%; 3 sigma ~ 19%
    assert(math.abs(est - 5000L) < 1000L,
      s"KMV estimate $est too far from true 5000")
  }

  test("theta overlap: planted Jaccard recovered within sketch error, " +
      "exact mode below k is exact") {
    val spark2 = spark
    import spark2.implicits._
    // A = 1..2000, B = 1001..3000: inter 1000, union 3000, J = 1/3
    val rows = (1 to 2000).map(i => ("A", i.toString)) ++
      (1001 to 3000).map(i => ("B", i.toString))
    val k = 256
    val sk = rows.toDF("grp", "shg").groupBy("grp")
      .agg(bottomK(Sketches.hash52(col("shg")), k).as("ks"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val thetaOf = (s: Seq[Long]) => if (s.size == k) s.last else Sketches.Hash52Space
    val theta = math.min(thetaOf(sk("A")), thetaOf(sk("B")))
    val ba = sk("A").filter(_ < theta).toSet
    val bb = sk("B").filter(_ < theta).toSet
    val jEst = 1000L * ba.intersect(bb).size / ba.union(bb).size
    assert(math.abs(jEst - 333L) < 150L, s"planted Jaccard 333 milli, estimated $jEst")
    val estInter = ba.intersect(bb).size * Sketches.Hash52Space / theta
    assert(math.abs(estInter - 1000L) < 500L, s"planted |A inter B| 1000, estimated $estInter")
    // below k: theta = full space, sketches are the exact hash sets
    val small = ((1 to 50).map(i => ("A", i.toString)) ++
      (26 to 75).map(i => ("B", i.toString))).toDF("grp", "shg")
    val sk2 = small.groupBy("grp")
      .agg(bottomK(Sketches.hash52(col("shg")), k).as("ks"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(sk2("A").toSet.intersect(sk2("B").toSet).size == 25,
      "exact mode must count the planted 25-element intersection exactly")
  }

  test("bottom_k_pairs: equals the relational replay (min payload per key, " +
      "order by key, limit k), partition-invariant, ObjectHashAggregate partial") {
    val spark2 = spark
    import spark2.implicits._
    import graft.functions.bottomk.bottomKPairs
    // duplicate keys with DIFFERENT payloads exercise the min-payload law
    val rows: Seq[(Long, Long)] =
      (1L to 400L).map(i => (i * 977 % 503, i)) ++
      (1L to 400L).map(i => (i * 977 % 503, i + 7))
    val k = 16
    val expected = rows.groupBy(_._1).view.mapValues(_.map(_._2).min)
      .toSeq.sortBy(_._1).take(k)
    def run(parts: Int): Seq[(Long, Long)] = {
      val df = rows.toDF("h", "v").repartition(parts)
        .agg(bottomKPairs(col("h"), col("v"), k).as("rs"))
      df.collect()(0).getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getLong(0), r.getLong(1)))
    }
    assert(run(1) == expected)
    assert(run(7) == expected, "7-partition run must agree (set property)")
    val plan = rows.toDF("h", "v").repartition(5)
      .agg(bottomKPairs(col("h"), col("v"), k).as("rs"))
    plan.collect()
    val exec = plan.queryExecution.executedPlan.toString
    assert(exec.contains("ObjectHashAggregate"),
      s"bottom_k_pairs must plan as ObjectHashAggregate, got:\n$exec")
  }

  test("quantile sketch law: sampled discrete quantiles of a planted " +
      "uniform 1..10000 land within 5% rank of truth at k=1024") {
    val spark2 = spark
    import spark2.implicits._
    import graft.functions.bottomk.bottomKPairs
    val k = 1024
    val df = (1L to 10000L).map(v => (v.toString, v)).toDF("id", "v")
    val sampled = df
      .agg(bottomKPairs(Sketches.hash52(col("id")), col("v"), k).as("rs"))
      .select(explode(col("rs")).as("p")).select(col("p.v").as("v"))
      .as[Long].collect().sorted
    assert(sampled.length == k)
    for (q <- Seq(250, 500, 750)) {
      val est = sampled((q * k + 999) / 1000 - 1) // 1-indexed rank → 0-index
      // value IS rank here (uniform 1..10000): 5% rank = ±500
      assert(math.abs(est - q * 10L) < 500L,
        s"q=$q: sampled quantile $est vs true ${q * 10} — outside 5% rank")
    }
  }

  test("SQ8: exact on the 256-level grid, top-k = exact top-k there; " +
      "bounded reconstruction error and a broadcast-corpus-stream plan off it") {
    val spark2 = spark
    import spark2.implicits._
    import graft.ann.Ann
    val dim = 4
    // components exactly on the 256-level grid of [0, 0.0255], with two
    // anchor rows pinning every dim's min to 0 and max to 255 so the
    // quantizer's range is exactly 255 steps: code = v_micro/1000,
    // recon = code·1000 = v_micro — lossless by construction
    val grid = (0L until 40L).map { i =>
      (i, (1 to dim).map(d => (i * 977 + d * 31) % 256 * 0.0001))
    } ++ Seq((100L, Seq.fill(dim)(0.0)), (101L, Seq.fill(dim)(0.0255)))
    val df = grid.toDF("vec_id", "v")
      .select(col("vec_id"), col("v").cast("array<double>").as("v"))
    val q = df.filter(col("vec_id") < 3)
    val sq = Ann.sq8TopK(q, df, "vec_id", "v", dim, k = 5)
      .select("qid", "rank", "vec_id", "_dist")
    val ex = Ann.microTopK(q, df, "vec_id", "v", dim, k = 5)
      .select("qid", "rank", "vec_id", "_dist")
    assert(sq.exceptAll(ex).isEmpty && ex.exceptAll(sq).isEmpty,
      "on-grid vectors must quantize losslessly: SQ8 ranks ≡ exact ranks")
    // off-grid: reconstruction error per dim < range/255 + 1 micro
    val off = (0L until 30L).map { i =>
      (i, (1 to dim).map(d => ((i * 613 + d * 97) % 1000) * 0.000777))
    }.toDF("vec_id", "v").select(col("vec_id"), col("v").cast("array<double>").as("v"))
    val qo = off.filter(col("vec_id") < 2)
    val sqo = Ann.sq8TopK(qo, off, "vec_id", "v", dim, k = 3)
    val exo = Ann.microTopK(qo, off, "vec_id", "v", dim, k = 3)
    // per-dim recon error e_d ≤ range_d/255 + 1 → the squared-distance
    // perturbation is bounded by Σ_d (2·range_d·e_d + e_d²), computed
    // from the ACTUAL per-dim ranges (no hand constants)
    val st = Ann.sq8Stats(off, "v", dim).collect()(0)
    val mns = st.getSeq[Long](0); val mxs = st.getSeq[Long](1)
    val bound = (0 until dim).map { j =>
      val range = mxs(j) - mns(j); val e = range / 255 + 1
      2L * range * e + e * e
    }.sum
    val sqTop = sqo.filter(col("rank") === 1).select("qid", "_dist")
      .as[(Long, Long)].collect().toMap
    val exTop = exo.filter(col("rank") === 1).select("qid", "_dist")
      .as[(Long, Long)].collect().toMap
    for ((qid, d) <- exTop) {
      assert(math.abs(sqTop(qid) - d) <= bound,
        s"q$qid: SQ8 top-1 dist ${sqTop(qid)} vs exact $d exceeds error bound $bound")
    }
    val exec = { val p = Ann.sq8TopK(q, df, "vec_id", "v", dim, 5); p.collect()
      p.queryExecution.executedPlan.toString }
    assert(exec.contains("BroadcastNestedLoopJoin"),
      s"queries must broadcast (corpus streams):\n$exec")
  }

  test("streaming reservoir: the windowed bottom-k-pairs agg emits a " +
      "reservoir bit-identical to the batch sketch across batches " +
      "(cross-batch state merge = capped union), StateStoreSave in plan") {
    import org.apache.spark.sql.execution.streaming.runtime.{MemoryStream, StreamingQueryWrapper}
    val spark2 = spark
    import spark2.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // two batches into the same day-1 window: the reservoir must merge
    val day1a = (1L to 300L).map(i => (ts("2024-01-01 06:00:00"), i, i * 13 % 997))
    val day1b = (301L to 500L).map(i => (ts("2024-01-01 18:00:00"), i, i * 13 % 997))
    val mem = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val q = Streams.reservoirWindow(
        mem.toDF.toDF("ts", "event_id", "v").withWatermark("ts", "1 hour"),
        "1 day", "event_id", col("v"), 64)
      .writeStream.format("memory").queryName("rsv_sink")
      .outputMode("append")
      .option("checkpointLocation", Streams.freshCheckpointDir("rsv_spec"))
      .start()
    try {
      mem.addData(day1a: _*)
      q.processAllAvailable()
      mem.addData(day1b: _*)
      q.processAllAvailable()
      mem.addData((ts("2024-01-03 12:00:00"), 9999L, 1L)) // close day 1
      q.processAllAvailable()
      val streamed = spark.table("rsv_sink")
        .filter($"window_start" === ts("2024-01-01 00:00:00"))
        .select(explode($"rs").as("p")).select("p.h", "p.v")
      val batch = Streams.reservoirWindow(
          (day1a ++ day1b).toDF("ts", "event_id", "v"), "1 day", "event_id",
          col("v"), 64)
        .select(explode($"rs").as("p")).select("p.h", "p.v")
      assert(streamed.count() == 64, "day-1 reservoir must have emitted k pairs")
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "streamed reservoir must equal the batch sketch exactly")
      val exec = q.asInstanceOf[StreamingQueryWrapper].streamingQuery.lastExecution
      assert(exec.executedPlan.toString.contains("StateStoreSave"),
        "must be a real stateful streaming aggregation")
    } finally q.stop()
  }

  test("sliding windows: append-mode streaming emission for closed windows " +
      "equals the batch sliding agg (every event in 4 overlapping windows)") {
    import org.apache.spark.sql.execution.streaming.runtime.{MemoryStream, StreamingQueryWrapper}
    val spark2 = spark
    import spark2.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // hours ascend across the two batches (0–11 then 12–23): batch 2
    // must stay ahead of the watermark batch 1 advanced, else its rows
    // are dropped as late and streamed ≠ batch by design
    val day1 = (0L until 120L).map(i =>
      (ts(f"2024-01-01 ${i / 5}%02d:30:00"), if (i % 2 == 0) "view" else "click", 1.0 + i))
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val q = Streams.slidingWindowAgg(
        mem.toDF.toDF("ts", "event_type", "value").withWatermark("ts", "1 hour"))
      .writeStream.format("memory").queryName("slide_sink")
      .outputMode("append")
      .option("checkpointLocation", Streams.freshCheckpointDir("slide_spec"))
      .start()
    try {
      mem.addData(day1.take(60): _*)
      q.processAllAvailable()
      mem.addData(day1.drop(60): _*)
      q.processAllAvailable()
      mem.addData((ts("2024-01-05 12:00:00"), "view", 1.0)) // close day-1 windows
      q.processAllAvailable()
      val streamed = spark.table("slide_sink")
        .filter($"window_end" <= ts("2024-01-03 00:00:00"))
      val batch = Streams.slidingWindowAgg(day1.toDF("ts", "event_type", "value"))
        .filter($"window_end" <= ts("2024-01-03 00:00:00"))
      assert(streamed.count() > 0, "closed sliding windows must have emitted")
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "streamed sliding-window rows must equal the batch agg exactly")
      // an event must appear in duration/slide = 4 windows
      val one = Streams.slidingWindowAgg(
          Seq((ts("2024-01-01 03:10:00"), "view", 2.0)).toDF("ts", "event_type", "value"))
      assert(one.count() == 4, "one event must land in exactly 4 sliding windows")
      val exec = q.asInstanceOf[StreamingQueryWrapper].streamingQuery.lastExecution
      assert(exec.executedPlan.toString.contains("StateStoreSave"),
        "must be a real stateful streaming aggregation")
    } finally q.stop()
  }

  test("session-c newcomers: sketch/evaluator outputs are CONSTANT-SIZE " +
      "across sf0.001 -> sf0.01 (the artifact, not the data, sets the row count)") {
    val contracts = Map(
      "profile_kmv" -> 1L, "profile_theta_overlap" -> 1L,
      "profile_join_size_est" -> 2L, "profile_quantile_sketch" -> 6L,
      "match_auc" -> 3L, "sample_hash_consistent" -> 1L)
    for ((q, n) <- contracts; sf <- Seq("sf0.001", "sf0.01")) {
      val c = SparkEntry.queries(q)(spark, s"/root/testdata/$sf").count()
      assert(c == n, s"$q at $sf: expected exactly $n rows, got $c")
    }
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val c = SparkEntry.queries("match_calibration")(spark, s"/root/testdata/$sf").count()
      assert(c <= 10, s"match_calibration at $sf: ≤ 10 decile bins, got $c")
    }
  }

  test("BFS: line-graph distances exact, cap honored, nearest-seed wins, " +
      "partition-invariant") {
    val spark2 = spark
    import spark2.implicits._
    import graft.graph.Bfs
    // line 1-2-3-4-5-6-7 plus isolated 9; seeds {1, 7}
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L))
      .toDF("id1", "id2")
    val seeds = Seq(1L, 7L).toDF("v")
    val got = Bfs.run(seeds, e.repartition(5), iters = 4)
      .as[(Long, Long)].collect().toMap
    // nearest seed: node 4 is 3 hops from both ends; 5 is 2 from seed 7
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L,
      5L -> 2L, 6L -> 1L, 7L -> 0L))
    // cap: single seed, iters 2 → nodes beyond 2 hops absent
    val capped = Bfs.run(Seq(1L).toDF("v"), e, iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(capped == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("integer Mann-Whitney AUC: hand-computed example with ties, " +
      "perfect and inverted separation edges") {
    val spark2 = spark
    import spark2.implicits._
    // pos scores {3, 2}, neg {2, 1}: U = 1+1+0.5+1 = 3.5 → AUC 0.875
    val tiny = Seq((1L, "t", 3L), (1L, "t", 2L), (0L, "t", 2L), (0L, "t", 1L))
      .toDF("label", "scorer", "s5")
    val r = graft.matching.Matching.aucByScorer(tiny).collect()(0)
    assert(r.getAs[Long]("auc_micro") == 875000L,
      s"hand-computed AUC 875000, got ${r.getAs[Long]("auc_micro")}")
    assert(r.getAs[Long]("u2") == 7L) // 2U carries the .5 exactly
    // perfect separation → 1e6; inverted → 0
    val perfect = Seq((1L, "p", 9L), (1L, "p", 8L), (0L, "p", 2L), (0L, "p", 1L))
      .toDF("label", "scorer", "s5")
    assert(graft.matching.Matching.aucByScorer(perfect)
      .collect()(0).getAs[Long]("auc_micro") == 1000000L)
    val inverted = Seq((0L, "i", 9L), (0L, "i", 8L), (1L, "i", 2L), (1L, "i", 1L))
      .toDF("label", "scorer", "s5")
    assert(graft.matching.Matching.aucByScorer(inverted)
      .collect()(0).getAs[Long]("auc_micro") == 0L)
    // all-tied → exactly 1/2 (pure chance)
    val tied = Seq((1L, "x", 5L), (1L, "x", 5L), (0L, "x", 5L), (0L, "x", 5L))
      .toDF("label", "scorer", "s5")
    assert(graft.matching.Matching.aucByScorer(tied)
      .collect()(0).getAs[Long]("auc_micro") == 500000L)
  }

  test("streaming CMS: stateful windowed agg emits the identical counter " +
      "cells the batch transform computes, with (window x d*w)-bounded state") {
    import org.apache.spark.sql.execution.streaming.runtime.{MemoryStream, StreamingQueryWrapper}
    val spark2 = spark
    import spark2.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val day1 = (1L to 200L).map(u => (ts("2024-01-01 06:00:00"), u % 37))
    val day1b = (1L to 90L).map(u => (ts("2024-01-01 18:00:00"), u % 11))
    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    val q = Streams.cmsWindowCounters(
        mem.toDF.toDF("ts", "user_id").withWatermark("ts", "1 hour"), "1 day")
      .writeStream.format("memory").queryName("cms_sink")
      .outputMode("append")
      .option("checkpointLocation", Streams.freshCheckpointDir("cms_spec"))
      .start()
    try {
      mem.addData(day1: _*)
      q.processAllAvailable()
      mem.addData(day1b: _*)
      q.processAllAvailable()
      // day-3 marker advances the watermark past day 1 -> its window closes
      mem.addData((ts("2024-01-03 12:00:00"), 9999L))
      q.processAllAvailable()
      val streamed = spark.table("cms_sink")
        .filter($"window_start" === ts("2024-01-01 00:00:00"))
        .select("j", "bucket", "c")
      val batch = Streams.cmsWindowCounters(
          (day1 ++ day1b).toDF("ts", "user_id"), "1 day")
        .select("j", "bucket", "c")
      assert(streamed.count() > 0, "day-1 window must have emitted")
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "streamed counter cells must equal the batch sketch exactly")
      val exec = q.asInstanceOf[StreamingQueryWrapper].streamingQuery.lastExecution
      assert(exec.executedPlan.toString.contains("StateStoreSave"),
        "must be a real stateful streaming aggregation")
    } finally q.stop()
  }
}
