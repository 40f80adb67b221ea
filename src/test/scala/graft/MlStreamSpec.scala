package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.blocking.EmScenario
import graft.matching.Matching
import graft.streaming.Streams
import graft.Tables

class MlStreamSpec extends AnyFunSuite {
  import TestSpark._

  test("ML matcher separates gold pairs from noise (rows-only query, quality gated here)") {
    val pred = ExtraQueries.matchMl(spark, sf)
    val m = Matching.evaluate(pred, EmScenario.gold(spark, sf)).collect()(0)
    assert(m.getAs[Double]("recall") >= 0.99, s"recall too low: $m")
    assert(m.getAs[Double]("precision") >= 0.99, s"precision too low: $m")
  }

  test("streaming windowed agg equals the batch query (AvailableNow run)") {
    val batch = ExtraQueries.streamWindowAgg(spark, sf)
    val stream = Streams.runStreamToBatch(spark, sf, "stream_spec_sink")
      .orderBy("window_start", "event_type")
    val b = batch.collect().map(_.toSeq)
    val st = stream.collect().map(_.toSeq)
    assert(b.length == st.length && b.length > 0)
    assert(b.zip(st).forall { case (x, y) => x == y })
  }

  test("streaming sessionization (flatMapGroupsWithState) equals batch sessions") {
    val batch = Streams.sessionizeBatch(Tables.events(spark, sf), 30)
      .select("user_id", "session_start", "session_end", "n_events")
      .collect().map(_.toSeq).toSet
    val q = Streams.sessionizeStream(Streams.eventsStream(spark, sf), 30)
      .writeStream.format("memory").queryName("sessionize_sink")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val stream = spark.table("sessionize_sink").collect().map(_.toSeq).toSet
    assert(batch.nonEmpty && batch == stream)
  }

  test("multimodal feature extraction: digest matches driver-side md5") {
    val rows = ExtraQueries.mmBinaryMeta(spark, sf).limit(3).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("digest").length == 32)
      assert(r.getAs[Long]("n_bytes") > 0)
    }
  }

  test("streaming dedup drops within-watermark duplicate keys") {
    import org.apache.spark.sql.functions._
    // dedicated stage dir with the source linked TWICE → every event
    // arrives duplicated on the stream
    val stage = java.nio.file.Files.createTempDirectory("graft_dedup_stream")
    stage.toFile.deleteOnExit()
    Seq("a.parquet", "b.parquet").foreach { n =>
      java.nio.file.Files.createSymbolicLink(stage.resolve(n),
        java.nio.file.Paths.get(s"$sf/events.parquet"))
    }
    val schema = spark.read.parquet(s"$sf/events.parquet").schema
    // same dtype guard as Streams.eventsStream: the nano→micros convert
    // applies only when ts actually inferred as long (nanosAsLong path);
    // under other session conf it already reads as TIMESTAMP.
    val raw0 = spark.readStream.schema(schema).parquet(stage.toString)
    val raw = (if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw0.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else raw0)
      .withWatermark("ts", "2 hours")
    val q = Streams.dedupStream(raw, Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_sink")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("dedup_sink").count()
    val want = Tables.events(spark, sf).count()
    assert(got == want, s"expected $want deduped events, got $got")
  }

  test("buffered streaming as-of recovers late views; plain variant's contract output pinned") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    def s(sec: Long): Long = sec * 1000000L // event-time µs
    streamAsofBufferedBody(spark2, s, sq)
  }

  test("contaminationStream: stream-static semi join flags docs across batches, emits once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val probes = graft.text.TextOps.ngramSet(
      Seq("the secret eval answer is here").toDF("text"), "text", 3)
    val mem = MemoryStream[(Long, String)]
    val src = mem.toDF().toDF("doc_id", "text")
    val q = graft.streaming.Streams.contaminationStream(src, probes, "doc_id", "text", 3)
      .writeStream.format("memory").queryName("graft_spec_contam")
      .outputMode("append").start()
    try {
      mem.addData((1L, "clean doc with no overlap at all"),
        (2L, "contains the secret eval answer is here verbatim"))
      q.processAllAvailable()
      // batch 2: another contaminated doc + doc 2 again (must NOT re-emit)
      mem.addData((3L, "prefix the secret eval answer trailing"),
        (2L, "contains the secret eval answer is here verbatim"))
      q.processAllAvailable()
      val out = spark.table("graft_spec_contam").collect().map(_.getLong(0)).sorted
      assert(out.toSeq == Seq(2L, 3L), s"flagged: ${out.toSeq}")
    } finally q.stop()
  }

  private def streamAsofBufferedBody(spark2: org.apache.spark.sql.SparkSession,
      s: Long => Long, sq: org.apache.spark.sql.SQLContext): Unit = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import spark2.implicits._
    implicit val sqc: org.apache.spark.sql.SQLContext = sq

    def feed(name: String, mk: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
        : Seq[(Long, Long, Long, Option[Long])] = {
      val mem = MemoryStream[(Long, Long, String, Long)]
      val src = mem.toDF().toDF("user_id", "us", "event_type", "event_id")
        .withColumn("ts", timestamp_micros(col("us")))
        .withWatermark("ts", "1 minute")
      val q = mk(src).writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        // batch 1: view@10s then purchase@100s
        mem.addData((1L, s(10), "view", 1000L), (1L, s(100), "purchase", 1L))
        q.processAllAvailable()
        // batch 2: LATE view@50s — earlier event time than the already
        // arrived purchase@100s (ordered-ingest violation) — plus a
        // watermark advancer at 300s
        mem.addData((1L, s(50), "view", 2000L), (1L, s(300), "view", 3000L))
        q.processAllAvailable()
        // batch 3: unrelated key; advances processing so event-time
        // timeouts fire (watermark is already at 240s)
        mem.addData((2L, s(301), "view", 4000L))
        q.processAllAvailable()
      } finally q.stop()
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSeq
    }

    // buffered: purchase@100s is HELD past batch 1 (watermark 0), so the
    // late view@50s lands first and wins the as-of match
    val buffered = feed("asof_buf_sink", Streams.asofStreamBuffered)
    assert(buffered == Seq((1L, s(100), 1L, Some(2000L))))

    // plain variant: enriches on arrival — the documented ordered-ingest
    // contract means the late view is NOT seen; this pins that output
    val plain = feed("asof_plain_sink", Streams.asofStream)
    assert(plain == Seq((1L, s(100), 1L, Some(1000L))))
  }

  test("multimodal resize + frame sampling plumbing") {
    import graft.multimodal.Multimodal
    val media = Multimodal.syntheticMedia(
      Tables.customer(spark, sf).limit(4), "c_custkey", "c_name")
    val resized = Multimodal.resize(media, 32, 24).collect()
    assert(resized.forall(r => r.width == 32 && r.height == 24 && r.media.length == 16))
    // names are 18 chars → 4 frames of 5 bytes (last partial dropped by /)
    val frames = Multimodal.frameSample(media, frameBytes = 5, everyN = 2).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.getInt(2) % 2 == 0))
    assert(frames.forall(_.getString(3).length <= 5))
  }
}
