package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

/** Structured Streaming operators (SURVEY §2.12 #65). The transform is
  * written once against a DataFrame and used by BOTH the batch query
  * (which the DuckDB oracle checks) and the streaming query (readStream →
  * watermark → windowed agg), so stream results are batch-equivalent by
  * construction — the Spark unified-engine contract.
  */
object Streams {

  /** Tumbling 1-hour windowed aggregate per event type: count + exact
    * cents sum. Watermarking is applied only on the streaming path
    * (watermarks are a streaming-only concept).
    */
  def windowAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        (sum(graft.Tables.cents(col("value"))).cast("double") / 100.0).as("sum_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Streaming source over the events parquet dir (nanos ts → micros,
    * same as the batch reader), with a 2-hour watermark.
    */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // The parquet streaming source requires a DIRECTORY (in production
    // events land in one); the test fixture is a single file, so stage a
    // symlink dir next to the JVM tmpdir.
    val stage = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_stream_${dir.hashCode.toHexString}")
    java.nio.file.Files.createDirectories(stage)
    val link = stage.resolve("events.parquet")
    if (!java.nio.file.Files.exists(link))
      java.nio.file.Files.createSymbolicLink(link,
        java.nio.file.Paths.get(s"$dir/events.parquet"))
    val raw = spark.readStream.schema(schema).parquet(stage.toString)
    val ts =
      if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", timestamp_micros(floor(col("ts") / 1000).cast("long")))
      else raw
    ts.withWatermark("ts", "2 hours")
  }

  /** Run the streaming windowed agg to completion (AvailableNow) into an
    * in-memory sink and return the result — used by the spec to prove
    * stream ≡ batch.
    */
  def runStreamToBatch(spark: SparkSession, dir: String, queryName: String): DataFrame = {
    val q = windowAgg(eventsStream(spark, dir))
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
