package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off decomposition of stream_neardup's cost: banding alone, the
  * batch equivalent of the indexed join, and the full streaming run —
  * isolates streaming machinery from operator work.
  */
object NearDupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    import graft.dedup.Dedup
    import graft.streaming.Streams

    def timed(name: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"$name%-28s rep$i ${(System.nanoTime() - t0) / 1e9}%6.2f s  (n=$n)")
        graft.Bench.clearSessionState(spark)
      }
    }

    val corpus = graft.Tables.documents(spark, sfDir).select("doc_id", "text")

    timed("shingle_once")(Dedup.shingleFrame(corpus, "doc_id", "text", 3).count())

    timed("shingle_force_all") {
      val sh = Dedup.shingleFrame(corpus, "doc_id", "text", 3)
      sh.agg(expr("bit_xor(xxhash64(_id, _sh))")).collect()
      sh.count()
    }

    println("input partitions: " + corpus.rdd.getNumPartitions)

    timed("kernel_only") {
      val sh = Dedup.shingleFrame(corpus, "doc_id", "text", 3)
      sh.select(col("_id"),
        graft.functions.minhash.bandKeys(col("_sh"), 4, 3, md5Family = true).as("_bk"))
        .agg(expr("bit_xor(xxhash64(_id, _bk))")).collect()
      0L
    }

    Dedup.bandedLong(corpus, "doc_id", "text").explain("formatted")

    timed("band_no_sh") {
      val sh = Dedup.shingleFrame(corpus, "doc_id", "text", 3)
        .filter(size(col("_sh")) > 0)
      sh.select(col("_id"),
        posexplode(graft.functions.minhash.bandKeys(col("_sh"), 4, 3, md5Family = true))
          .as(Seq("_bidx", "_bkey"))).count()
    }

    timed("band_with_sh") {
      val sh = Dedup.shingleFrame(corpus, "doc_id", "text", 3)
        .filter(size(col("_sh")) > 0)
      sh.select(col("_id"), col("_sh"),
        posexplode(graft.functions.minhash.bandKeys(col("_sh"), 4, 3, md5Family = true))
          .as(Seq("_bidx", "_bkey"))).count()
    }

    timed("band_once_repart32")(
      Dedup.bandedLong(corpus.repartition(32), "doc_id", "text").count())

    timed("band_once")(Dedup.bandedLong(corpus, "doc_id", "text").count())

    timed("batch_indexed_join") {
      val index = Streams.nearDupIndex(corpus, "doc_id", "text")
      try {
        val hh = Dedup.hashFamily(spark)
        val sBands = Dedup.bandedLong(corpus, "doc_id", "text", 3, 4, 3, Some(hh))
        sBands.join(index, Seq("_bidx", "_bkey"))
          .filter(col("_id") =!= col("_cid"))
          .filter(round(size(array_intersect(col("_sh"), col("_csh"))).cast("double")
            / size(array_union(col("_sh"), col("_csh"))), 5) >= 0.8)
          .select(col("_id").as("doc_id"))
          .dropDuplicates(Seq("doc_id")).count()
      } finally ()
    }

    timed("full_stream")(graft.ExtraQueries.streamNearDup(spark, sfDir).count())

    spark.stop()
  }
}
