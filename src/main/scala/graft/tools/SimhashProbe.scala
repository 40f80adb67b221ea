package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** One-off decomposition of dedup_simhash's cost (r11 driver bench:
  * 1.46 → 2.99 s with zero code change in dedup/ — the r12 judge ask
  * is "probe solo, name the cause"). Times each phase in isolation,
  * twice (cold + warm): the signature groupBy, the two half-bucket
  * self-joins, the union-distinct, and the full pipeline.
  */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"SIMHASHPROBE $label%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    for (rep <- 1 to 3) {
      println(s"--- rep $rep")
      val docs = graft.Tables.documents(spark, dir)
      val sig = graft.dedup.Dedup.simhashSig(docs, "doc_id", "text")
      t("sig_only")(sig.agg(count(lit(1))).collect())
      val halves = sig.select(col("doc_id").as("_id"),
        conv(col("simhash"), 2, 10).cast("long").as("_sig"),
        substring(col("simhash"), 1, 8).as("_b0"),
        substring(col("simhash"), 9, 8).as("_b1"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      t("halves_materialize")(halves.count())
      val cands = (0 until 2).map { b =>
        halves.select(col("_id").as("id1"), col("_sig").as("_s1"), col(s"_b$b").as("_bk"))
          .join(halves.select(col("_id").as("id2"), col("_sig").as("_s2"), col(s"_b$b").as("_bk")), "_bk")
          .filter(col("id1") < col("id2"))
          .select("id1", "id2", "_s1", "_s2")
      }
      val nPairs = t("band_joins_raw")(
        cands.reduce(_.unionByName(_)).agg(count(lit(1))).collect()(0).getLong(0))
      val nDistinct = t("union_distinct")(
        cands.reduce(_.unionByName(_)).distinct().agg(count(lit(1))).collect()(0).getLong(0))
      println(s"SIMHASHPROBE pairs raw=$nPairs distinct=$nDistinct")
      halves.unpersist(false)
      t("full_query")(graft.dedup.DedupQueries.dedupSimhash(spark, dir)
        .agg(count(lit(1))).collect())
      graft.Bench.clearSessionState(spark)
    }
    spark.stop()
  }
}
