package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Local measurement aid (not part of the driver contract): times the
  * MinHash+LSH pipeline under the md5 oracle-parity hash family vs the
  * xxhash64 cluster family (identical join shapes, different per-
  * shingle hash cost) — quantifies what oracle replayability costs and
  * what flipping the one-line hash site buys at scale.
  */
object HashBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, sfDir)
    for ((name, fam) <- Seq("md5" -> Dedup.Md5Hash, "xxhash64" -> Dedup.XxHash)) {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val out = Dedup.minhashLsh(docs, "doc_id", "text",
          n = 3, bands = 4, rows = 3, threshold = 0.8, hashHex = Some(fam))
        val n = out.count()
        graft.Bench.clearSessionState(spark)
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"HASHBENCH $name%-9s pairs=${times.head._2}%5d  " +
        times.map(t => f"${t._1}%6.2f").mkString(" "))
    }
    spark.stop()
  }
}
