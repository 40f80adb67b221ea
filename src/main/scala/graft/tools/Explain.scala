package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: prints the formatted physical plan of selected
  * queries so scan pruning (ReadSchema), pushed filters, join
  * strategies, and codegen spans can be reviewed per round.
  *
  * Usage: runMain graft.tools.Explain [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val mode = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_MODE", "formatted")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      // AQE hides codegen spans in pre-execution explain output
      .config("spark.sql.adaptive.enabled", mode != "codegen")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q2_nation_revenue", "block_standard", "match_rule", "fuse_numeric")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      graft.SparkEntry.queries(n)(spark, sfDir).explain(mode)
    }
    spark.stop()
  }
}
