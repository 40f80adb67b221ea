package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.blocking.{Blockers, EmScenario}
import graft.functions.sims
import graft.matching.{Matching, MatchQueries}

/** One-off decomposition of match_threshold_pick's cost (r11 bench:
  * ~15 s where its constituent solo queries sum to ~7.5 s). Times each
  * phase in isolation, twice (cold + warm).
  */
object PickProbe {
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
      println(f"PICKPROBE $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    for (rep <- 1 to 2) {
      println(s"--- rep $rep")
      val l = EmScenario.custL(spark, dir)
      val r = EmScenario.custR(spark, dir)
      val cands = Blockers.standard(l, r, Seq("seg", "nat"), "id")
      val scored = Matching.ruleMatch(cands, l, r, "id",
        Seq(
          sims.jaroWinkler(col("l_name"), col("r_name")) -> 0.6,
          sims.exactSim(col("l_seg"), col("r_seg")) -> 0.2,
          sims.numericAbsSim(col("l_bal"), col("r_bal"), 1000.0) -> 0.2),
        threshold = 0.0)
      val labels = Matching.sweepLabels(scored, EmScenario.gold(spark, dir)).persist()
      t("labels_materialize")(labels.count())
      val coarse = t("coarse_agg")(
        Matching.thresholdSweepLabeled(labels, (0 to 10).map(_ / 10.0)).collect())
      val thetaStar = coarse.minBy(x => (-x.getDouble(7), x.getDouble(0))).getDouble(0)
      val fineGrid = (-10 to 10).map(i => thetaStar + i / 100.0)
        .filter(x => x >= 0.0 && x <= 1.0)
      t("fine_agg")(Matching.thresholdSweepLabeled(labels, fineGrid).collect())
      t("calibration_collect")(MatchQueries.matchCalibration(spark, dir).collect())
      t("full_query")(MatchQueries.matchThresholdPick(spark, dir).collect())
      labels.unpersist(false)
      graft.Bench.clearSessionState(spark)
    }
    spark.stop()
  }
}
