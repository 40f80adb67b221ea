package graft.tools
import org.apache.spark.sql.SparkSession
object FitProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.tune(SparkSession.builder()
      .master("local[16]").config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import graft.functions.sims
    import graft.blocking.{Blockers, EmScenario}
    val dir = "/root/testdata/sf0.01"
    val l = EmScenario.custL(spark, dir); val r = EmScenario.custR(spark, dir)
    val cands = Blockers.standard(l, r, Seq("seg", "nat"), "id")
    val features = Seq(
      "f_jw" -> sims.jaroWinkler(col("l_name"), col("r_name")),
      "f_lev" -> sims.levenshteinSim(col("l_name"), col("r_name")),
      "f_bal" -> sims.numericAbsSim(col("l_bal"), col("r_bal"), 1000.0),
      "f_seg" -> sims.exactSim(col("l_seg"), col("r_seg")))
    val labeled = graft.matching.MlMatcher.labeledFeatures(cands, l, r, "id", features, EmScenario.gold(spark, dir))
    import org.apache.spark.ml.feature.VectorAssembler
    import org.apache.spark.ml.classification.LogisticRegression
    val assembler = new VectorAssembler().setInputCols(features.map(_._1).toArray).setOutputCol("features")
    val bucket = pmod(xxhash64(col("id1"), col("id2")), lit(1000L))
    val train = assembler.transform(labeled.filter(col("label") === 1.0 || bucket < 100))
    val model = new LogisticRegression().setMaxIter(10).setRegParam(0.01)
      .setStandardization(true).setLabelCol("label").setFeaturesCol("features").fit(train)
    println("COEFS " + model.coefficients.toArray.mkString(", ") + " INTERCEPT " + model.intercept)
    spark.stop()
  }
}
