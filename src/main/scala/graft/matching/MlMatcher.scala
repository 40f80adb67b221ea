package graft.matching

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MLBasedMatcher — the Spark re-expression of
  * PyDI/entitymatching/ml_based.py:21 (sklearn on comparator features):
  * comparator columns → VectorAssembler → spark.ml LogisticRegression,
  * trained on labeled candidate pairs and scored distributed. This also
  * covers feature_extraction.py (the assembler stage, SURVEY §2.9 #37).
  */
object MlMatcher {

  /** Attach comparator feature columns and a 0/1 label from gold. */
  def labeledFeatures(candidates: DataFrame, left: DataFrame, right: DataFrame,
      idCol: String, features: Seq[(String, Column)], gold: DataFrame): DataFrame = {
    val attached = Matching.attachRecords(candidates, left, right, idCol)
    val withF = features.foldLeft(attached) { case (d, (name, c)) => d.withColumn(name, c) }
    withF.join(gold.select(col("id1"), col("id2"), lit(1.0).as("label")),
        Seq("id1", "id2"), "left")
      .na.fill(0.0, Seq("label"))
      .select(Seq(col("id1"), col("id2"), col("label")) ++ features.map(f => col(f._1)): _*)
  }

  /** Train LR on the labeled pairs and score them: returns
    * (id1, id2, probability, prediction). The reference trains sklearn
    * on a driver-side frame; here training data and scoring are both
    * distributed (LBFGS aggregates gradients like any Spark agg).
    */
  def fitPredict(labeled: DataFrame, featureCols: Seq[String],
      trainFraction: Double = 0.1): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // The labeled feature frame feeds BOTH the training subset and the
    // final scoring pass — persist it so the comparator expressions run
    // once per pair, not twice.
    val cached = labeled.persist(lvl)
    // VECTOR ASSEMBLY ONLY ON THE TRAINING SUBSET: spark.ml needs its
    // vector column for LBFGS, but the full-corpus scoring below uses
    // the fitted coefficients as a plain codegen'd column expression —
    // so the ml-pipeline UDF path (assembler + probability UDF) touches
    // only the ~trainFraction sample, never the full pair frame. At
    // scoring scale that is the difference between a whole-stage-
    // codegen'd projection and a per-row UDF over every candidate.
    val assembler = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
    // Deterministic hash-sampled training subset (partitioning-
    // independent, unlike .sample); ALL candidates are scored. Positives
    // are always kept — they are the rare class.
    val bucket = pmod(xxhash64(col("id1"), col("id2")), lit(1000L))
    val train = assembler.transform(
        cached.filter(col("label") === 1.0 || bucket < (trainFraction * 1000).toInt))
      .persist(lvl)
    try {
      // standardization stays ON: with regParam 0.01 the unstandardized
      // fit under-weights the name features and precision drops below
      // the MlStreamSpec ≥0.99 gate (measured 0.90).
      val lr = new LogisticRegression()
        .setMaxIter(10).setRegParam(0.01).setStandardization(true)
        .setLabelCol("label").setFeaturesCol("features")
      val model = lr.fit(train)
      // Score with the fitted model AS ARITHMETIC: margin = w·x + b over
      // the plain feature columns (Spark ML returns coefficients in the
      // ORIGINAL feature space even with internal standardization), then
      // probability = sigmoid(margin), prediction = margin > 0 — exactly
      // model.transform's default-threshold law, but whole-stage codegen.
      val w = model.coefficients.toArray
      val margin = featureCols.zipWithIndex
        .map { case (f, i) => col(f) * lit(w(i)) }
        .reduce(_ + _) + lit(model.intercept)
      // Eager materialization (narrow 4-column scores) lets the finally
      // release the cached frames instead of leaking them into the
      // session (round-3 verdict: no persist was ever released).
      cached
        .select(col("id1"), col("id2"),
          round(lit(1.0) / (lit(1.0) + exp(-margin)), 5).as("match_prob"),
          (margin > 0).cast("long").as("prediction"))
        .localCheckpoint(true)
    } finally { train.unpersist(false); cached.unpersist(false) }
  }
}
