package graft.matching

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule-based entity matching + evaluation — the Spark re-expression of
  * PyDI/entitymatching/rule_based.py:16 (LinearCombinationMatchingRule
  * semantics) and PyDI/entitymatching/evaluation.py:25.
  *
  * The reference iterates candidate pairs in Python and calls comparator
  * closures per pair; here the whole match is ONE declarative plan:
  * candidates ⋈ left ⋈ right → a codegen'd projection computing every
  * comparator → weighted sum → threshold filter. No per-pair interpreter,
  * no shuffle beyond the two record joins (which AQE sizes at runtime).
  */
object Matching {

  /** Join candidate pairs `(id1, id2)` back to their records. All left
    * record columns come out prefixed `l_`, right ones `r_`.
    */
  def attachRecords(candidates: DataFrame, left: DataFrame, right: DataFrame,
      idCol: String): DataFrame = {
    val l = left.columns.foldLeft(left)((d, c) => d.withColumnRenamed(c, s"l_$c"))
    val r = right.columns.foldLeft(right)((d, c) => d.withColumnRenamed(c, s"r_$c"))
    candidates.select("id1", "id2")
      .join(l, col("id1") === col(s"l_$idCol"))
      .join(r, col("id2") === col(s"r_$idCol"))
  }

  /** Weighted linear rule: score = Σ wᵢ·simᵢ over the attached-record
    * frame; keep pairs with score ≥ threshold. Comparator columns refer
    * to `l_...` / `r_...` columns (see [[attachRecords]]).
    */
  def ruleMatch(candidates: DataFrame, left: DataFrame, right: DataFrame, idCol: String,
      comparators: Seq[(Column, Double)], threshold: Double): DataFrame = {
    val score = comparators
      .map { case (c, w) => c * lit(w) }
      .reduce(_ + _)
    attachRecords(candidates, left, right, idCol)
      .withColumn("_score", score)
      .filter(col("_score") >= threshold)
      .select(col("id1"), col("id2"), round(col("_score"), 5).as("score"))
  }

  /** threshold_sweep (evaluation.py:861): P/R/F1 across a grid of
    * matching-rule thresholds. The reference re-runs the evaluator once
    * per θ; here candidates are scored ONCE, the (tiny) grid is exploded
    * against the gold-outer-joined labels, and a single aggregation
    * yields every sweep row — one scan + one shuffle no matter how many
    * thresholds. `scored` must carry (id1, id2, score); comparisons use
    * the score as given (round it consistently with the oracle first).
    */
  def thresholdSweep(scored: DataFrame, gold: DataFrame,
      thresholds: Seq[Double]): DataFrame =
    thresholdSweepLabeled(sweepLabels(scored, gold), thresholds)

  /** The (score, gold-flag) label frame the sweep counters aggregate —
    * the expensive half of a sweep (candidate re-agg + full-outer gold
    * join). Exposed so a multi-grid caller (match_threshold_pick's
    * two-phase zoom) builds it ONCE, checkpoints the narrow 2-column
    * frame, and re-aggregates per grid instead of re-joining.
    */
  def sweepLabels(scored: DataFrame, gold: DataFrame): DataFrame = {
    val p = scored.groupBy("id1", "id2").agg(max(col("score")).as("_score"))
    val g = gold.select("id1", "id2").distinct().withColumn("_gold", lit(1L))
    p.join(g, Seq("id1", "id2"), "full_outer")
      .select(col("_score"), coalesce(col("_gold"), lit(0L)).as("_gold"))
  }

  def thresholdSweepLabeled(labeled: DataFrame,
      thresholds: Seq[Double]): DataFrame = {
    // ONE conditional-aggregation pass: 3 counters per θ as columns of a
    // single global aggregate (map-side partial to one row per task),
    // then the tiny grid unpacks to rows. The previous explode-per-θ
    // multiplied the labeled frame |grid|× before the shuffle — the
    // wrong shape when candidates are 10¹⁰ rows and the grid is 11.
    val counters = thresholds.zipWithIndex.flatMap { case (t, i) =>
      Seq(
        sum(when(col("_score") >= t && col("_gold") === 1L, 1L).otherwise(0L))
          .as(s"_tp$i"),
        sum(when(col("_score") >= t && col("_gold") === 0L, 1L).otherwise(0L))
          .as(s"_fp$i"),
        sum(when((col("_score").isNull || col("_score") < t) && col("_gold") === 1L, 1L)
          .otherwise(0L)).as(s"_fn$i"))
    }
    val wide = labeled.agg(counters.head, counters.tail: _*)
    val rows = explode(array(thresholds.zipWithIndex.map { case (t, i) =>
      struct(lit(t).as("threshold"), col(s"_tp$i").as("tp"),
        col(s"_fp$i").as("fp"), col(s"_fn$i").as("fn"))
    }: _*)).as("r")
    wide.select(rows).select(col("r.*"))
      .select(col("threshold"), col("tp"), col("fp"), col("fn"),
        (col("tp") + col("fp")).as("n_pred"),
        round(col("tp") / greatest(col("tp") + col("fp"), lit(1L)), 5).as("precision"),
        round(col("tp") / greatest(col("tp") + col("fn"), lit(1L)), 5).as("recall"),
        round(col("tp") * 2.0 / greatest(lit(2L) * col("tp") + col("fp") + col("fn"), lit(1L)), 5)
          .as("f1"))
      .orderBy("threshold")
  }

  /** P/R/F1 of predicted correspondences vs gold pairs
    * (evaluation.py:25 evaluate with all-positive test pairs).
    */
  def evaluate(predicted: DataFrame, gold: DataFrame): DataFrame = {
    val p = predicted.select("id1", "id2").distinct()
    val g = gold.select("id1", "id2").distinct()
    val tp = p.join(g, Seq("id1", "id2")).agg(count(lit(1)).as("tp"))
    val pn = p.agg(count(lit(1)).as("n_pred"))
    val gn = g.agg(count(lit(1)).as("n_gold"))
    tp.crossJoin(pn).crossJoin(gn).select(
      col("tp"),
      (col("n_pred") - col("tp")).as("fp"),
      (col("n_gold") - col("tp")).as("fn"),
      round(col("tp") / greatest(col("n_pred"), lit(1L)), 5).as("precision"),
      round(col("tp") / greatest(col("n_gold"), lit(1L)), 5).as("recall"),
      round(col("tp") * 2.0 / greatest(col("n_pred") + col("n_gold"), lit(1L)), 5).as("f1"))
  }

  /** evaluate_matching with LABELED test pairs (evaluation.py:415):
    * `testPairs` carries a 0/1 `label`; metrics are computed over the
    * test-pair universe (the reference's semantics — predictions
    * outside the labeled pairs are ignored), so negatives yield tn and
    * accuracy in addition to P/R/F1. One left join + one aggregate.
    */
  def evaluateLabeled(predicted: DataFrame, testPairs: DataFrame): DataFrame = {
    val p = predicted.select("id1", "id2").distinct().withColumn("_pred", lit(1L))
    val joined = testPairs.select(col("id1"), col("id2"), col("label").cast("long").as("_l"))
      .distinct()
      .join(p, Seq("id1", "id2"), "left")
      .select(col("_l"), coalesce(col("_pred"), lit(0L)).as("_p"))
    joined.agg(
        sum(when(col("_l") === 1L && col("_p") === 1L, 1L).otherwise(0L)).as("tp"),
        sum(when(col("_l") === 0L && col("_p") === 1L, 1L).otherwise(0L)).as("fp"),
        sum(when(col("_l") === 1L && col("_p") === 0L, 1L).otherwise(0L)).as("fn"),
        sum(when(col("_l") === 0L && col("_p") === 0L, 1L).otherwise(0L)).as("tn"))
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        round(col("tp") / greatest(col("tp") + col("fp"), lit(1L)), 5).as("precision"),
        round(col("tp") / greatest(col("tp") + col("fn"), lit(1L)), 5).as("recall"),
        round(col("tp") * 2.0 / greatest(lit(2L) * col("tp") + col("fp") + col("fn"), lit(1L)), 5)
          .as("f1"),
        round((col("tp") + col("tn")) /
          greatest(col("tp") + col("fp") + col("fn") + col("tn"), lit(1L)), 5).as("accuracy"))
  }

  /** Mann-Whitney AUC in exact integer arithmetic, per scorer, from a
    * frame of (label ∈ {0,1}, scorer, s5: integer score): average
    * ranks via the identity 2·r̄ = 2·rank + tie_count − 1 (`rank()` is
    * the min-rank of a tie group), U from the rank-sum, AUC in integer
    * micro — no float division, so the metric hash-gates against a
    * relational oracle. Rank windows are per scorer over the LABELED
    * set (gold-bounded by construction at any corpus size).
    */
  def aucByScorer(labeledScores: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.profiling.Sketches.idiv
    val r2 = labeledScores.withColumn("r2",
      lit(2L) * rank().over(Window.partitionBy("scorer").orderBy("s5")).cast("long")
        + count(lit(1)).over(Window.partitionBy("scorer", "s5")) - 1L)
    r2.groupBy("scorer").agg(
        sum(col("label")).cast("long").as("n_pos"),
        sum(lit(1L) - col("label")).cast("long").as("n_neg"),
        sum(when(col("label") === 1L, col("r2")).otherwise(0L)).as("rank2_sum"))
      .select(col("scorer"), col("n_pos"), col("n_neg"), col("rank2_sum"),
        (col("rank2_sum") - col("n_pos") * (col("n_pos") + 1L)).as("u2"),
        idiv((col("rank2_sum") - col("n_pos") * (col("n_pos") + 1L)) * 1000000L,
          lit(2L) * col("n_pos") * col("n_neg")).as("auc_micro"))
  }
}
