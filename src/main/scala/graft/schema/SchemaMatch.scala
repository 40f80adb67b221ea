package graft.schema

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.sims

/** Schema matching — the Spark re-expression of PyDI/schemamatching/
  * {label_based,instance_based,duplicate_based,evaluation}.py.
  */
object SchemaMatch {

  /** LabelBasedSchemaMatcher (label_based.py:17): similarity between
    * column NAMES. The header frames have one row per column name — data
    * is never scanned; the cross join is trivially small (k×k).
    */
  def labelBased(spark: SparkSession, sourceCols: Seq[String], targetCols: Seq[String],
      threshold: Double): DataFrame = {
    import spark.implicits._
    val src = sourceCols.toDF("source_col")
    val tgt = targetCols.toDF("target_col")
    src.crossJoin(tgt)
      .select(col("source_col"), col("target_col"),
        round(sims.jaroWinkler(lower(col("source_col")), lower(col("target_col"))), 5)
          .as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Unpivot listed columns to (column_name, value) with distinct
    * string-cast values — the instance matcher's column signature.
    */
  def columnValues(df: DataFrame, cols: Seq[String]): DataFrame =
    // ONE scan: explode (column, value) structs — a union of per-column
    // selects is k separate scans+distincts of the same input to
    // Catalyst (no cross-branch CSE); the distinct lands on the stacked
    // frame either way (r8, same fix as Profiler.unpivotAgg)
    df.select(explode(array(cols.map(c =>
        struct(lit(c).as("column_name"), col(c).cast("string").as("value"))): _*)).as("__m"))
      .select(col("__m.*"))
      .filter(col("value").isNotNull)
      .distinct()

  /** InstanceBasedSchemaMatcher (instance_based.py:20, binary_occurrence
    * vectors + jaccard): distinct-value-set overlap between every column
    * pair. One shuffle on the value; only intersecting pairs surface.
    */
  def instanceBased(left: DataFrame, leftCols: Seq[String], right: DataFrame,
      rightCols: Seq[String], threshold: Double): DataFrame = {
    val lv = columnValues(left, leftCols)
    val rv = columnValues(right, rightCols)
    val sizes = (v: DataFrame, out: String) =>
      v.groupBy(col("column_name").as(out)).agg(count(lit(1)).as(s"_n_$out"))
    val inter = lv.select(col("column_name").as("col_l"), col("value"))
      .join(rv.select(col("column_name").as("col_r"), col("value")), "value")
      .groupBy("col_l", "col_r").agg(count(lit(1)).as("_i"))
    inter
      .join(sizes(lv, "col_l"), "col_l")
      .join(sizes(rv, "col_r"), "col_r")
      .select(col("col_l"), col("col_r"),
        round(col("_i") / (col("_n_col_l") + col("_n_col_r") - col("_i")), 5).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** DuplicateBasedSchemaMatcher (duplicate_based.py:17): known duplicate
    * record pairs vote for attribute correspondences by value-agreement
    * rate. One join of the gold pairs against each side, then a single
    * aggregation computing all attribute-pair agreement shares.
    */
  def duplicateBased(gold: DataFrame, left: DataFrame, right: DataFrame, idCol: String,
      leftCols: Seq[String], rightCols: Seq[String]): DataFrame = {
    val l = left.columns.foldLeft(left)((d, c) => d.withColumnRenamed(c, s"l_$c"))
    val r = right.columns.foldLeft(right)((d, c) => d.withColumnRenamed(c, s"r_$c"))
    val joined = gold.select("id1", "id2")
      .join(l, col("id1") === col(s"l_$idCol"))
      .join(r, col("id2") === col(s"r_$idCol"))
    val aggs = for (lc <- leftCols; rc <- rightCols) yield
      avg(when(col(s"l_$lc").cast("string") === col(s"r_$rc").cast("string"), 1.0)
        .otherwise(0.0)).as(s"__ag_${lc}__$rc")
    val row = joined.agg(aggs.head, aggs.tail: _*)
    // explode the 1-row agg — unioned per-pair selects would re-run the
    // gold⋈left⋈right join once per attribute pair (r8)
    val entries = for (lc <- leftCols; rc <- rightCols) yield
      struct(lit(lc).as("col_l"), lit(rc).as("col_r"),
        round(col(s"__ag_${lc}__$rc"), 5).as("agreement"))
    row.select(explode(array(entries: _*)).as("__m")).select(col("__m.*"))
  }

  /** SchemaMappingEvaluator (schemamatching/evaluation.py): P/R/F1 of a
    * predicted mapping vs gold correspondences.
    */
  def evaluate(predicted: DataFrame, gold: DataFrame): DataFrame =
    graft.matching.Matching.evaluate(
      predicted.select(col("source_col").as("id1"), col("target_col").as("id2")),
      gold.select(col("source_col").as("id1"), col("target_col").as("id2")))

  /** SchemaMappingEvaluator.sweep_thresholds (evaluation.py:158): the
    * Winter-style evaluation counts across a θ grid. The reference
    * re-runs `evaluate` once per θ; here the correspondence tuples are
    * labeled ONCE against the evaluation mapping and one
    * conditional-aggregation pass yields every grid row — the
    * [[graft.matching.Matching.thresholdSweep]] idiom transplanted onto
    * correspondence frames: one scan + bounded shuffles no matter how
    * many thresholds.
    *
    * Reference semantics preserved exactly:
    *   - a tuple passes θ iff ANY of its corr rows does (set built
    *     after the filter) → per-tuple max score;
    *   - matching is symmetric — either orientation hits a positive or
    *     negative; the canonical is the positive's own orientation,
    *     forward preferred when both orientations are positives;
    *   - `correct` counts DISTINCT canonical positives matched;
    *     `matched` counts predicted tuples that hit a positive, an
    *     explicit negative, or (complete mode) anything;
    *   - `missing` = positives never matched at that θ.
    *
    * `corr`: (source_col, target_col, score). `evalSet`: (source_col,
    * target_col[, label: boolean]) — no label column means all
    * positives, as in the reference.
    */
  def sweepThresholds(corr: DataFrame, evalSet: DataFrame,
      thresholds: Seq[Double], complete: Boolean = false,
      labelCol: String = "label"): DataFrame = {
    val ev = if (evalSet.columns.contains(labelCol)) evalSet
             else evalSet.withColumn(labelCol, lit(true))
    val pos = ev.filter(col(labelCol)).select("source_col", "target_col").distinct()
    val neg = ev.filter(!col(labelCol)).select("source_col", "target_col").distinct()

    val corrT = corr.groupBy(col("source_col").as("_s"), col("target_col").as("_t"))
      .agg(max(col("score")).as("_score"))

    // both orientations of each positive, carrying its canonical tuple;
    // _dir breaks ties in favor of the forward orientation
    val posB = pos.select(col("source_col").as("_a"), col("target_col").as("_b"),
        struct(col("source_col"), col("target_col")).as("_canon"), lit(0).as("_dir"))
      .unionByName(pos.select(col("target_col").as("_a"), col("source_col").as("_b"),
        struct(col("source_col"), col("target_col")).as("_canon"), lit(1).as("_dir")))
    val negB = neg.select(col("source_col").as("_na"), col("target_col").as("_nb"))
      .unionByName(neg.select(col("target_col").as("_na"), col("source_col").as("_nb")))
      .distinct()

    val withPos = corrT
      .join(posB, col("_s") === col("_a") && col("_t") === col("_b"), "left")
      .groupBy("_s", "_t", "_score")
      .agg(min_by(col("_canon"), col("_dir")).as("_canon"))
    val labeled = withPos
      .join(negB, col("_s") === col("_na") && col("_t") === col("_nb"), "left")
      .select(col("_score"), col("_canon"), col("_na").isNotNull.as("_neg"))
    // distinct-canonical counting reduced to a plain conditional agg:
    // a canonical is correct at θ iff its BEST-scoring matching tuple
    // passes θ — frame bounded by |positives|
    val perCanon = labeled.filter(col("_canon").isNotNull)
      .groupBy("_canon").agg(max(col("_score")).as("_cs"))

    val mCounters = thresholds.zipWithIndex.map { case (t, i) =>
      coalesce(sum(when(col("_score") >= t &&
        (col("_canon").isNotNull || col("_neg") || lit(complete)), 1L)), lit(0L))
        .as(s"_m$i")
    }
    val cCounters = thresholds.zipWithIndex.map { case (t, i) =>
      coalesce(sum(when(col("_cs") >= t, 1L)), lit(0L)).as(s"_c$i")
    }
    // three 1-row aggregate frames; the crosses are broadcast scalars
    val wide = labeled.agg(mCounters.head, mCounters.tail: _*)
      .crossJoin(broadcast(perCanon.agg(cCounters.head, cCounters.tail: _*)))
      .crossJoin(broadcast(pos.agg(count(lit(1)).as("_ct"))))
    val rows = explode(array(thresholds.zipWithIndex.map { case (t, i) =>
      struct(lit(t).as("threshold"), col(s"_c$i").as("correct"),
        col(s"_m$i").as("matched"), col("_ct").as("correct_total"))
    }: _*)).as("r")
    wide.select(rows).select(col("r.*"))
      .select(col("threshold"),
        round(col("correct") / greatest(col("matched"), lit(1L)), 5).as("precision"),
        round(col("correct") / greatest(col("correct_total"), lit(1L)), 5).as("recall"),
        // 2PR/(P+R) algebraically = 2·correct/(matched + correct_total)
        round(col("correct") * 2.0 / greatest(col("matched") + col("correct_total"), lit(1L)), 5)
          .as("f1"),
        col("correct"), col("matched"), col("correct_total"),
        (col("correct_total") - col("correct")).as("missing"))
  }
}
