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
    cols.map { c =>
      df.select(lit(c).as("column_name"), col(c).cast("string").as("value"))
        .filter(col("value").isNotNull)
        .distinct()
    }.reduce(_.unionByName(_))

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
    val stacked = for (lc <- leftCols; rc <- rightCols) yield
      row.select(lit(lc).as("col_l"), lit(rc).as("col_r"),
        round(col(s"__ag_${lc}__$rc"), 5).as("agreement"))
    stacked.reduce(_.unionByName(_))
  }

  /** SchemaMappingEvaluator (schemamatching/evaluation.py): P/R/F1 of a
    * predicted mapping vs gold correspondences.
    */
  def evaluate(predicted: DataFrame, gold: DataFrame): DataFrame =
    graft.matching.Matching.evaluate(
      predicted.select(col("source_col").as("id1"), col("target_col").as("id2")),
      gold.select(col("source_col").as("id1"), col("target_col").as("id2")))
}
