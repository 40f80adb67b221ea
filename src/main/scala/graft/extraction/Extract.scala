package graft.extraction

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule-based information extraction — the Spark re-expression of
  * PyDI/informationextraction/{rules,autorules,evaluation}.py.
  * Every rule is a `regexp_extract` in ONE projection (codegen, no
  * per-rule passes); rule discovery is a single aggregation computing
  * all coverages at once.
  */
object Extract {

  /** Built-in named patterns (subset of rules.py BUILTIN_RULES — the
    * dependency-free ones; first capture group is the value).
    */
  val BuiltinRules: Seq[(String, String)] = Seq(
    "email" -> "([a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,})",
    "url" -> "(https?://[^\\s<>\"]+)",
    "year" -> "\\b((?:19|20)\\d{2})\\b",
    "price" -> "(\\$\\d+(?:\\.\\d{2})?)",
    "isbn13" -> "\\b(97[89]\\d{10})\\b",
    // extract_domain (rules.py:55): the registrable host of a URL
    "domain" -> "https?://(?:www\\.)?([a-zA-Z0-9.-]+)")

  /** RegexExtractor (regex.py:16): one new column per rule; empty match
    * → NULL.
    */
  def applyRules(df: DataFrame, text: String, rules: Seq[(String, String)]): DataFrame =
    rules.foldLeft(df) { case (d, (name, pattern)) =>
      d.withColumn(name, nullif(regexp_extract(col(text), pattern, 1), lit("")))
    }

  /** RuleDiscovery (autorules.py:17): apply every rule, report match
    * coverage per rule, and flag the fields that clear `minCoverage` —
    * one aggregation for all rules.
    */
  def discoverRules(df: DataFrame, text: String, rules: Seq[(String, String)],
      minCoverage: Double): DataFrame = {
    val extracted = applyRules(df, text, rules)
    val aggs = rules.map { case (name, _) =>
      sum(col(name).isNotNull.cast("long")).as(s"_m_$name")
    } :+ count(lit(1)).as("_n")
    val row = extracted.agg(aggs.head, aggs.tail: _*)
    // explode the 1-row agg — unioned per-rule selects would re-run the
    // regex extraction scan once per rule (r8)
    val entries = rules.map { case (name, _) =>
      struct(
        lit(name).as("rule"),
        col(s"_m_$name").as("n_matched"),
        round(col(s"_m_$name") / greatest(col("_n"), lit(1L)), 5).as("coverage"),
        (col(s"_m_$name") / greatest(col("_n"), lit(1L)) >= minCoverage).as("kept"))
    }
    row.select(explode(array(entries: _*)).as("__m")).select(col("__m.*"))
  }

  /** ExtractorPipeline (base.py:215): chain extractors sequentially —
    * each stage sees the previous stage's output columns (so later
    * stages can parse/refine earlier extractions), and the whole chain
    * still collapses into ONE Catalyst projection: a fold of column
    * transforms, no per-stage materialization (the reference copies the
    * frame per step).
    */
  def pipeline(df: DataFrame, stages: Seq[DataFrame => DataFrame]): DataFrame =
    stages.foldLeft(df)((d, f) => f(d))

  /** InformationExtractionEvaluator (evaluation.py:121): micro P/R/F1 of
    * extracted vs gold field values. Per (record, field): tp if both
    * present and equal; fp if predicted present but wrong/spurious; fn
    * if gold present but missed/wrong.
    */
  def evaluate(joined: DataFrame, fields: Seq[(String, String)]): DataFrame = {
    val counts = fields.map { case (pred, gold) =>
      val p = col(pred); val g = col(gold)
      struct(
        sum((p.isNotNull && g.isNotNull && p === g).cast("long")).as("tp"),
        sum((p.isNotNull && (g.isNull || p =!= g)).cast("long")).as("fp"),
        sum((g.isNotNull && (p.isNull || p =!= g)).cast("long")).as("fn"))
    }
    val row = joined.agg(counts.head.as("_c0"),
      counts.tail.zipWithIndex.map { case (c, i) => c.as(s"_c${i + 1}") }: _*)
    val tp = fields.indices.map(i => col(s"_c$i.tp")).reduce(_ + _)
    val fp = fields.indices.map(i => col(s"_c$i.fp")).reduce(_ + _)
    val fn = fields.indices.map(i => col(s"_c$i.fn")).reduce(_ + _)
    row.select(
      tp.as("tp"), fp.as("fp"), fn.as("fn"),
      round(tp / greatest(tp + fp, lit(1L)), 5).as("precision"),
      round(tp / greatest(tp + fn, lit(1L)), 5).as("recall"),
      round(tp * 2.0 / greatest(tp * 2 + fp + fn, lit(1L)), 5).as("f1"))
  }
}
