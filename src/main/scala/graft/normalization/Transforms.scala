package graft.normalization

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Named column-transform registry — the Spark rendering of the
  * reference's `Transforms` catalog (PyDI/normalization/transforms.py:26)
  * plus `list_transforms` (:116) / `get_transform` (:137).
  *
  * Every transform is a pure `Column => Column` over built-in functions,
  * so a chain of any length folds into ONE codegen'd projection — no
  * per-transform passes over the data (the reference applies each
  * `pd.Series` op eagerly). Parameterized transforms (`fill_na`,
  * `replace`, `regex_replace`) are factory methods, mirroring the
  * reference's closure-returning staticmethods.
  */
object Transforms {

  /** Parameterless transforms, by registry name. */
  val registry: Map[String, Column => Column] = Map(
    "lower" -> (c => lower(c)),
    "upper" -> (c => upper(c)),
    "strip" -> (c => trim(c)),
    "normalize_whitespace" -> (c => regexp_replace(trim(c), "\\s+", " ")),
    "drop_non_ascii" -> (c => regexp_replace(c, "[^\\x00-\\x7F]", "")),
    "to_numeric" -> (c => Normalize.parseNumeric(c)),
    // to_datetime with errors="coerce": unparseable → NULL.
    "to_datetime" -> (c => coalesce(
      try_to_timestamp(c, lit("yyyy-MM-dd")),
      try_to_timestamp(c, lit("yyyy-MM-dd HH:mm:ss")),
      try_to_timestamp(c, lit("MM/dd/yyyy"))).cast("date"))
  )

  /** fill_na(value): NULL → the given value. */
  def fillNa(value: String): Column => Column = c => coalesce(c, lit(value))

  /** replace(mapping): exact-value substitutions, non-matches pass
    * through. All branches test the ORIGINAL column (pandas
    * `Series.replace` semantics): a mapping like A→B, B→C never
    * cascades A to C, and map iteration order cannot change results.
    */
  def replaceValues(mapping: Map[String, String]): Column => Column = c =>
    if (mapping.isEmpty) c
    else mapping.tail.foldLeft(when(c === lit(mapping.head._1), lit(mapping.head._2))) {
      case (acc, (from, to)) => acc.when(c === lit(from), lit(to))
    }.otherwise(c)

  /** regex_replace(pattern, repl). Pattern must be valid Java regex. */
  def regexReplace(pattern: String, repl: String): Column => Column =
    c => regexp_replace(c, pattern, repl)

  /** get_transform(name): None-analogue is a left-to-right lookup miss. */
  def get(name: String): Option[Column => Column] = registry.get(name)

  /** Apply a named chain to one column (left to right). Unknown names
    * fail fast — silently skipping a transform corrupts data quietly.
    */
  def chain(names: Seq[String]): Column => Column = {
    val fns = names.map(n =>
      registry.getOrElse(n, throw new IllegalArgumentException(s"unknown transform: $n")))
    c => fns.foldLeft(c)((acc, f) => f(acc))
  }

  /** Declarative (column → transform chain) application; the whole table
    * folds into one projection.
    */
  def applyChains(df: DataFrame, chains: Seq[(String, Seq[String])]): DataFrame = {
    val byCol = chains.toMap
    val cols = df.columns.map { c =>
      byCol.get(c).map(names => chain(names)(col(c)).as(c)).getOrElse(col(c))
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** list_transforms(): the catalog as a one-row-per-transform frame. */
  def listTransforms(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    (registry.keys.map((_, false)).toSeq ++
      Seq(("fill_na", true), ("replace", true), ("regex_replace", true)))
      .sortBy(_._1)
      .toDF("transform_name", "parameterized")
  }
}
