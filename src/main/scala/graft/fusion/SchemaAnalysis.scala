package graft.fusion

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset schema comparison — the Spark rendering of
  * `compare_dataset_schemas` (PyDI/fusion/analysis.py:133) and
  * `detect_attribute_conflicts` (analysis.py:190).
  *
  * The reference compares pandas dtypes, which for CSV-world data are
  * themselves the product of per-column inference. Spark schemas are
  * typed at load, so the faithful analogue for string-loaded data is a
  * DATA-DRIVEN type class per column (all-numeric / all-date / text /
  * empty) — one aggregation pass per frame, every per-column counter in
  * the same job (documented deviation: metadata-only dtype equality
  * would be trivially vacuous for frames loaded through one engine).
  *
  * Output: one row per ordered (name1, name2) pair — column-set overlap
  * (Jaccard over column NAMES, exactly `_calculate_schema_overlap`,
  * analysis.py:763) plus the number of common columns whose inferred
  * type class disagrees (`_detect_dtype_conflicts`, analysis.py:783).
  * Everything after the per-frame aggregation runs on frames whose row
  * count is bounded by the column count — never by the data.
  */
object SchemaAnalysis {

  /** (column, type_class) long frame for one dataset: one aggregation,
    * then a literal-driven unpivot of the single result row.
    */
  def columnClasses(df: DataFrame): DataFrame = {
    val cols = df.columns.toSeq
    // Positional rename first (toDF never parses names, so even
    // backticks are safe): every internal reference below uses the
    // fixed safe names _c0.._cN, and a user column name containing
    // quotes, backticks or commas can never reach a SQL string — the
    // original name only ever appears as a lit() value.
    val safe = df.toDF(cols.indices.map(i => s"_c$i"): _*)
    val aggs = cols.indices.flatMap { i =>
      // rlike fast-path: try_to_timestamp is an order of magnitude more
      // expensive than a regex reject, and most values in most columns
      // are not dates — only shape-plausible strings reach the parser.
      // The oracle applies the identical guard, so parity is exact.
      val s = col(s"_c$i").cast("string")
      val dateLike =
        when(s.rlike("^\\d{4}-\\d{2}-\\d{2}$"),
          try_to_timestamp(s, lit("yyyy-MM-dd")))
        .when(s.rlike("^\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}$"),
          try_to_timestamp(s, lit("yyyy-MM-dd HH:mm:ss")))
        .otherwise(lit(null))
      Seq(
        count(col(s"_c$i")).as(s"n_$i"),
        sum(expr(s"try_cast(_c$i AS DOUBLE)").isNotNull.cast("long")).as(s"num_$i"),
        sum(dateLike.isNotNull.cast("long")).as(s"dt_$i"))
    }
    val one = safe.agg(aggs.head, aggs.tail: _*)
    val structs = cols.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c).as("column_name"),
        when(col(s"n_$i") === 0, "empty")
          .when(col(s"num_$i") === col(s"n_$i"), "numeric")
          .when(col(s"dt_$i") === col(s"n_$i"), "date")
          .otherwise("text").as("type_class"))
    }
    one.select(explode(array(structs: _*)).as("_s"))
      .select(col("_s.column_name"), col("_s.type_class"))
  }

  /** Full pairwise comparison over named frames. */
  def compareSchemas(frames: Seq[(String, DataFrame)]): DataFrame = {
    // Materialize once: the frame is tiny (one row per column) but is
    // consumed by three joins below — without a boundary every branch
    // re-runs the per-frame aggregation scans (6+ full scans at scale).
    val cols = frames.map { case (n, df) =>
      columnClasses(df).withColumn("source", lit(n))
    }.reduce(_.unionByName(_)).localCheckpoint(true)
    val perSrc = cols.groupBy("source").agg(count(lit(1)).as("n_cols"))
    val x = cols.select(col("source").as("name1"),
      col("column_name").as("c"), col("type_class").as("t1"))
    val y = cols.select(col("source").as("name2"),
      col("column_name").as("c"), col("type_class").as("t2"))
    val inter = x.join(y, "c")
      .groupBy("name1", "name2")
      .agg(count(lit(1)).as("n_common"),
        sum((col("t1") =!= col("t2")).cast("long")).as("n_type_conflicts"))
    // Cross of all source pairs so zero-overlap pairs still appear.
    perSrc.select(col("source").as("name1"), col("n_cols").as("n_cols1"))
      .crossJoin(perSrc.select(col("source").as("name2"), col("n_cols").as("n_cols2")))
      .join(inter, Seq("name1", "name2"), "left")
      .select(col("name1"), col("name2"), col("n_cols1"), col("n_cols2"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        (coalesce(col("n_common"), lit(0L)).cast("double") /
          (col("n_cols1") + col("n_cols2") - coalesce(col("n_common"), lit(0L))))
          .as("overlap"),
        coalesce(col("n_type_conflicts"), lit(0L)).as("n_type_conflicts"))
      .orderBy("name1", "name2")
  }
}
