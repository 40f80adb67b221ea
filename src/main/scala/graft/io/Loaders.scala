package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructType}

/** IO + provenance — the Spark re-expression of PyDI/io/loaders.py.
  *
  * Key deviation, by design: the reference injects `{prefix}-{i:04d}`
  * ids from the pandas ROW POSITION (loaders.py:165-170). Row position
  * is not stable in a distributed engine (partition order, retries), so
  * [[withProvenance]] derives the id from a caller-named KEY COLUMN —
  * deterministic under any parallelism — with the same
  * `{prefix}-{zero-padded}` shape.
  */
object Loaders {

  /** load_table dispatch (loaders.py:238 load_with_provenance readers):
    * format by extension — csv / parquet / json.
    */
  def load(spark: SparkSession, path: String): DataFrame =
    path.split('.').last.toLowerCase match {
      case "csv"     => spark.read.option("header", "true").option("inferSchema", "true").csv(path)
      case "json"    => spark.read.json(path)
      // Naive-timestamp parquet inference is session conf owned by
      // Sessions.tune (applied once per session at every entry path).
      case "parquet" => spark.read.parquet(path)
      case other     => throw new IllegalArgumentException(s"unsupported extension: $other")
    }

  /** load_with_provenance (loaders.py:238): unique id column
    * `{dataset}_id` valued `{dataset}-{key zero-padded to ≥4}` plus the
    * minimal provenance columns `__dataset_name` / `__source_path`.
    */
  def withProvenance(df: DataFrame, datasetName: String, keyCol: String,
      sourcePath: String, pad: Int = 9): DataFrame = {
    val id = concat_ws("-", lit(datasetName), lpad(col(keyCol).cast("string"), pad, "0"))
    df.select(
      (id.as(s"${datasetName}_id") +:
        df.columns.map(c => col(c)) :+
        lit(datasetName).as("__dataset_name") :+
        lit(sourcePath).as("__source_path")): _*)
  }

  /** Recursive schema flatten (the Spark analogue of load_xml's nested-
    * record flattening): struct fields become `parent_child` columns,
    * arrays are left in place (explode is a separate, size-changing op).
    */
  def flatten(df: DataFrame): DataFrame = {
    def cols(schema: StructType, prefix: Seq[String]): Seq[Column] =
      schema.fields.toSeq.flatMap { f =>
        val path = prefix :+ f.name
        f.dataType match {
          case s: StructType => cols(s, path)
          case _ => Seq(col(path.map(p => s"`$p`").mkString(".")).as(path.mkString("_")))
        }
      }
    df.select(cols(df.schema, Nil): _*)
  }

  /** _explode_delimited_column (loaders.py): one row per delimited item;
    * items are trimmed.
    */
  def explodeDelimited(df: DataFrame, column: String, sep: String, as: String): DataFrame =
    df.withColumn(as, explode(transform(split(col(column), sep), x => trim(x))))

  /** Fixed-width parsing (load_fwf, loaders.py:365): slice `lineCol` by
    * (name, 1-based start, width) specs into trimmed string columns —
    * pandas read_fwf's colspec semantics. A short line yields "" (→
    * empty after trim), like pandas' NaN-ish padding. Pure substring
    * projection: codegen'd, scan-shaped.
    */
  def parseFwf(df: DataFrame, lineCol: String,
      specs: Seq[(String, Int, Int)]): DataFrame =
    df.select(specs.map { case (name, start, width) =>
      trim(substring(col(lineCol), start, width)).as(name)
    }: _*)

  /** load_fwf for files: each text line sliced per `specs`. */
  def loadFwf(spark: SparkSession, path: String,
      specs: Seq[(String, Int, Int)]): DataFrame =
    parseFwf(spark.read.text(path), "value", specs)

  /** HTML-table parsing (load_html, io/__init__ export): each input row
    * holds one HTML document; emits (input cols, row_idx, cells) — one
    * output row per <tr>, cells as trimmed tag-stripped strings from
    * its <td>/<th> elements. Regex-based over well-formed tables (the
    * reference delegates to lxml, absent in a zero-egress build —
    * documented simplification); all work is codegen'd projections +
    * one posexplode, scan-shaped. Combine with
    * `Normalize.webTableNormalize` for entity/null handling.
    */
  def parseHtmlTable(df: DataFrame, htmlCol: String): DataFrame =
    df.select(col("*"),
        posexplode(expr(
          s"regexp_extract_all(`$htmlCol`, '(?s)<tr[^>]*>(.*?)</tr>', 1)"))
          .as(Seq("row_idx", "_row_html")))
      .withColumn("cells", expr(
        "transform(regexp_extract_all(_row_html, '(?s)<t[dh][^>]*>(.*?)</t[dh]>', 1), " +
          "c -> trim(regexp_replace(c, '<[^>]*>', '')))"))
      .drop("_row_html")

  /** load_html for files: one document per file (wholetext). */
  def loadHtml(spark: SparkSession, path: String): DataFrame =
    parseHtmlTable(spark.read.option("wholetext", "true").text(path), "value")
}
