package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** IO / provenance queries + DuckDB oracles (SURVEY §2.1). */
object IoQueries {

  /** Extension-dispatch load of the customer parquet. */
  def ioLoadParquet(s: SparkSession, dir: String): DataFrame =
    Loaders.load(s, s"$dir/customer.parquet")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")

  val ioLoadParquetOracle: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer ORDER BY c_custkey""".stripMargin

  /** Provenance load: key-derived unique id + dataset/source columns. */
  def ioProvenance(s: SparkSession, dir: String): DataFrame =
    Loaders.withProvenance(
        customer(s, dir).select("c_custkey", "c_name", "c_acctbal"),
        "customer", "c_custkey", "customer.parquet")
      .orderBy("c_custkey")

  val ioProvenanceOracle: String =
    """SELECT 'customer-' || lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS customer_id,
      |       c_custkey, c_name, c_acctbal,
      |       'customer' AS __dataset_name,
      |       'customer.parquet' AS __source_path
      |FROM customer
      |ORDER BY c_custkey""".stripMargin

  /** Nested-record flatten: build a nested struct view of customer, then
    * flatten back to `parent_child` columns.
    */
  def ioFlatten(s: SparkSession, dir: String): DataFrame = {
    val nested = customer(s, dir).select(
      col("c_custkey").as("id"),
      struct(
        col("c_name").as("name"),
        struct(col("c_mktsegment").as("segment"), col("c_nationkey").as("nation")).as("market"))
        .as("profile"),
      col("c_acctbal").as("balance"))
    Loaders.flatten(nested).orderBy("id")
  }

  val ioFlattenOracle: String =
    """SELECT c_custkey AS id, c_name AS profile_name,
      |       c_mktsegment AS profile_market_segment,
      |       c_nationkey AS profile_market_nation,
      |       c_acctbal AS balance
      |FROM customer
      |ORDER BY id""".stripMargin

  /** Delimited-column explode over part names. */
  def ioExplodeDelim(s: SparkSession, dir: String): DataFrame =
    Loaders.explodeDelimited(
        part(s, dir).select(col("p_partkey"), col("p_name")), "p_name", " ", "word")
      .select("p_partkey", "word")
      .orderBy("p_partkey", "word")

  val ioExplodeDelimOracle: String =
    """SELECT p_partkey, trim(unnest(string_split(p_name, ' '))) AS word
      |FROM part
      |ORDER BY p_partkey, word""".stripMargin

  /** Fixed-width round-trip: render customer rows as fixed-width lines
    * in-engine (no file side effects in the gate), then parse back with
    * the fwf column specs — exercises exactly load_fwf's slicing.
    */
  def ioFwf(s: SparkSession, dir: String): DataFrame = {
    val lines = customer(s, dir).select(
      concat(
        rpad(col("c_name"), 25, " "),
        lpad(col("c_custkey").cast("string"), 11, " "),
        rpad(col("c_mktsegment"), 12, " ")).as("line"))
    Loaders.parseFwf(lines, "line", Seq(
        ("name", 1, 25), ("custkey", 26, 11), ("segment", 37, 12)))
      .orderBy("custkey", "name")
  }

  val ioFwfOracle: String =
    """WITH t AS (SELECT rpad(c_name, 25, ' ') || lpad(CAST(c_custkey AS VARCHAR), 11, ' ')
      |             || rpad(c_mktsegment, 12, ' ') AS line FROM customer)
      |SELECT trim(substr(line, 1, 25)) AS name,
      |       trim(substr(line, 26, 11)) AS custkey,
      |       trim(substr(line, 37, 12)) AS segment
      |FROM t ORDER BY custkey, name""".stripMargin

  /** Round-trip: per-nation HTML tables built deterministically from
    * customer (header row + sorted data rows), parsed back by the
    * regex table reader.
    */
  def ioHtml(s: SparkSession, dir: String): DataFrame = {
    val docs = customer(s, dir)
      .select(col("c_nationkey"),
        concat(lit("<tr><td> "), col("c_name"), lit(" </td><td>"),
          col("c_custkey").cast("string"), lit("</td></tr>")).as("_tr"))
      .groupBy("c_nationkey")
      .agg(concat(lit("<table><tr><th>name</th><th>id</th></tr>"),
        array_join(array_sort(collect_list(col("_tr"))), ""),
        lit("</table>")).as("html"))
    Loaders.parseHtmlTable(docs, "html")
      .select(col("c_nationkey"), col("row_idx").cast("long").as("row_idx"),
        element_at(col("cells"), 1).as("name"),
        element_at(col("cells"), 2).as("id"))
      .orderBy("c_nationkey", "row_idx")
  }

  val ioHtmlOracle: String =
    """WITH tr AS (SELECT c_nationkey,
      |    '<tr><td> ' || c_name || ' </td><td>' || CAST(c_custkey AS VARCHAR)
      |      || '</td></tr>' AS tr
      |  FROM customer),
      |doc AS (SELECT c_nationkey,
      |    '<table><tr><th>name</th><th>id</th></tr>'
      |      || array_to_string(list_sort(list(tr)), '') || '</table>' AS html
      |  FROM tr GROUP BY c_nationkey),
      |ex AS (SELECT c_nationkey,
      |    unnest(regexp_extract_all(html, '(?s)<tr[^>]*>(.*?)</tr>', 1)) AS row_html,
      |    generate_subscripts(regexp_extract_all(html, '(?s)<tr[^>]*>(.*?)</tr>', 1), 1) AS rix
      |  FROM doc),
      |cells AS (SELECT c_nationkey, CAST(rix - 1 AS BIGINT) AS row_idx,
      |    [trim(regexp_replace(x, '<[^>]*>', '', 'g'))
      |     for x in regexp_extract_all(row_html, '(?s)<t[dh][^>]*>(.*?)</t[dh]>', 1)] AS cs
      |  FROM ex)
      |SELECT c_nationkey, row_idx, cs[1] AS name, cs[2] AS id
      |FROM cells ORDER BY c_nationkey, row_idx""".stripMargin

  /** Hive-partitioned sink + partition-pruned read-back: write the
    * documents table `partitionBy(source)` (the layout a 100 TB corpus
    * actually lands in — one directory per source, so source-scoped
    * jobs never list, let alone read, other sources' files), then read
    * it back filtered to 3 sources and aggregate. The filter is a
    * PARTITION filter — it prunes directories at planning time instead
    * of scanning+discarding (IoProfileSchemaSpec asserts the pruned
    * scan shape on the executed plan).
    */
  /** Where [[ioPartitioned]] lands its partitioned copy (exposed so the
    * spec can re-open the read and assert partition pruning on the
    * executed plan).
    */
  def partitionedPath(dir: String): String =
    java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_part_${dir.hashCode.toHexString}").toString

  def ioPartitioned(s: SparkSession, dir: String): DataFrame = {
    val out = partitionedPath(dir)
    documents(s, dir).write.mode("overwrite").partitionBy("source").parquet(out)
    s.read.parquet(out)
      .filter(col("source").isin("src1", "src2", "src3"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
      .orderBy("source")
  }

  val ioPartitionedOracle: String =
    """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM documents
      |WHERE source IN ('src1', 'src2', 'src3')
      |GROUP BY source ORDER BY source""".stripMargin

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "io_partitioned" -> (ioPartitioned _),
    "io_html" -> (ioHtml _),
    "io_fwf" -> (ioFwf _),
    "io_load_parquet" -> (ioLoadParquet _),
    "io_provenance" -> (ioProvenance _),
    "io_flatten" -> (ioFlatten _),
    "io_explode_delim" -> (ioExplodeDelim _)
  )

  def oracles: Map[String, String] = Map(
    "io_partitioned" -> ioPartitionedOracle,
    "io_html" -> ioHtmlOracle,
    "io_fwf" -> ioFwfOracle,
    "io_load_parquet" -> ioLoadParquetOracle,
    "io_provenance" -> ioProvenanceOracle,
    "io_flatten" -> ioFlattenOracle,
    "io_explode_delim" -> ioExplodeDelimOracle
  )
}
