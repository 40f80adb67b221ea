package graft.schema

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.blocking.EmScenario

/** Schema-matching / translation / extraction queries + oracles
  * (SURVEY §2.4–§2.6).
  */
object SchemaQueries {

  val SourceCols = Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
  val TargetCols = Seq("cust_key", "customer_name", "nation_key", "acct_balance", "mkt_segment")
  /** Gold header mapping used by schema_eval. */
  val GoldMapping: Seq[(String, String)] = SourceCols.zip(TargetCols)

  private def valuesSql(names: Seq[String], colName: String, alias: String): String =
    names.map(n => s"('$n')").mkString(s"(VALUES ", ", ", s") AS $alias($colName)")

  // ---- #20 label-based ----

  def schemaLabel(s: SparkSession, dir: String): DataFrame =
    SchemaMatch.labelBased(s, SourceCols, TargetCols, threshold = 0.5)
      .orderBy("source_col", "target_col")

  val schemaLabelOracle: String =
    s"""SELECT * FROM (
       |  SELECT s.source_col, t.target_col,
       |         round(jaro_winkler_similarity(lower(s.source_col), lower(t.target_col)), 5) AS sim
       |  FROM ${valuesSql(SourceCols, "source_col", "s")}
       |  CROSS JOIN ${valuesSql(TargetCols, "target_col", "t")})
       |WHERE sim >= 0.5
       |ORDER BY source_col, target_col""".stripMargin

  // ---- #21 instance-based (customer vs supplier) ----

  def schemaInstance(s: SparkSession, dir: String): DataFrame =
    SchemaMatch.instanceBased(
        customer(s, dir), Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal"),
        supplier(s, dir), Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
        threshold = 0.01)
      .orderBy("col_l", "col_r")

  val schemaInstanceOracle: String = {
    def side(table: String, cols: Seq[String], out: String) =
      cols.map(c =>
        s"SELECT DISTINCT '$c' AS $out, CAST($c AS VARCHAR) AS value FROM $table WHERE $c IS NOT NULL")
        .mkString("\n  UNION ALL\n  ")
    s"""WITH lv AS (
       |  ${side("customer", Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal"), "col_l")}),
       |rv AS (
       |  ${side("supplier", Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"), "col_r")}),
       |ln AS (SELECT col_l, count(*) AS nl FROM lv GROUP BY col_l),
       |rn AS (SELECT col_r, count(*) AS nr FROM rv GROUP BY col_r),
       |i AS (SELECT col_l, col_r, count(*) AS ni
       |      FROM lv JOIN rv USING (value) GROUP BY col_l, col_r)
       |SELECT * FROM (
       |  SELECT i.col_l, i.col_r,
       |         round(CAST(ni AS DOUBLE) / (nl + nr - ni), 5) AS sim
       |  FROM i JOIN ln USING (col_l) JOIN rn USING (col_r))
       |WHERE sim >= 0.01
       |ORDER BY col_l, col_r""".stripMargin
  }

  // ---- #22 duplicate-based (EmScenario gold pairs) ----

  private val DupCols = Seq("name", "seg", "nat", "bal")

  def schemaDuplicate(s: SparkSession, dir: String): DataFrame =
    SchemaMatch.duplicateBased(
        EmScenario.gold(s, dir), EmScenario.custL(s, dir), EmScenario.custR(s, dir),
        "id", DupCols, DupCols)
      .orderBy("col_l", "col_r")

  val schemaDuplicateOracle: String = {
    val pairs = for (lc <- DupCols; rc <- DupCols) yield
      s"""SELECT '$lc' AS col_l, '$rc' AS col_r,
         |  round(avg(CASE WHEN CAST(l.$lc AS VARCHAR) = CAST(r.$rc AS VARCHAR)
         |            THEN 1.0 ELSE 0.0 END), 5) AS agreement
         |FROM gold g JOIN l ON l.id = g.id1 JOIN r ON r.id = g.id2""".stripMargin
    s"""${EmScenario.oracleWith}
       |${pairs.mkString("\nUNION ALL\n")}
       |ORDER BY col_l, col_r""".stripMargin
  }

  // ---- #23 mapping evaluation ----

  def schemaEval(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    SchemaMatch.evaluate(
      schemaLabel(s, dir),
      GoldMapping.toDF("source_col", "target_col"))
  }

  val schemaEvalOracle: String = {
    val goldVals = GoldMapping.map { case (a, b) => s"('$a', '$b')" }.mkString(", ")
    s"""WITH pred AS (
       |  SELECT source_col AS id1, target_col AS id2 FROM (
       |    SELECT s.source_col, t.target_col,
       |           jaro_winkler_similarity(lower(s.source_col), lower(t.target_col)) AS sim
       |    FROM ${valuesSql(SourceCols, "source_col", "s")}
       |    CROSS JOIN ${valuesSql(TargetCols, "target_col", "t")})
       |  WHERE sim >= 0.5),
       |gold AS (SELECT * FROM (VALUES $goldVals) AS g(id1, id2)),
       |n AS (SELECT (SELECT count(*) FROM pred JOIN gold USING (id1, id2)) AS tp,
       |             (SELECT count(*) FROM pred) AS np,
       |             (SELECT count(*) FROM gold) AS ng)
       |SELECT CAST(tp AS BIGINT) AS tp, CAST(np - tp AS BIGINT) AS fp,
       |       CAST(ng - tp AS BIGINT) AS fn,
       |       round(CAST(tp AS DOUBLE) / greatest(np, 1), 5) AS precision,
       |       round(CAST(tp AS DOUBLE) / greatest(ng, 1), 5) AS recall,
       |       round(CAST(tp AS DOUBLE) * 2.0 / greatest(np + ng, 1), 5) AS f1
       |FROM n""".stripMargin
  }

  // ---- #24 mapping translation ----

  def translateMapping(s: SparkSession, dir: String): DataFrame = {
    val corrs = GoldMapping
    val src = customer(s, dir)
    src.select(corrs.map { case (from, to) => col(from).as(to) }: _*)
      .withColumn("__dataset_name", lit("customer"))
      .orderBy("cust_key")
  }

  val translateMappingOracle: String =
    """SELECT c_custkey AS cust_key, c_name AS customer_name,
      |       c_nationkey AS nation_key, c_acctbal AS acct_balance,
      |       c_mktsegment AS mkt_segment, 'customer' AS __dataset_name
      |FROM customer
      |ORDER BY cust_key""".stripMargin

  // ---- #25 regex extraction ----

  def extractRegex(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select(
        col("event_id"),
        regexp_extract(col("props"), "\"k\": (\\d+)", 1).as("k_value"),
        regexp_extract(col("event_type"), "^([a-z]+)", 1).as("type_word"))
      .orderBy("event_id")

  val extractRegexOracle: String =
    """SELECT event_id,
      |  regexp_extract(props, '"k": (\d+)', 1) AS k_value,
      |  regexp_extract(event_type, '^([a-z]+)', 1) AS type_word
      |FROM events
      |ORDER BY event_id""".stripMargin

  // ---- #26 typed (function) extraction ----

  /** FunctionExtractor analogue: a typed Dataset.map with a case-class
    * result — arbitrary Scala per record, statically typed.
    */
  def extractTyped(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    part(s, dir).select(col("p_partkey"), col("p_name"))
      .as[(Long, String)]
      .map { case (id, name) =>
        val ws = name.split(" ")
        PartNameInfo(id, ws.headOption.getOrElse(""), ws.lift(1).getOrElse(""), name.length)
      }
      .toDF()
      .orderBy("id")
  }

  val extractTypedOracle: String =
    """SELECT p_partkey AS id,
      |  string_split(p_name, ' ')[1] AS adjective,
      |  coalesce(string_split(p_name, ' ')[2], '') AS noun,
      |  CAST(length(p_name) AS INT) AS name_len
      |FROM part
      |ORDER BY id""".stripMargin

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "schema_label" -> (schemaLabel _),
    "schema_instance" -> (schemaInstance _),
    "schema_duplicate" -> (schemaDuplicate _),
    "schema_eval" -> (schemaEval _),
    "translate_mapping" -> (translateMapping _),
    "extract_regex" -> (extractRegex _),
    "extract_typed" -> (extractTyped _)
  )

  def oracles: Map[String, String] = Map(
    "schema_label" -> schemaLabelOracle,
    "schema_instance" -> schemaInstanceOracle,
    "schema_duplicate" -> schemaDuplicateOracle,
    "schema_eval" -> schemaEvalOracle,
    "translate_mapping" -> translateMappingOracle,
    "extract_regex" -> extractRegexOracle,
    "extract_typed" -> extractTypedOracle
  )
}

/** Typed extraction result (top-level for the Catalyst encoder). */
case class PartNameInfo(id: Long, adjective: String, noun: String, name_len: Int)
