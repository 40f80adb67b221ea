package graft.profiling

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Profiling queries + DuckDB oracles (SURVEY §2.2). */
object ProfileQueries {

  def profileColumns(s: SparkSession, dir: String): DataFrame =
    Profiler.profile(customer(s, dir)).orderBy("column_name")

  val profileColumnsOracle: String = {
    val cols = Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val parts = cols.map { c =>
      s"""SELECT '$c' AS column_name, count(*) AS n_rows,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |  count(DISTINCT $c) AS n_distinct,
         |  min(CAST($c AS VARCHAR)) AS min_value,
         |  max(CAST($c AS VARCHAR)) AS max_value
         |FROM customer""".stripMargin
    }
    parts.mkString("\nUNION ALL\n") + "\nORDER BY column_name"
  }

  def profileTopk(s: SparkSession, dir: String): DataFrame =
    Profiler.topK(customer(s, dir), Seq("c_mktsegment", "c_nationkey"), 3)
      .orderBy("column_name", "rnk")

  val profileTopkOracle: String = {
    def one(c: String) =
      s"""SELECT '$c' AS column_name, value, cnt, rnk FROM (
         |  SELECT CAST($c AS VARCHAR) AS value, count(*) AS cnt,
         |         row_number() OVER (ORDER BY count(*) DESC, CAST($c AS VARCHAR)) AS rnk
         |  FROM customer WHERE $c IS NOT NULL GROUP BY $c)
         |WHERE rnk <= 3""".stripMargin
    Seq("c_mktsegment", "c_nationkey").map(one).mkString("\nUNION ALL\n") +
      "\nORDER BY column_name, rnk"
  }

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "profile_columns" -> (profileColumns _),
    "profile_topk" -> (profileTopk _)
  )

  def oracles: Map[String, String] = Map(
    "profile_columns" -> profileColumnsOracle,
    "profile_topk" -> profileTopkOracle
  )
}
