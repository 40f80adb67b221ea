package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.Bucketing

/** The co-located join contract: once both sides are written bucketed
  * on the join key, an equi-join on that key must compile WITHOUT a
  * shuffle exchange — this is the "pre-partition the 100 TB fact table
  * once, never shuffle it again" path claimed in SURVEY §5.
  */
class BucketingSpec extends AnyFunSuite {
  import TestSpark._

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect() // materialize so AQE finalizes the plan
    // The final adaptive plan nests exchanges inside query stages whose
    // `children` is empty — the rendered tree is the reliable view.
    "ShuffleQueryStage|Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).size
  }

  test("bucketed equi-join runs with zero shuffle exchanges") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val c = Tables.customer(spark, sf).select("c_custkey", "c_name", "c_nationkey")
      val o = Tables.orders(spark, sf)
        .select(col("o_custkey").as("c_custkey"), col("o_orderkey"), col("o_totalprice"))
      Bucketing.saveBucketed(c, "b_cust", "c_custkey", 4)
      Bucketing.saveBucketed(o, "b_ord", "c_custkey", 4)

      val bucketed = Bucketing.bucketedJoin(spark, "b_cust", "b_ord", "c_custkey")
      assert(shuffles(bucketed) == 0,
        "bucketed join must not exchange either side")

      // same join unbucketed shuffles both sides
      val plain = c.join(o, "c_custkey")
      assert(shuffles(plain) >= 2)

      // and the result set is identical
      assert(bucketed.count() == plain.count())
      val h1 = bucketed.agg(expr("bit_xor(xxhash64(c_custkey, o_orderkey))")).collect()(0).getLong(0)
      val h2 = plain.agg(expr("bit_xor(xxhash64(c_custkey, o_orderkey))")).collect()(0).getLong(0)
      assert(h1 == h2)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_cust")
      spark.sql("DROP TABLE IF EXISTS b_ord")
    }
  }

  test("bucket-sorted tables also skip the sort on the sorted key") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val c = Tables.customer(spark, sf).select("c_custkey", "c_name")
      Bucketing.saveBucketed(c, "b_sorted", "c_custkey", 4, sorted = true)
      val t = spark.table("b_sorted")
      val joined = t.join(t.select(col("c_custkey"), col("c_name").as("n2")), "c_custkey")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_sorted")
    }
  }
}
