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
    // `children` is empty — the rendered tree is the reliable view. The
    // rendering appends an "== Initial Plan ==" section that would
    // double-count, so only the final section is scanned.
    val plan = df.queryExecution.executedPlan.toString
    val finalOnly = plan.split("== Initial Plan ==")(0)
    "ShuffleQueryStage".r.findAllIn(finalOnly).size
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

  test("incremental exact dedup: new batch joins the bucketed digest index without shuffling it") {
    // The recurring-ingestion shape: the corpus digest index is written
    // bucketed ONCE; each day's batch bucket-joins against it — the
    // 100 TB index side never re-shuffles, only the new batch hashes
    // into the index's bucketing.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val docs = Tables.documents(spark, sf)
      val digest = sha2(array_join(array_sort(array_distinct(
        split(lower(col("text")), " "))), " "), 256)
      val existing = docs.filter(col("doc_id") % 3 =!= 0)
        .select(col("doc_id"), digest.as("digest"))
        .groupBy("digest").agg(min("doc_id").as("dup_of"))
      Bucketing.saveBucketed(existing, "b_digest_idx", "digest", 4)

      val batch = docs.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id"), digest.as("digest"))
      val flagged = batch
        .join(spark.table("b_digest_idx"), Seq("digest"), "left")
        .select(col("doc_id"), col("dup_of"),
          col("dup_of").isNotNull.as("is_dup"))
      flagged.collect()
      // exactly ONE shuffle: the batch side repartitioning into the
      // index's bucketing; the index itself reads in place.
      val plan = flagged.queryExecution.executedPlan.toString
      assert(shuffles(flagged) <= 1)
      // the index scan itself must be the bucketed, in-place read
      assert(plan.contains("Bucketed: true"))
      // correctness vs a direct anti-join-free computation
      val expect = docs.filter(col("doc_id") % 3 === 0).count()
      assert(flagged.count() == expect)
      val dups = flagged.filter(col("is_dup")).count()
      val truth = batch.join(existing, Seq("digest")).count()
      assert(dups == truth)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_digest_idx")
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
