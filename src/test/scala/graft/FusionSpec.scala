package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.fusion.Fusion

class FusionSpec extends AnyFunSuite {
  import TestSpark._

  private def src = {
    val spark2 = spark
    import spark2.implicits._
    Seq(
      (1L, "A", "x", 10.0, "2024-01-01"),
      (1L, "B", "y", 20.0, "2024-01-03"),
      (1L, "C", "x", 30.0, "2024-01-02"),
      (2L, "A", null.asInstanceOf[String], 5.0, "2024-02-01"),
      (2L, "B", "z", 7.0, "2024-02-02")
    ).toDF("cluster", "src", "v", "price", "d")
      .withColumn("d", to_date(col("d")))
  }

  test("voting: majority wins, tie confidence formula, nulls excluded") {
    val rows = Fusion.voting(src, "cluster", "v").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2), r.getBoolean(3))).toMap
    // cluster 1: x=2, y=1 → x, conf 0.5 + (2-1)/3*0.5 = 0.66667, majority
    assert(rows(1L) == ("x", 0.66667, true))
    // cluster 2: only z (null dropped) → conf 1.0
    assert(rows(2L) == ("z", 1.0, true))
  }

  test("weighted voting: weights flip the winner") {
    val w = when(col("src") === "B", 10.0).otherwise(1.0)
    val rows = Fusion.weightedVoting(src, "cluster", "v", w).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows(1L) == "y") // B's value carries weight 10 vs x's 2
  }

  test("favour_sources: first valid value in preference order") {
    val rows = Fusion.favourSources(src, "cluster", "v", "src", Seq("A", "B"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows(1L) == "x") // A valid
    assert(rows(2L) == "z") // A null → falls to B
  }

  test("string resolvers: longest/shortest/most_complete with tie → value asc") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((1L, "bb"), (1L, "aa"), (1L, "c c")).toDF("cluster", "v")
    val r = Fusion.stringResolvers(df, "cluster", "v").collect()(0)
    assert(r.getString(1) == "c c") // longest (len 3)
    assert(r.getString(2) == "aa")  // shortest tie (aa, bb) → aa
    assert(r.getString(3) == "aa")  // most non-ws chars: aa/bb/cc all 2 → value asc
  }

  test("numeric resolvers on cents are exact") {
    val r = Fusion.numericResolvers(src.filter(col("cluster") === 1), "cluster",
      Tables.cents(col("price"))).collect()(0)
    assert(r.getDouble(1) == 20.0) // avg
    assert(r.getDouble(2) == 20.0) // median
    assert(r.getDouble(3) == 30.0) // max
    assert(r.getDouble(4) == 10.0) // min
    assert(r.getDouble(5) == 60.0) // sum
  }

  test("date resolvers: most_recent / earliest") {
    val r = Fusion.dateResolvers(src.filter(col("cluster") === 1), "cluster", col("d"))
      .collect()(0)
    assert(r.getDate(1).toString == "2024-01-03")
    assert(r.getDate(2).toString == "2024-01-01")
  }

  test("list resolvers: union sorted, intersection across all records") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((1L, Seq("b", "a")), (1L, Seq("a", "c"))).toDF("cluster", "l")
    val r = Fusion.listResolvers(df, "cluster", col("l"), 2).collect()(0)
    assert(r.getString(1) == "a,b,c") // distinct union, sorted
    assert(r.getString(2) == "a")
    assert(r.getString(3) == "a")
  }

  test("consistency report: conflict share per attribute") {
    val rows = Fusion.consistencyReport(src, "cluster", Seq("v", "price"))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(rows("v") == 0.5)     // cluster 1 conflicted (x,y), cluster 2 single distinct
    assert(rows("price") == 1.0) // both clusters have >1 distinct price
  }
}
