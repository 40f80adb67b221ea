package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.fusion.Fusion
import graft.profiling.Profiler
import graft.blocking.Blockers

class EngineApiSpec extends AnyFunSuite {
  import TestSpark._

  test("runEngine strategy table fuses one row per cluster") {
    val spark2 = spark
    import spark2.implicits._
    val recs = Seq(
      (1L, "x", 10.0, "2024-01-01"),
      (1L, "x", 20.0, "2024-01-05"),
      (1L, "y", 30.0, "2024-01-03"),
      (2L, "z", 5.0, "2024-02-01")
    ).toDF("cluster", "status", "price", "d")
      .withColumn("d", to_date(col("d")))
    val fused = Fusion.runEngine(recs, "cluster",
        Seq("status" -> "voting", "price" -> "average", "d" -> "most_recent"))
      .orderBy("cluster").collect()
    assert(fused.length == 2)
    val r1 = fused(0)
    assert(r1.getAs[String]("status") == "x")
    assert(r1.getAs[Double]("price") == 20.0)
    assert(r1.getAs[java.sql.Date]("d").toString == "2024-01-05")
    assert(r1.getAs[Long]("n_records") == 3L)
    intercept[IllegalArgumentException] {
      Fusion.runEngine(recs, "cluster", Seq("status" -> "nope"))
    }
  }

  test("approx profile matches exact counts within HLL tolerance") {
    val exact = Profiler.profile(Tables.customer(spark, sf)).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val approx = Profiler.profileApprox(Tables.customer(spark, sf)).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    approx.foreach { case (c, a) =>
      val e = exact(c)
      assert(math.abs(a - e).toDouble / math.max(e, 1) < 0.15, s"$c: approx $a vs exact $e")
    }
  }

  test("token pair estimate is an upper bound and tight without dedup effects") {
    val l = graft.blocking.EmScenario.custL(spark, sf)
    val r = graft.blocking.EmScenario.custR(spark, sf)
    val est = Blockers.estimateTokenPairs(l, r, "name").collect()(0).getLong(0)
    val real = Blockers.token(l, r, "name", "id").count()
    assert(est >= real)
  }
}
