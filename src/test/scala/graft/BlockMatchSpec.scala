package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.blocking.{Blockers, EmScenario}
import graft.matching.Matching

class BlockMatchSpec extends AnyFunSuite {
  import TestSpark._

  test("standard blocker pairs only equal keys; token blocker prunes hot tokens") {
    val spark2 = spark
    import spark2.implicits._
    val l = Seq((1L, "acme corp", "x"), (2L, "beta inc", "y")).toDF("id", "name", "k")
    val r = Seq((10L, "ACME CORP", "x"), (20L, "gamma llc", "y")).toDF("id", "name", "k")

    val std = Blockers.standard(l, r, Seq("name"), "id").collect()
    assert(std.map(x => (x.getLong(0), x.getLong(1))).toSet == Set((1L, 10L)))

    // "corp"/"inc"/"llc" unique; with cap 1 every token block of >1 pair drops
    val tok = Blockers.token(l, r, "name", "id", 2, Some(1L)).collect()
    assert(tok.map(x => (x.getLong(0), x.getLong(1))).toSet == Set((1L, 10L)))
  }

  test("sorted neighbourhood: only cross-side pairs within window") {
    val spark2 = spark
    import spark2.implicits._
    val l = Seq((1L, "aa"), (2L, "cc"), (3L, "ee")).toDF("id", "k")
    val r = Seq((11L, "ab"), (12L, "cd")).toDF("id", "k")
    // order: aa(L1) ab(R11) cc(L2) cd(R12) ee(L3); window 1 → adjacent cross pairs
    val got = Blockers.sortedNeighbourhood(l, r, "k", "id", 1).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == Set((1L, 11L), (2L, 11L), (2L, 12L), (3L, 12L)))
  }

  test("blocking eval: completeness 1.0 when gold subset of candidates") {
    val spark2 = spark
    import spark2.implicits._
    val cand = Seq((1L, 10L), (1L, 20L), (2L, 20L)).toDF("id1", "id2")
    val gold = Seq((1L, 10L), (2L, 20L)).toDF("id1", "id2")
    val row = Blockers.evaluate(cand, gold, 100L).collect()(0)
    assert(row.getAs[Double]("pair_completeness") == 1.0)
    assert(row.getAs[Double]("pair_quality") == math.rint(2.0 / 3.0 * 1e5) / 1e5)
    assert(row.getAs[Long]("total_candidates") == 3L)
  }

  test("rule matcher finds exactly the scenario gold at sf0.001") {
    val l = EmScenario.custL(spark, sf)
    val r = EmScenario.custR(spark, sf)
    val cands = Blockers.standard(l, r, Seq("seg", "nat"), "id")
    val pred = Matching.ruleMatch(cands, l, r, "id",
      Seq(graft.functions.sims.jaroWinkler(col("l_name"), col("r_name")) -> 1.0),
      threshold = 0.97)
    val gold = EmScenario.gold(spark, sf)
    val m = Matching.evaluate(pred, gold).collect()(0)
    assert(m.getAs[Double]("recall") == 1.0, s"recall ${m}")
    assert(m.getAs[Double]("precision") == 1.0, s"precision ${m}")
  }
}
