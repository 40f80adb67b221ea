package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.blocking.{Blockers, EmScenario}

class ExtensionsSpec extends AnyFunSuite {
  import TestSpark._

  test("graft_* SQL functions register and evaluate") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT round(graft_jaro('martha', 'marhta'), 5) AS j,
        |       round(graft_jaro_winkler('martha', 'marhta'), 5) AS jw,
        |       graft_damerau_levenshtein('abcd', 'abdc') AS dl,
        |       round(graft_needleman_wunsch('abc', 'abc'), 5) AS nw
        |""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 0.94444)
    assert(r.getDouble(1) == 0.96111)
    assert(r.getDouble(2) == 1.0)
    assert(r.getDouble(3) == 1.0)
  }

  test("salted standard blocker produces exactly the unsalted pair set") {
    val l = EmScenario.custL(spark, sf)
    val r = EmScenario.custR(spark, sf)
    val plain = Blockers.standard(l, r, Seq("seg", "nat"), "id").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val salted = Blockers.standardSalted(l, r, Seq("seg", "nat"), "id", 8).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(salted == plain)
    assert(plain.nonEmpty)
  }
}
