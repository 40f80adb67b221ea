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

  test("graft_vec_* SQL functions register and evaluate") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |       graft_vec_l2sq(array(0.0d, 0.0d), array(3.0d, 4.0d)) AS l2,
        |       graft_vec_l1(array(1.0d, -1.0d), array(-1.0d, 1.0d)) AS l1,
        |       graft_hyperplane_bits(array(1.0d, 1.0d, 1.0d, 1.0d), 4, 4) AS b
        |""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 25.0)
    assert(r.getDouble(2) == 4.0)
    val expect = (0 until 4).map { j =>
      val s = (1 to 4).map(d => graft.functions.VecKernels.planeSign(j, d)).sum
      if (s > 0) '1' else '0'
    }.mkString
    assert(r.getString(3) == expect)
  }

  test("graft_det_ln SQL function registers, casts ints, matches the kernel bits") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_det_ln(1024) AS a, graft_det_ln(3.5d) AS b, graft_det_ln(1) AS c"
    ).collect()(0)
    assert(r.getDouble(0) == graft.functions.DetMath.computeLn(1024.0))
    assert(r.getDouble(1) == graft.functions.DetMath.computeLn(3.5))
    assert(r.getDouble(2) == 0.0)
    assert(math.abs(r.getDouble(0) - math.log(1024.0)) < 1e-12)
    val e = spark.sql("SELECT graft_det_exp(1), graft_det_exp(0.0d)").collect()(0)
    assert(e.getDouble(0) == graft.functions.DetMath.computeExp(1.0))
    assert(e.getDouble(1) == 1.0)
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
