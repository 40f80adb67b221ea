package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 additions, third batch: inclusion-dependency discovery,
  * meta-blocking (WEP), batch sessionization, last-touch attribution.
  */
class Round8cSpec extends AnyFunSuite {
  import TestSpark._

  test("inclusionDeps: finds the planted FK edge, refutes the reverse") {
    val spark2 = spark
    import spark2.implicits._
    // fk ⊆ pk (every fk value exists in pk); pk ⊄ fk (pk value 5 unused);
    // NULL fk folds to the sentinel, which pk does NOT contain — so a
    // nullable FK column only holds against a side carrying the sentinel
    val fkSide = Seq(Some(1L), Some(2L), Some(2L), None).toDF("fk")
    val pkSide = Seq(1L, 2L, 5L).toDF("pk")
    val nullPk = Seq(Some(1L), Some(2L), Some(5L), None).toDF("npk")
    val got = graft.profiling.Profiler.inclusionDeps(Seq(
        ("a.fk", fkSide, "fk"), ("b.pk", pkSide, "pk"), ("c.npk", nullPk, "npk")))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getBoolean(4))).toMap
    assert(!got(("a.fk", "b.pk")))      // NULL sentinel missing from pk
    assert(got(("a.fk", "c.npk")))      // nullable pk side: holds
    assert(got(("b.pk", "c.npk")))
    assert(!got(("b.pk", "a.fk")))      // 5 refutes the reverse
    assert(!got(("c.npk", "a.fk")))
  }

  test("inclusionDeps: n_missing counts exactly the refuting values") {
    val spark2 = spark
    import spark2.implicits._
    val a = Seq(1L, 2L, 3L, 4L).toDF("x")
    val b = Seq(1L, 2L).toDF("y")
    val row = graft.profiling.Profiler.inclusionDeps(Seq(
        ("a", a, "x"), ("b", b, "y")))
      .filter(col("lhs") === "a").collect()(0)
    assert(row.getLong(2) == 4L && row.getLong(3) == 2L) // 3, 4 missing
  }

  test("block_meta: WEP gate is the exact integer mean, kept monotone in weight") {
    val rows = graft.blocking.BlockQueries.blockMeta(spark, sf).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val total = rows.map(r => r._1 * r._3).sum
    val nPairs = rows.map(_._3).sum
    rows.foreach { case (cbs, kept, _) =>
      assert(kept == (cbs * nPairs >= total),
        s"WEP gate mismatch at cbs=$cbs") }
    // monotone: once kept, every higher weight is kept
    val sorted = rows.sortBy(_._1)
    assert(sorted.map(_._2).dropWhile(!_).forall(identity))
  }

  test("events_sessionize: inter-session gaps exceed 30 min, intra invariants hold") {
    val sess = ExtraQueries.eventsSessionize(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(sess.nonEmpty)
    val gapUs = 30L * 60 * 1000000
    sess.groupBy(_._1).foreach { case (_, ss) =>
      val ordered = ss.sortBy(_._2)
      // session indices are 1..k contiguous, start <= end, duration exact
      assert(ordered.map(_._2).toSeq == (1L to ordered.length).toSeq)
      ordered.foreach { s =>
        assert(s._3 <= s._4 && s._6 == s._4 - s._3 && s._5 >= 1L) }
      // a new session only opens after a strict > 30 min silence
      ordered.sliding(2).foreach {
        case Array(p, n) => assert(n._3 - p._4 > gapUs)
        case _ => ()
      }
    }
  }

  test("mine_itemsets: canonical pair order, min support, total-order head") {
    val rows = ExtraQueries.mineItemsets(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty && rows.length <= 100)
    rows.foreach { case (a, b, sup) => assert(a < b && sup >= 2L) }
    // sorted by (support desc, item1, item2) — the deterministic head
    assert(rows.sortBy { case (a, b, sup) => (-sup, a, b) }.toSeq == rows.toSeq)
  }

  test("events_markov: transitions reconcile with events; rows floor-normalize") {
    val spark2 = spark
    import spark2.implicits._
    val rows = ExtraQueries.eventsMarkov(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val e = Tables.events(spark, sf)
    val nEvents = e.count()
    val nUsers = e.select("user_id").distinct().count()
    // every event except each user's last contributes one transition
    assert(rows.map(_._3).sum == nEvents - nUsers)
    // per-row: floor-milli probabilities sum to 1000 - (0..k-1)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val s = rs.map(_._4).sum
      assert(s <= 1000L && s > 1000L - rs.length)
    }
  }

  test("q3_topk_per_group: exactly ≤3 ranked suppliers per nation, rank dense from 1") {
    val rows = CoreQueries.q3TopkPerGroup(spark, sf).collect()
      .map(r => (r.getAs[Number](0).longValue(), r.getAs[Number](1).intValue()))
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val rks = rs.map(_._2).sorted.toSeq
      assert(rks == (1 to rks.length) && rks.length <= 3)
    }
  }

  test("q4_rollup: subtotal levels reconcile exactly (grand = flags = details)") {
    val rows = CoreQueries.q4Rollup(spark, sf).collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getLong(2), r.getLong(5), r.getLong(6)))
    val detail = rows.filter(r => r._4 == 0L && r._5 == 0L).map(_._3).sum
    val byFlag = rows.filter(r => r._4 == 0L && r._5 == 1L).map(_._3).sum
    val grand = rows.filter(r => r._4 == 1L && r._5 == 1L).map(_._3)
    assert(grand.length == 1 && grand.head == detail && byFlag == detail)
  }

  test("profile_ldiv: risk counts reconcile; diversity bounded by class size") {
    val r = graft.profiling.ProfileQueries.profileLdiv(spark, sf).collect()(0)
    val (nClasses, undiverse, atRisk) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(undiverse <= nClasses && atRisk >= undiverse) // ≥1 row per class
    assert(r.getLong(3) >= 1L && r.getLong(4) >= r.getLong(3))
  }

  test("profile_benford: digits 1-9 partition all orders; law constants attached") {
    val spark2 = spark
    import spark2.implicits._
    val rows = graft.profiling.ProfileQueries.profileBenford(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq.sorted == (1 to 9).map(_.toString))
    assert(rows.map(_.getLong(1)).sum == Tables.orders(spark, sf).count())
    val law = Map("1" -> 301L, "2" -> 176L, "3" -> 124L, "4" -> 96L,
      "5" -> 79L, "6" -> 66L, "7" -> 57L, "8" -> 51L, "9" -> 45L)
    rows.foreach(r => assert(r.getLong(3) == law(r.getString(0))))
  }

  test("events_rfm: segments partition users; scores in 1..3; tertiles roughly balance") {
    val rows = ExtraQueries.eventsRfm(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val purchasers = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(rows.map(_._4).sum == purchasers)
    rows.foreach { case (a, b, c, _) =>
      assert(Seq(a, b, c).forall(x => x >= 1 && x <= 3)) }
    // each dimension actually discriminates (≥2 distinct scores; ties
    // at both tertile cutoffs can legitimately empty the middle band)
    for (dim <- 0 to 2) {
      val marg = rows.groupBy(r => dim match {
        case 0 => r._1; case 1 => r._2; case _ => r._3
      }).view.mapValues(_.map(_._4).sum).toMap
      assert(marg.keySet.subsetOf(Set(1L, 2L, 3L)) && marg.size >= 2,
        s"dim $dim marginals: $marg")
    }
  }

  test("mine_assoc_rules: lift is direction-symmetric; confidence bounded by 1000") {
    val rows = ExtraQueries.mineAssocRules(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
    assert(rows.nonEmpty)
    val m = rows.toMap
    rows.foreach { case ((a, b), (supAb, conf, lift)) =>
      assert(conf >= 0L && conf <= 1000L && supAb >= 2L)
      // lift = sup_ab·N/(sup_a·sup_b) is symmetric in (a, b); when the
      // reverse rule also survived the top-50 cut they must agree
      m.get((b, a)).foreach { case (s2, _, l2) =>
        assert(s2 == supAb && l2 == lift, s"asymmetric lift for ($a,$b)")
      }
    }
  }

  test("events_attribution: buckets partition all purchases; revenue reconciles") {
    val spark2 = spark
    import spark2.implicits._
    val rows = ExtraQueries.eventsAttribution(spark, sf).collect()
    val e = Tables.events(spark, sf).filter(col("event_type") === "purchase")
      .agg(count(lit(1)), sum(Tables.cents(col("value")))).collect()(0)
    assert(rows.map(_.getLong(1)).sum == e.getLong(0))
    val revCents = rows.map(r => math.rint(r.getDouble(2) * 100).toLong).sum
    assert(revCents == e.getLong(1))
    // channels are 0..4 plus at most one NULL bucket
    val chs = rows.map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).toSet
    assert(chs.subsetOf(Set(-1L, 0L, 1L, 2L, 3L, 4L)))
  }
}
