package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.clustering.Clusterers
import graft.extraction.Extract
import graft.fusion.Fusion
import graft.matching.Matching
import graft.normalization.Normalize

/** Round-4 operators: threshold sweep, cluster diagnostics, web-table
  * normalization, unit/type conversion, duplicate summary, dataset
  * normalizer, fusion provenance/coverage, extractor pipeline.
  */
class Round4Spec extends AnyFunSuite {
  import TestSpark._

  test("thresholdSweep: P/R/F1 at the rule-match operating points") {
    val spark2 = spark
    import spark2.implicits._
    val scored = Seq((1L, 11L, 0.9), (2L, 12L, 0.6), (3L, 13L, 0.3))
      .toDF("id1", "id2", "score")
    val gold = Seq((1L, 11L), (3L, 13L), (4L, 14L)).toDF("id1", "id2")
    val rows = Matching.thresholdSweep(scored, gold, Seq(0.0, 0.5, 1.0))
      .collect().map(r => r.getDouble(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // θ=0.0: all 3 predicted; gold hits = {1,3}; miss = {4}
    assert(rows(0.0) == ((2L, 1L, 1L)))
    // θ=0.5: predicted {1,2}; tp={1}; fn={3,4}
    assert(rows(0.5) == ((1L, 1L, 2L)))
    // θ=1.0: nothing predicted
    assert(rows(1.0) == ((0L, 0L, 3L)))
  }

  test("cluster diagnostics: sizes, transitivity, similarity stats") {
    val spark2 = spark
    import spark2.implicits._
    // triangle {1,2,3} (consistent) + open path {10,11,12} (inconsistent)
    val scored = Seq(
      (1L, 2L, 0.9), (2L, 3L, 0.8), (1L, 3L, 0.7),
      (10L, 11L, 0.6), (11L, 12L, 0.5)
    ).toDF("id1", "id2", "score")
    val dist = Clusterers.clusterSizeDistribution(scored.select("id1", "id2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == Map(3L -> 2L))
    val rep = Clusterers.clusterConsistencyReport(scored)
      .orderBy("cluster_id").collect()
    assert(rep.length == 2)
    val tri = rep(0)
    assert(tri.getAs[Long]("cluster_id") == 1L)
    assert(tri.getAs[Long]("total_edges") == 3L)
    assert(tri.getAs[Long]("expected_edges") == 3L)
    assert(tri.getAs[Boolean]("is_consistent"))
    assert(math.abs(tri.getAs[Double]("avg_similarity") - 0.8) < 1e-9)
    val path = rep(1)
    assert(!path.getAs[Boolean]("is_consistent"))
    assert(path.getAs[Long]("total_edges") == 2L)
    assert(path.getAs[Long]("expected_edges") == 3L)
    assert(path.getAs[Double]("min_similarity") == 0.5)
  }

  test("winsorize clamps tails but preserves NULLs (pandas clip parity)") {
    val spark2 = spark
    import spark2.implicits._
    val df = (Seq.tabulate(100)(i => Some(i.toDouble)) ++ Seq(None, None))
      .toDF("v")
    val out = Normalize.winsorize(df, "v", 0.10, 0.90).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out.count(_.isEmpty) == 2)                 // nulls stay null
    val vals = out.flatten
    assert(math.abs(vals.min - 9.9) < 1e-9 && math.abs(vals.max - 89.1) < 1e-9)
    assert(vals.count(v => math.abs(v - 9.9) < 1e-9) == 10 &&
      vals.count(v => math.abs(v - 89.1) < 1e-9) == 10)
  }

  test("profileNumeric: Int column beyond 46340 — squares widen to long before summing") {
    val spark2 = spark
    import spark2.implicits._
    // 1e6-scale ints: x*x wraps Int per-row if squared in native type
    val df = Seq(1000000, 2000000, 3000000).toDF("x")
    val r = graft.profiling.Profiler.profileNumeric(df, Seq("x")).collect().head
    assert(r.getAs[Double]("mean") == 2000000.0)
    assert(math.abs(r.getAs[Double]("std") - 1000000.0) < 1e-6)
  }

  test("webTableNormalize: entities, tags, web nulls, brackets") {
    val spark2 = spark
    import spark2.implicits._
    val in = Seq(
      "<b>Acme&nbsp;Corp</b>", "R&amp;D", "n/a", " ---  ", "A (x) B",
      "T&#42;V", null.asInstanceOf[String]
    ).toDF("v")
    val out = in.select(
      Normalize.webTableNormalize(col("v"), removeBrackets = true).as("c"))
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq("acme corp", "r&d", "NULL", "NULL", "a b",
      "t v", "NULL"))
    val deb = in.sparkSession.range(1).select(
      Normalize.removeBracketContent(lit("keep [drop] (gone) {x} it")).as("d"))
      .head().getString(0)
    assert(deb == "keep it")
  }

  test("convertUnit: linear registries + affine temperature + mismatches") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(
      (2.5, "kg", "g"), (3.0, "km", "m"), (212.0, "F", "C"),
      (25.0, "C", "K"), (1.0, "kg", "m"), (1.0, "kg", "K"), (1.0, "xx", "g")
    ).toDF("v", "fu", "tu")
    val out = df.select(Normalize.convertUnit(col("v"), col("fu"), col("tu")).as("c"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out(0).contains(2500.0))
    assert(out(1).contains(3000.0))
    assert(out(2).contains(100.0))
    assert(out(3).contains(298.15))
    assert(out(4).isEmpty) // cross-category
    assert(out(5).isEmpty) // linear → temperature
    assert(out(6).isEmpty) // unknown unit
  }

  test("convertTypes applies the detected schema; bad rows go NULL") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(("12", "3.5", "2024-01-31", "yes"), ("x", "?", "nope", "maybe"))
      .toDF("a", "b", "c", "d")
    val conv = Normalize.convertTypes(df,
      Seq("a" -> "long", "b" -> "double", "c" -> "datetime", "d" -> "bool"))
    val good = conv.filter(col("a").isNotNull).head()
    assert(good.getAs[Long]("a") == 12L)
    assert(good.getAs[Double]("b") == 3.5)
    assert(good.getAs[java.sql.Timestamp]("c").toString.startsWith("2024-01-31"))
    assert(good.getAs[Boolean]("d"))
    assert(conv.filter(col("a").isNull && col("b").isNull &&
      col("c").isNull && col("d").isNull).count() == 1L)
  }

  test("duplicateSummary: case-insensitive duplicate groups per column") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(("A", "u1"), ("a", "u2"), ("b", "u3"), ("c", null))
      .toDF("s", "t")
    val rows = Normalize.duplicateSummary(df, Seq("s", "t"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows("s") == ((4L, 3L, 2L))) // {a,a} duplicate pair, case-folded
    assert(rows("t") == ((4L, 3L, 0L))) // nulls excluded, rest unique
  }

  test("normalizeDataset strategy table folds into one projection") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(("  A&B  ", "N/A", "$12.50")).toDF("t", "n", "p")
    val out = Normalize.normalizeDataset(df,
      Seq("t" -> "text", "n" -> "nulls", "p" -> "currency")).head()
    assert(out.getAs[String]("t") == "a b")
    assert(out.isNullAt(1))
    assert(out.getAs[Double]("p") == 12.5)
    intercept[IllegalArgumentException] {
      Normalize.normalizeDataset(df, Seq("t" -> "nope"))
    }
  }

  test("fusion provenance names the winning source per strategy") {
    val spark2 = spark
    import spark2.implicits._
    val recs = Seq(
      (1L, "A", "short", "2024-01-01"),
      (1L, "B", "the longest value", "2024-03-01"),
      (1L, "C", "middle one", "2024-02-01")
    ).toDF("cluster", "src", "txt", "d")
    val prov = Fusion.provenance(recs, "cluster", "src", Seq(
      "txt" -> "longest_string", "txt" -> "shortest_string",
      "d" -> "most_recent", "txt" -> "voting"))
      .collect().map(r => (r.getString(1), r.getString(4)) ->
        (r.getString(2), r.getString(3))).toMap
    assert(prov(("txt", "longest_string")) == (("the longest value", "B")))
    assert(prov(("txt", "shortest_string")) == (("short", "A")))
    assert(prov(("d", "most_recent")) == (("2024-03-01", "B")))
    // all three values distinct → count tie → min value, min source
    assert(prov(("txt", "voting")) == (("middle one", "C")))
  }

  test("attributeCoverage reports per-source density and rollups") {
    val spark2 = spark
    import spark2.implicits._
    val recs = Seq(
      ("S1", "x", "p"), ("S1", null, "q"), ("S2", "y", null), ("S2", "z", null)
    ).toDF("src", "a", "b")
    val cov = Fusion.attributeCoverage(recs, "src", Seq("a", "b"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5))).toMap
    assert(cov(("a", "S1")) == ((1L, 2L, 0.5, 2L)))
    assert(cov(("a", "S2")) == ((2L, 2L, 1.0, 2L)))
    assert(cov(("b", "S2")) == ((0L, 2L, 0.0, 1L)))
  }

  test("extractor pipeline chains stages over earlier outputs") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((1L, "see $12.50 in 1997")).toDF("id", "text")
    val out = Extract.pipeline(df, Seq(
      d => Extract.applyRules(d, "text", Extract.BuiltinRules),
      d => d.withColumn("price_value", Normalize.parseCurrency(col("price"))),
      d => d.withColumn("decade", (col("year").cast("long") / 10).cast("long") * 10)
    )).head()
    assert(out.getAs[String]("price") == "$12.50")
    assert(out.getAs[Double]("price_value") == 12.5)
    assert(out.getAs[Long]("decade") == 1990L)
  }
}
