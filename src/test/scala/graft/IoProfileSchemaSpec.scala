package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.Loaders
import graft.profiling.Profiler
import graft.schema.SchemaMatch

class IoProfileSchemaSpec extends AnyFunSuite {
  import TestSpark._

  test("provenance ids are key-derived and stable under repartition") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((7L, "x"), (42L, "y")).toDF("k", "v")
    val a = Loaders.withProvenance(df, "ds", "k", "p.parquet").collect()
      .map(r => r.getLong(1) -> r.getString(0)).toMap
    val b = Loaders.withProvenance(df.repartition(8), "ds", "k", "p.parquet").collect()
      .map(r => r.getLong(1) -> r.getString(0)).toMap
    assert(a(7L) == "ds-000000007" && a(42L) == "ds-000000042")
    assert(a == b) // partitioning cannot change ids
  }

  test("flatten walks nested structs into parent_child columns") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((1L, ("a", ("b", 2)))).toDF("id", "s")
      .select(col("id"), col("s._1").as("x"),
        struct(col("s._2._1").as("y"), col("s._2._2").as("z")).as("nest"))
    val flat = Loaders.flatten(df)
    assert(flat.columns.toSeq == Seq("id", "x", "nest_y", "nest_z"))
  }

  test("histogram: exact long binning, bins cover [0, bins), counts sum to n") {
    val spark2 = spark
    import spark2.implicits._
    val df = (0L to 999L).toDF("x")
    val h = graft.profiling.Profiler.histogram(df, "x", 10).orderBy("bin").collect()
    assert(h.length == 10 && h.map(_.getLong(1)).sum == 1000L)
    assert(h.forall(r => r.getLong(1) == 100L)) // uniform → equal bins
    assert(h.head.getLong(2) == 0L && h.last.getLong(3) == 999L)
    assert(h.map(_.getLong(0)).toSeq == (0L to 9L))
  }

  test("profiler: one row per column with exact stats") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(("a", 1), ("b", 1), (null.asInstanceOf[String], 2)).toDF("s", "n")
    val p = Profiler.profile(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(p("s") == (3L, 1L, 2L))
    assert(p("n") == (3L, 0L, 2L))
  }

  test("instance matcher: identical value sets → sim 1.0") {
    val spark2 = spark
    import spark2.implicits._
    val l = Seq((1, "x"), (2, "y")).toDF("ln", "lv")
    val r = Seq((1, "p"), (2, "q")).toDF("rn", "rv")
    val sims = SchemaMatch.instanceBased(l, Seq("ln", "lv"), r, Seq("rn", "rv"), 0.01)
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getDouble(2)).toMap
    assert(sims(("ln", "rn")) == 1.0)
    assert(!sims.contains(("lv", "rv"))) // {x,y} vs {p,q}: no overlap
  }

  test("duplicate-based matcher: agreement shares over gold pairs") {
    val spark2 = spark
    import spark2.implicits._
    val gold = Seq((1L, 11L), (2L, 12L)).toDF("id1", "id2")
    val l = Seq((1L, "a", "k"), (2L, "b", "k")).toDF("id", "p", "q")
    val r = Seq((11L, "a", "z"), (12L, "c", "z")).toDF("id", "p", "q")
    val m = SchemaMatch.duplicateBased(gold, l, r, "id", Seq("p", "q"), Seq("p", "q"))
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getDouble(2)).toMap
    assert(m(("p", "p")) == 0.5) // a=a agrees, b≠c
    assert(m(("q", "q")) == 0.0) // k≠z
  }

  test("sweepThresholds: symmetric match, duplicate-correct once, complete mode") {
    val spark2 = spark
    import spark2.implicits._
    // (a,b) and its reverse (b,a) both predicted → both count in
    // `matched`, the canonical positive counts ONCE in `correct`;
    // (c,d) hits an explicit negative; (e,f) matches nothing.
    val corr = Seq(("a", "b", 0.9), ("b", "a", 0.85), ("c", "d", 0.7), ("e", "f", 0.6))
      .toDF("source_col", "target_col", "score")
    val ev = Seq(("a", "b", true), ("x", "y", true), ("c", "d", false))
      .toDF("source_col", "target_col", "label")
    def sweep(complete: Boolean) =
      SchemaMatch.sweepThresholds(corr, ev, Seq(0.0, 0.87), complete)
        .collect().map(r => r.getDouble(0) ->
          (r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    // explicit: θ=0 → matched {ab, ba, cd}=3, correct=1, total=2, missing=1
    val ex = sweep(complete = false)
    assert(ex(0.0) == ((1L, 3L, 2L, 1L)))
    // θ=0.87 → only (a,b) passes: matched=1, correct=1
    assert(ex(0.87) == ((1L, 1L, 2L, 1L)))
    // complete: every predicted tuple counts in matched → 4 at θ=0
    val cm = sweep(complete = true)
    assert(cm(0.0) == ((1L, 4L, 2L, 1L)))
  }

  test("blocker pair estimate matches materialized pair count") {
    val l = graft.blocking.EmScenario.custL(spark, sf)
    val r = graft.blocking.EmScenario.custR(spark, sf)
    val est = graft.blocking.Blockers.estimateStandardPairs(l, r, Seq("seg", "nat"))
      .collect()(0).getLong(0)
    val real = graft.blocking.Blockers.standard(l, r, Seq("seg", "nat"), "id").count()
    assert(est == real)
  }

  test("io_partitioned: source filter becomes a PARTITION filter (directory pruning, not scan+discard)") {
    import org.apache.spark.sql.functions._
    assert(graft.io.IoQueries.ioPartitioned(spark, sf).count() > 0) // write + read-back
    val back = spark.read.parquet(graft.io.IoQueries.partitionedPath(sf))
      .filter(col("source") === "src1")
    val scan = back.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString("\n")
    // the filter must appear as a PartitionFilters entry on the scan
    // (planning-time directory pruning), NOT as a pushed data filter
    assert(scan.contains("PartitionFilters") &&
      scan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1").contains("source"),
      s"source not pruned at partition level:\n$scan")
    // and only the one directory's rows come back
    val direct = graft.Tables.documents(spark, sf).filter(col("source") === "src1").count()
    assert(back.count() == direct)
  }
}
