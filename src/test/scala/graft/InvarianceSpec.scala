package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition-count invariance: every ORACLED query must produce a
  * bit-identical result multiset under different shuffle-partition
  * settings — the local stand-in for "same answer on 4 cores and 1000
  * executors". Catches the whole class of partition-order
  * nondeterminism (float fold order, unstable top-1 picks, row_number
  * ties) that a single-configuration oracle compare cannot see.
  *
  * The 4 declared rows-only queries are excluded on principle:
  * match_ml (LBFGS gradients fold per-partition), ann_ivf and
  * ann_pq_fit (KMeans init samples per-partition) are float-iterative
  * by nature; cluster_max_bipartite would pass but shares the
  * rows-only gate, so it stays with its property spec. (sim_registry
  * gained a composed oracle in r6 and is invariance-gated like any
  * oracled query.)
  */
class InvarianceSpec extends AnyFunSuite {
  import TestSpark._

  private val rowsOnly = Set("match_ml", "ann_ivf", "cluster_max_bipartite", "ann_pq_fit")

  private def hashOf(name: String): (Long, Long) = {
    val df = SparkEntry.queries(name)(spark, sf)
    val r = df.agg(
      coalesce(expr(s"bit_xor(xxhash64(${df.columns.map(c => s"`$c`").mkString(",")}))"),
        lit(0L)),
      count(lit(1))).collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  test("every oracled query is shuffle-partition-count invariant (3 vs 7)") {
    val names = SparkEntry.queries.keys.toSeq.sorted.filterNot(rowsOnly)
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    for (name <- names) {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      val h3 = hashOf(name)
      Bench.clearSessionState(spark)
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val h7 = hashOf(name)
      Bench.clearSessionState(spark)
      if (h3 != h7) failures += s"$name: 3-part $h3 != 7-part $h7"
    }
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    assert(failures.isEmpty, failures.mkString("; "))
  }
}
