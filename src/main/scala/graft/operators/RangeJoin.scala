package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join — `l.p BETWEEN r.lo AND r.hi` — which
  * Spark plans as BroadcastNestedLoopJoin (or a cartesian) because
  * there is no equi-key: the classic silent scale-killer.
  *
  * Spark-first rewrite: discretize the number line into fixed-width
  * bins. Each interval is exploded onto every bin it overlaps, each
  * point onto its single bin, and the join becomes a plain EQUI-join
  * on the bin id with an exact `lo <= p AND p <= hi` post-filter (the
  * bin is a necessary condition, so no matches are lost; distinct is
  * unnecessary because each point lives in exactly one bin).
  *
  * `binWidth` is a real tuning choice: ≈ the typical interval width.
  * Too small → intervals explode across many bins (row blow-up); too
  * large → many false candidates reach the post-filter. Replication
  * factor is (interval_width / binWidth) + 1 — bounded and predictable,
  * unlike the nested loop's |L|·|R|.
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // exact integer floor division — subtract the non-negative mod then
    // integral `div`; everything stays in long arithmetic and is correct
    // for negatives. floor(x / w) would round through a double and
    // mis-bin values beyond 2^53.
    def binSql(c: String) =
      s"(`$c` - ((`$c` % $binWidth + $binWidth) % $binWidth)) div $binWidth"
    val p = points.withColumn("_bin", expr(binSql(pointCol)))
    val iv = intervals
      .withColumn("_bin", explode(sequence(
        expr(binSql(loCol)), expr(binSql(hiCol)))))
    p.join(iv, "_bin")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("_bin")
  }
}
