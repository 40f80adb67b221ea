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

  /** Interval-overlap join — `l.lo <= r.hi AND r.lo <= l.hi` — via the
    * same discretization on BOTH sides. Two overlapping intervals share
    * at least one bin, so the bin equi-join is again a necessary
    * condition; `distinct` on the exact-filtered pairs removes the
    * multi-bin double matches (unlike points, an interval pair can
    * co-occupy several bins). Join output is the two id columns only —
    * re-join payloads by id afterwards (cheaper than dragging payload
    * through the replicated frames).
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      leftId: String, leftLo: String, leftHi: String,
      rightId: String, rightLo: String, rightHi: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def binSql(c: String) =
      s"(`$c` - ((`$c` % $binWidth + $binWidth) % $binWidth)) div $binWidth"
    def binned(df: DataFrame, id: String, lo: String, hi: String) =
      df.select(col(id), col(lo), col(hi),
        explode(sequence(expr(binSql(lo)), expr(binSql(hi)))).as("_bin"))
    val l = binned(left, leftId, leftLo, leftHi)
    val r = binned(right, rightId, rightLo, rightHi)
      .withColumnRenamed(rightLo, s"_r_$rightLo")
      .withColumnRenamed(rightHi, s"_r_$rightHi")
    l.join(r, "_bin")
      .filter(col(leftLo) <= col(s"_r_$rightHi") && col(s"_r_$rightLo") <= col(leftHi))
      .select(col(leftId), col(rightId))
      .distinct()
  }
}
