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

  /** Exact floor(x / w) bin index in pure long arithmetic, wrap-safe
    * over the FULL long domain: truncating `div` corrected by the
    * remainder sign. (floor via double mis-bins beyond 2^53; the
    * mod-subtract form `x - pmod(x, w)` underflows near Long.MinValue
    * with ANSI off — the quotient form has neither failure mode, since
    * |x div w| ≤ |x| and the remainder stays in (-w, w).)
    */
  private[graft] def binSql(c: String, w: Long): String = {
    val q = "`" + c.replace("`", "``") + "`"
    s"(($q div ${w}L) + (CASE WHEN $q % ${w}L < 0 THEN -1 ELSE 0 END))"
  }

  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("_bin", expr(binSql(pointCol, binWidth)))
    val iv = intervals
      .withColumn("_bin", explode(sequence(
        expr(binSql(loCol, binWidth)), expr(binSql(hiCol, binWidth)))))
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
    def binned(df: DataFrame, id: String, lo: String, hi: String) =
      df.select(col(id), col(lo), col(hi),
        explode(sequence(
          expr(binSql(lo, binWidth)), expr(binSql(hi, binWidth)))).as("_bin"))
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
