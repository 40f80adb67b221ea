package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the latest right row of the
  * same key with `r.ts <= l.ts` (DuckDB/kdb `ASOF JOIN` semantics,
  * which Spark has no native operator for).
  *
  * Spark-first design: NOT a range join (which degenerates toward
  * per-key cross products and is why the naive `l.ts >= r.ts` theta
  * join dies at scale). Both sides are tagged and UNIONED, then one
  * window per key ordered by (ts, tag) carries the last non-null right
  * value forward onto each left row:
  *
  *   - exactly ONE shuffle (hash on the key) + an in-partition sort —
  *     the same cost as any keyed aggregation, regardless of how many
  *     right rows precede each left row;
  *   - ties (r.ts == l.ts) match, because right rows sort before left
  *     rows at equal ts (tag 0 < 1);
  *   - a hot key is one partition's sort — salt upstream or split by
  *     time range if a single key's history exceeds a partition.
  *
  * Right must be unique per (key, ts) — on duplicates "the" latest row
  * is undefined in any engine; pre-aggregate first.
  */
object AsofJoin {

  /** `tolerance`: maximum allowed staleness `l.ts - r.ts` (same unit
    * as the ts column); a match older than that is nulled out — "don't
    * enrich with a quote from last year". None = unbounded (pure ASOF).
    */
  def asofBackward(left: DataFrame, right: DataFrame,
      key: String, ts: String, tolerance: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq.filterNot(c => c == key || c == ts)
    val rightCols = right.columns.toSeq.filterNot(c => c == key || c == ts)
    val overlap = leftCols.toSet & rightCols.toSet
    require(overlap.isEmpty, s"overlapping payload columns: $overlap")
    require(tolerance.isEmpty ||
      left.schema(ts).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      "tolerance requires a numeric ts column (e.g. unix_micros)")

    def nullAs(df: DataFrame, c: String): Column =
      lit(null).cast(df.schema(c).dataType).as(c)

    val l = left.select(
      (Seq(col(key), col(ts), lit(1).as("_tag")) ++
        leftCols.map(col) ++ rightCols.map(nullAs(right, _))): _*)
    val r = right.select(
      (Seq(col(key), col(ts), lit(0).as("_tag")) ++
        leftCols.map(nullAs(left, _)) ++ rightCols.map(col)): _*)

    val w = Window.partitionBy(key)
      .orderBy(col(ts), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the matched right row's own ts rides along to drive the
    // staleness check (and is dropped again afterwards)
    val matchTs = last(when(col("_tag") === 0, col(ts)), ignoreNulls = true)
      .over(w).as("_rts")
    val carried = l.unionByName(r)
      .select((Seq(col(key), col(ts), col("_tag"), matchTs) ++ leftCols.map(col) ++
        rightCols.map(c => last(col(c), ignoreNulls = true).over(w).as(c))): _*)
    val fresh = tolerance match {
      case None => carried
      case Some(tol) =>
        val stale = col("_rts").isNull || (col(ts) - col("_rts")) > tol
        carried.select((Seq(col(key), col(ts), col("_tag"), col("_rts")) ++
          leftCols.map(col) ++
          rightCols.map(c => when(stale, nullAs(right, c)).otherwise(col(c)).as(c))): _*)
    }
    fresh.filter(col("_tag") === 1).drop("_tag", "_rts")
  }

  /** Forward as-of: the EARLIEST right row with `r.ts >= l.ts` — the
    * mirror image, implemented by negating the ts on both sides and
    * delegating (tolerance then bounds `r.ts - l.ts`). Requires a
    * numeric ts column.
    */
  def asofForward(left: DataFrame, right: DataFrame,
      key: String, ts: String, tolerance: Option[Long] = None): DataFrame = {
    require(left.schema(ts).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      "asofForward requires a numeric ts column (e.g. unix_micros)")
    asofBackward(
        left.withColumn(ts, -col(ts)),
        right.withColumn(ts, -col(ts)), key, ts, tolerance)
      .withColumn(ts, -col(ts))
  }
}
