package graft.profiling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.DetMath

/** Mergeable one-pass sketches — the profiling primitives that make
  * 100 TB corpus statistics cheap: a sketch is built in a SINGLE scan
  * whose shuffle payload is the (tiny, fixed-size) sketch state, and
  * two sketches over disjoint splits merge into the sketch of the
  * union by pure element-wise arithmetic — which is exactly what
  * Spark's partial aggregation does for free when the sketch is
  * expressed as a groupBy over (cell, value) pairs. Every hash is the
  * repo's md5-hex-prefix law (Dedup.scala:21), so the DuckDB oracle
  * replays each sketch bit-for-bit: the estimates here are
  * hash-gated, not rows-only.
  *
  * Reference anchor: the reference profiles corpora with exact
  * pandas passes (analysis/profiling.py); these are the scale
  * substitutes a cluster deployment uses when exact per-column passes
  * stop being affordable.
  */
object Sketches {

  /** Salted md5 bucket of `item`: uniform in [0, w). Cross-engine law:
    * DuckDB `('0x'||substr(md5('<salt>'||x),1,13))::BIGINT % w` — 13
    * hex digits = 52 bits, exactly representable and positive in both
    * engines' BIGINT.
    */
  private[graft] def md5Bucket(salt: Column, item: Column, w: Int): Column =
    conv(substring(md5(concat(salt, item.cast("string"))), 1, 13), 16, 10)
      .cast("long") % w

  /** The d (row, bucket) CMS cells of a value, as an array of structs —
    * the explode payload [[cmsCounters]] builds from; public so the
    * streaming windowed variant ([[graft.streaming.Streams]]) shares
    * the identical cell law.
    */
  def cmsCells(item: Column, d: Int, w: Int): Column =
    array((0 until d).map { j =>
      struct(lit(j).as("j"), md5Bucket(lit(s"cms$j#"), item, w).as("bucket"))
    }: _*)

  /** The repo's 52-bit hash law as a plain value hash: 13 md5 hex
    * digits → a uniform long in [0, 2^52). Cross-engine:
    * DuckDB `('0x'||substr(md5(x),1,13))::BIGINT`.
    */
  def hash52(item: Column): Column =
    conv(substring(md5(item.cast("string")), 1, 13), 16, 10).cast("long")

  /** Size of the [[hash52]] value space. */
  val Hash52Space: Long = 1L << 52

  /** KMV distinct estimate from a [[graft.functions.BottomK]] array
    * column: fewer than k distinct hashes seen → the sketch IS the
    * distinct set (exact mode); otherwise the classic unbiased
    * (k−1)·|space| / h_(k) with exact integer division, so the
    * estimate is hash-gated, not a float.
    */
  def kmvEstimate(ks: Column, k: Int): Column =
    when(size(ks) < k, size(ks).cast("long"))
      .otherwise(idiv(lit((k - 1).toLong * Hash52Space), element_at(ks, k)))

  /** Exact integer division as a Column (`a div b`) — `/` on longs is
    * float division, which cannot carry the >2^53 numerators the KMV
    * estimators use.
    */
  def idiv(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(org.apache.spark.sql.catalyst.expressions.IntegralDivide(
      Bridge.expression(a), Bridge.expression(b)))
  }

  // ---- CountMin: heavy-hitter counts in d*w integers -----------------

  /** CountMin counter table: d salted hash rows of w buckets each,
    * built in ONE pass — explode the d (row, bucket) cells per record,
    * then a map-side-combined groupBy whose result is at most d*w
    * rows regardless of input size. Merging shards = summing counter
    * tables cell-wise, which IS this groupBy's merge step; the
    * per-executor partial sketches are what travels the wire, never
    * the records.
    */
  def cmsCounters(df: DataFrame, item: Column, d: Int, w: Int): DataFrame = {
    df.select(explode(cmsCells(item, d, w)).as("_jb"))
      .select(col("_jb.j").as("j"), col("_jb.bucket").as("bucket"))
      .groupBy("j", "bucket")
      .agg(count(lit(1)).as("c"))
  }

  /** Point-estimate counts for `candidates` (column `key`) against a
    * counter table: min over the d rows of the candidate's bucket
    * counter — the classic CMS upper bound (never underestimates;
    * overestimate ≤ collision mass). The counter table is at most d*w
    * rows, so the lookup join broadcasts.
    */
  def cmsEstimate(counters: DataFrame, candidates: DataFrame, key: String,
      d: Int, w: Int): DataFrame = {
    val probes = candidates
      .withColumn("_j", explode(array((0 until d).map(j => lit(j)): _*)))
      .withColumn("_bucket",
        md5Bucket(concat(lit("cms"), col("_j").cast("string"), lit("#")), col(key), w))
    probes
      .join(broadcast(counters),
        probes("_j") === counters("j") && probes("_bucket") === counters("bucket"))
      .groupBy(col(key))
      .agg(min(col("c")).as("cms_cnt"))
  }

  // ---- HyperLogLog: distinct counts in 2^p small integers ------------

  /** HLL register frame: register = first p bits of md5 (p=8 → first
    * two hex digits), rank = position of the leftmost 1-bit in the
    * next 52 bits (1..53, 53 when they are all zero). groupBy
    * register → max(rank) is the whole build: one pass, ≤ 2^p rows
    * out, and the union of two corpora is the element-wise max of
    * their register frames — which is again exactly this groupBy's
    * own merge step.
    *
    * Only p = 8 is wired (two whole hex digits keep the register
    * derivation inside the cross-engine substring law).
    */
  /** The register id of a value: its first p=8 md5 bits. */
  def hllRegCol(item: Column): Column =
    conv(substring(md5(item.cast("string")), 1, 2), 16, 10).cast("long")

  /** The rank of a value: leftmost-1 position of md5 bits 9..60. */
  def hllRankCol(item: Column): Column = {
    val w = conv(substring(md5(item.cast("string")), 3, 13), 16, 10).cast("long")
    when(w === 0, lit(53L)).otherwise(lit(53L) - length(bin(w)))
  }

  def hllRegisters(df: DataFrame, item: Column): DataFrame =
    df.select(hllRegCol(item).as("reg"), hllRankCol(item).as("rank"))
      .groupBy("reg")
      .agg(max("rank").as("r"))

  private val HllP = 8
  private val HllM = 1 << HllP // 256
  /** alpha_m numerator/denominator as exact doubles: E_raw =
    * alpha_m * m^2 / sum(2^-r) = (7213 * m^3 * 2^53) / ((10000m+10790) * S)
    * with S = sum over registers of 2^(53-r) — an exact long
    * (≤ m * 2^53 = 2^61). 7213 * 2^77 has 13 significand bits: exact
    * as a double; the estimate is then two correctly-rounded IEEE ops
    * (one multiply, one divide) → bit-identical cross-engine.
    */
  private[profiling] val HllRawNum: Double = 7213.0 * math.pow(2, 3 * HllP + 53)
  private[profiling] val HllRawDen: Double = (10000L * HllM + 10790L).toDouble
  private[profiling] val HllLnM: Double = DetMath.computeLn(HllM.toDouble)

  /** One-row summary of a register frame: occupied register count, the
    * exact integer state S = Σ 2^(53-r) (absent registers contribute
    * 2^53), the raw HLL estimate, and the final estimate with the
    * standard small-range LinearCounting correction (raw ≤ 5m/2 and
    * empty registers exist → m·ln(m/V), computed as
    * m·(ln m − detLn(V)) so the DuckDB oracle replays the exact
    * ln circuit — DetMath.scala:16).
    */
  def hllSummary(registers: DataFrame): DataFrame =
    hllSummaryBy(registers)

  /** [[hllSummary]] grouped by `keys` (e.g. a time-window column): one
    * summary row per group — the shape a per-window streaming sketch
    * consumer reads.
    */
  def hllSummaryBy(registers: DataFrame, keys: Column*): DataFrame = {
    val m = HllM
    val agged = registers.groupBy(keys: _*).agg(
      count(lit(1)).as("occupied"),
      sum(expr("shiftleft(1L, cast(53 - r as int))")).as("s_occ"))
    val s = agged
      .select((keys :+ lit(m).as("m") :+ col("occupied") :+
        (col("s_occ") + (lit(m.toLong) - col("occupied")) * lit(1L << 53))
          .as("s_scaled")): _*)
    val raw = floor(lit(HllRawNum) / (lit(HllRawDen) * col("s_scaled").cast("double")))
      .cast("long")
    val empties = (lit(m.toLong) - col("occupied")).cast("double")
    val lc = floor(lit(m.toDouble) * (lit(HllLnM) - DetMath.detLn(empties))).cast("long")
    s.withColumn("est_raw", raw)
      .withColumn("est",
        when(col("est_raw") <= lit((5L * m) / 2) && col("occupied") < lit(m.toLong), lc)
          .otherwise(col("est_raw")))
  }

  /** DuckDB oracle tail for [[hllSummary]] given a CTE `regs(reg, r)`:
    * emits CTEs computing the identical summary row. `finalSelect`
    * receives the summary CTE name and appends its own projection.
    */
  def hllSummaryOracleCtes(regsCte: String, keys: Seq[String] = Nil): String = {
    val m = HllM
    val k = if (keys.isEmpty) "" else keys.mkString("", ", ", ", ")
    val grp = if (keys.isEmpty) "" else keys.mkString(" GROUP BY ", ", ", "")
    s"""hsum AS (SELECT ${k}CAST(count(*) AS BIGINT) AS occupied,
       |  CAST(sum(1::BIGINT << (53 - r)) AS BIGINT) AS s_occ FROM $regsCte$grp),
       |hsc AS (SELECT $k$m AS m, occupied,
       |  s_occ + ($m - occupied) * (1::BIGINT << 53) AS s_scaled FROM hsum),
       |hraw AS (SELECT $k m, occupied, s_scaled,
       |  CAST(floor(${java.lang.Double.toString(HllRawNum)} /
       |       (${java.lang.Double.toString(HllRawDen)} * CAST(s_scaled AS DOUBLE))) AS BIGINT) AS est_raw
       |  FROM hsc),
       |${DetMath.sqlLnCtes("hln", "hraw", s"${k}m, occupied, s_scaled, est_raw",
          s"CAST($m - occupied AS DOUBLE)")},
       |hfin AS (SELECT $k m, occupied, s_scaled, est_raw,
       |  CASE WHEN est_raw <= ${(5L * m) / 2} AND occupied < $m
       |       THEN CAST(floor($m.0 * (${java.lang.Double.toString(HllLnM)} - lnv)) AS BIGINT)
       |       ELSE est_raw END AS est
       |  FROM hln)""".stripMargin
  }
}
