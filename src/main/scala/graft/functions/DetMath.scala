package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Bit-deterministic transcendental kernels, reproducible across engines.
  *
  * `Math.log` is NOT cross-engine-reproducible: HotSpot's `log` intrinsic
  * differs from glibc's on ~0.1% of inputs by 1 ulp (measured: 13/10000 on
  * BM25-shaped idf inputs), and `StrictMath.log` (fdlibm) differs on ~8%.
  * Any query whose oracle hashes a value downstream of `ln` would be flaky.
  *
  * `detLn` instead *defines* the logarithm as a fixed arithmetic circuit
  * built only from IEEE-754 `+ - * /` and comparisons — operations every
  * engine rounds identically — so Spark (JVM doubles) and DuckDB (C++
  * doubles) produce the same 64 bits:
  *
  *   1. exponent split: e = min(floor(log2 x), 40) (0 for x < 2) and
  *      pw = 2^e — both exact; the JVM extracts e from the double's
  *      exponent bits, the SQL replica walks a CASE ladder over exact
  *      power-of-two thresholds; identical results on the full domain;
  *   2. mantissa m = x / pw ∈ [1,2) (division by a power of two is exact);
  *   3. atanh series: t = (m−1)/(m+1) ∈ [0,1/3),
  *      ln m = 2t·(1 + t²/3 + t⁴/5 + … + t^36/37) via Horner;
  *   4. ln x = ln m + e·ln2 with ln2 a shared double literal.
  *
  * The truncation error (t ≤ 1/3 ⇒ tail < 3⁻³⁹) is below 1 ulp of the
  * result, so accuracy vs true ln is ≤ ~1e-15 relative on [1, 2^40] — and,
  * unlike libm, the *same* value everywhere. The `sql*` emitters produce
  * the identical circuit as DuckDB SQL text (constants printed
  * shortest-roundtrip; decimal-literal → nearest-double equals the JVM
  * literal by the roundtrip property).
  *
  * The runtime form is a single codegen'd [[DetLn]] expression node — NOT a
  * `Column` arithmetic tree: reusing `t2`/`m` subtrees in a Column circuit
  * copies the 40-branch CASE ~70×, a ~20k-node plan that serializes to a
  * 10 MiB task binary and stalls Janino (measured 15 s → 1 s on BM25).
  *
  * Domain: [1, 2^40]. Below 1 both forms pin e=0 and the series still
  * converges (|t| < 1/2 for m > 1/3) but only to ~1e-12 — callers wanting
  * (0,1) should use -detLn(1/x).
  */
object DetMath {
  /** Nearest double to ln 2 — the literal both engines share. */
  val Ln2: Double = 0.6931471805599453
  val Ln2Sql: String = "0.6931471805599453"

  private val MaxExp = 40
  private val Terms = 18
  private val coeffs: Array[Double] = (0 to Terms).map(k => 1.0 / (2 * k + 1)).toArray
  private val pow2: Array[Double] = (0 to MaxExp).map(k => java.lang.Math.scalb(1.0, k)).toArray
  private def ladder: Seq[(Int, Double)] = (MaxExp to 1 by -1).map(k => (k, pow2(k)))

  /** The circuit, replayed imperatively — bit-identical to the SQL ladder:
    * same e/pw on [1, 2^41) (exponent bits ≡ the CASE thresholds), same
    * exact m, same Horner fold, same final fma-free combination.
    */
  def computeLn(x: Double): Double = {
    val e = if (x < 2.0) 0 else math.min(java.lang.Math.getExponent(x), MaxExp)
    val m = x / pow2(e)
    val t = (m - 1.0) / (m + 1.0)
    val t2 = t * t
    var p = coeffs(Terms)
    var k = Terms - 1
    while (k >= 0) { p = coeffs(k) + (t2 * p); k -= 1 }
    ((t * p) * 2.0) + (e * Ln2)
  }

  /** Deterministic natural log of `x` (domain [1, 2^40]); see object doc. */
  def detLn(x: Column): Column = Bridge.column(DetLn(Bridge.expression(x)))

  // ---- DuckDB replicas: the same circuit as SQL text ----------------------

  /** CASE ladder for e = min(floor(log2 x), 40), matching [[computeLn]]. */
  def sqlE(x: String): String =
    ladder.map { case (k, _) =>
      s"WHEN $x >= CAST(${1L << k} AS DOUBLE) THEN CAST($k AS DOUBLE)"
    }.mkString("CASE ", " ", " ELSE CAST(0 AS DOUBLE) END")

  /** CASE ladder for pw = 2^e, matching [[computeLn]]. */
  def sqlPw(x: String): String =
    ladder.map { case (k, _) =>
      s"WHEN $x >= CAST(${1L << k} AS DOUBLE) THEN CAST(${1L << k} AS DOUBLE)"
    }.mkString("CASE ", " ", " ELSE CAST(1 AS DOUBLE) END")

  /** Horner polynomial in `t2`, matching the loop in [[computeLn]]. */
  def sqlHorner(t2: String): String =
    coeffs.init.reverse.foldLeft(s"CAST(${coeffs.last} AS DOUBLE)") {
      case (acc, c) => s"(CAST($c AS DOUBLE) + ($t2 * $acc))"
    }

  /** Full ln given precomputed t, t2, e columns: ((t·poly)·2) + e·ln2. */
  def sqlLn(t: String, t2: String, e: String): String =
    s"((($t * ${sqlHorner(t2)}) * 2.0) + ($e * $Ln2Sql))"

  // ---- deterministic exp: the inverse circuit --------------------------

  private val ExpTerms = 14
  private val expCoeffs: Array[Double] = {
    val c = new Array[Double](ExpTerms + 1)
    var f = 1.0
    for (n <- 0 to ExpTerms) { if (n > 0) f *= n; c(n) = 1.0 / f }
    c
  }
  private val ExpMaxK = 60
  private def expPow2(k: Int): Double = java.lang.Math.scalb(1.0, k)

  /** The exp circuit, same philosophy as [[computeLn]]: range-reduce with
    * k = floor(x/ln2 + 0.5) (floor of identical doubles is identical),
    * r = x − k·ln2 ∈ [−0.347, 0.347], Taylor–Horner to r^14 (tail < 1e-18),
    * then one exact multiply by 2^k. Domain |x| ≤ 41 (k clamped to ±60);
    * accuracy ≤ ~1e-15 relative, and the SAME bits in every engine.
    */
  def computeExp(x: Double): Double = {
    val kd = math.floor((x / Ln2) + 0.5)
    val k = math.max(-ExpMaxK, math.min(ExpMaxK, kd.toInt))
    val r = x - (k.toDouble * Ln2)
    var p = expCoeffs(ExpTerms)
    var n = ExpTerms - 1
    while (n >= 0) { p = expCoeffs(n) + (r * p); n -= 1 }
    p * expPow2(k)
  }

  /** Deterministic natural exp of `x` (domain |x| ≤ 41); see [[computeExp]]. */
  def detExp(x: Column): Column = Bridge.column(DetExp(Bridge.expression(x)))

  /** A ready-made CTE chain computing lnv = detLn(x) over `src`:
    * emits CTEs `<p>0..<p>4` and a final CTE named `<p>` with columns
    * (`keys`, lnv). Splitting into chained CTEs keeps each SQL expression
    * referencing the previous column once — no textual tree blowup.
    */
  def sqlLnCtes(p: String, src: String, keys: String, x: String): String =
    s"""${p}0 AS (SELECT $keys, $x AS _lnx FROM $src),
       |${p}1 AS (SELECT $keys, _lnx, ${sqlE("_lnx")} AS _lne,
       |          ${sqlPw("_lnx")} AS _lnpw FROM ${p}0),
       |${p}2 AS (SELECT $keys, _lne, (_lnx / _lnpw) AS _lnm FROM ${p}1),
       |${p}3 AS (SELECT $keys, _lne, ((_lnm - 1.0) / (_lnm + 1.0)) AS _lnt FROM ${p}2),
       |${p}4 AS (SELECT $keys, _lne, _lnt, (_lnt * _lnt) AS _lnt2 FROM ${p}3),
       |$p AS (SELECT $keys, ${sqlLn("_lnt", "_lnt2", "_lne")} AS lnv FROM ${p}4)""".stripMargin

  /** Horner polynomial for exp in `r`, matching [[computeExp]]'s loop. */
  def sqlExpHorner(r: String): String =
    expCoeffs.init.reverse.foldLeft(s"CAST(${expCoeffs.last} AS DOUBLE)") {
      case (acc, c) => s"(CAST($c AS DOUBLE) + ($r * $acc))"
    }

  /** 2^k lookup CASE over integer-valued double `k` ∈ [−60, 60], constants
    * printed shortest-roundtrip (scientific notation parses as DOUBLE).
    */
  def sqlExpPw(k: String): String =
    (-ExpMaxK to ExpMaxK).map { i =>
      s"WHEN $k = CAST($i AS DOUBLE) THEN CAST(${expPow2(i)} AS DOUBLE)"
    }.mkString("CASE ", " ", " ELSE CAST(1 AS DOUBLE) END")

  /** CTE chain computing expv = detExp(x) over `src` (clamp as in
    * [[computeExp]]: k bounded to ±60 via least/greatest — exact).
    */
  def sqlExpCtes(p: String, src: String, keys: String, x: String): String =
    s"""${p}0 AS (SELECT $keys, $x AS _exx FROM $src),
       |${p}1 AS (SELECT $keys, _exx,
       |          least(greatest(floor((_exx / $Ln2Sql) + 0.5),
       |            CAST(-$ExpMaxK AS DOUBLE)), CAST($ExpMaxK AS DOUBLE)) AS _exk
       |          FROM ${p}0),
       |${p}2 AS (SELECT $keys, _exk, (_exx - (_exk * $Ln2Sql)) AS _exr FROM ${p}1),
       |$p AS (SELECT $keys,
       |         (${sqlExpHorner("_exr")} * ${sqlExpPw("_exk")}) AS expv
       |       FROM ${p}2)""".stripMargin
}

/** Deterministic ln as one whole-stage-codegen node (see [[DetMath]]).
  * Child must be DoubleType — the `graft_det_ln` SQL builder casts.
  */
case class DetLn(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "det_ln"

  override def nullSafeEval(x: Any): Any =
    DetMath.computeLn(x.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.DetMath.computeLn($x)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Deterministic exp as one whole-stage-codegen node (see [[DetMath]]).
  * Child must be DoubleType — the `graft_det_exp` SQL builder casts.
  */
case class DetExp(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "det_exp"

  override def nullSafeEval(x: Any): Any =
    DetMath.computeExp(x.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.DetMath.computeExp($x)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
