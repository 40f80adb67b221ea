package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native vector kernels over `array<double>` embedding columns.
  *
  * These replace chains of 64+ `element_at` expression nodes (one per
  * dimension) with a single codegen'd loop — same arithmetic, same
  * result bits: the loop accumulates strictly left-to-right, exactly the
  * left-associated explicit sum the DuckDB oracles replay (Ann.scala's
  * determinism contract). Array elements are assumed non-null (embedding
  * contract; a null ARRAY still null-propagates via BinaryExpression).
  */
object VecKernels {
  /** Σ a(i)·b(i), left-associated; iterates over `a`'s length. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    var acc = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  /** Σ (a(i)−b(i))², left-associated (sqrt applied by the caller). */
  def l2sq(a: ArrayData, b: ArrayData): Double = {
    var acc = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) { val d = a.getDouble(i) - b.getDouble(i); acc += d * d; i += 1 }
    acc
  }

  /** Σ |a(i)−b(i)|, left-associated. */
  def l1(a: ArrayData, b: ArrayData): Double = {
    var acc = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) { acc += math.abs(a.getDouble(i) - b.getDouble(i)); i += 1 }
    acc
  }

  def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Hyperplane sign for (plane j, 1-based dim d): +1 iff the first md5
    * hex digit of "j-d" is ≥ '8' — reproducible in any engine, no RNG.
    */
  def planeSign(j: Int, d: Int): Double =
    if (md5hex(s"$j-$d").charAt(0) >= '8') 1.0 else -1.0

  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Double]]]()

  /** planes × dim sign matrix for plane indices [off, off+planes),
    * memoized per executor. `off` selects an independent plane family —
    * multi-table LSH table t uses off = t·planes.
    */
  def signs(planes: Int, dim: Int, off: Int = 0): Array[Array[Double]] =
    signCache.computeIfAbsent((planes, dim, off), { case (p, n, o) =>
      Array.tabulate(p, n)((j, d0) => planeSign(o + j, d0 + 1))
    })

  /** '0'/'1' bucket signature: bit j = (Σ v(d)·sign(off+j,d) > 0). */
  def bucket(v: ArrayData, planes: Int, dim: Int, off: Int = 0): UTF8String = {
    val sg = signs(planes, dim, off)
    val out = new Array[Char](planes)
    var j = 0
    while (j < planes) {
      val row = sg(j)
      var acc = 0.0
      var d = 0
      while (d < dim) { acc += v.getDouble(d) * row(d); d += 1 }
      out(j) = if (acc > 0) '1' else '0'
      j += 1
    }
    UTF8String.fromString(new String(out))
  }
}

/** Binary vector op (`dot` | `l2sq` | `l1`) as one whole-stage-codegen
  * loop via a static kernel call.
  */
case class VecBinary(left: Expression, right: Expression, op: String)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = s"vec_$op"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    op match {
      case "dot"  => VecKernels.dot(x, y)
      case "l2sq" => VecKernels.l2sq(x, y)
      case "l1"   => VecKernels.l1(x, y)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecKernels.$op($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Hyperplane LSH bucket signature of an `array<double>` vector;
  * `off` picks the plane family (multi-table LSH: table t → off = t·planes).
  */
case class HyperplaneBits(child: Expression, planes: Int, dim: Int,
    off: Int = 0) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "hyperplane_bits"

  override def nullSafeEval(v: Any): Any =
    VecKernels.bucket(v.asInstanceOf[ArrayData], planes, dim, off)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.VecKernels.bucket($v, $planes, $dim, $off)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Column API for the vector kernels. */
object vecs {
  def dot(a: Column, b: Column): Column =
    Bridge.column(VecBinary(Bridge.expression(a), Bridge.expression(b), "dot"))
  def l2sq(a: Column, b: Column): Column =
    Bridge.column(VecBinary(Bridge.expression(a), Bridge.expression(b), "l2sq"))
  def l1(a: Column, b: Column): Column =
    Bridge.column(VecBinary(Bridge.expression(a), Bridge.expression(b), "l1"))
  def hyperplaneBits(v: Column, planes: Int, dim: Int, off: Int = 0): Column =
    Bridge.column(HyperplaneBits(Bridge.expression(v), planes, dim, off))
}
