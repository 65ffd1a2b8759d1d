package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd vector kernels for the similarity operators. Each
  * accumulates LEFT-TO-RIGHT — the exact IEEE op sequence of the
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` folds they replace and of
  * the DuckDB oracles' `list_reduce` — so every hash-checked cosine
  * stays bit-identical while moving from the interpreted higher-order
  * evaluator into whole-stage codegen.
  */
object VecMath {
  /** Σ a(i)·b(i) over doubles, left to right. Callers (the Catalyst
    * expressions below) enforce the equal-length contract and yield
    * NULL on ragged inputs — matching the `aggregate(zip_with(…))`
    * spec, which zips to the shorter array and NULLs the fold when the
    * lengths differ, so corrupt embedding arrays surface as nulls
    * instead of plausible-but-wrong cosines. */
  def dotD(a: ArrayData, b: ArrayData): Double = {
    val x = a.toDoubleArray()
    val y = b.toDoubleArray()
    val n = math.min(x.length, y.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x(i) * y(i); i += 1 }
    acc
  }

  /** √Σ x², same fold order as `sqrt(aggregate(transform(a, x*x), …))`. */
  def normL2(a: ArrayData): Double = {
    val x = a.toDoubleArray()
    var acc = 0.0
    var i = 0
    while (i < x.length) { acc += x(i) * x(i); i += 1 }
    math.sqrt(acc)
  }

  /** Integer dot product over int arrays accumulated in long — exact,
    * so int8-ANN candidate sets stay engine-reproducible. */
  def dotLong(a: ArrayData, b: ArrayData): Long = {
    val x = a.toIntArray()
    val y = b.toIntArray()
    val n = math.min(x.length, y.length)
    var acc = 0L
    var i = 0
    while (i < n) { acc += x(i).toLong * y(i); i += 1 }
    acc
  }

  /** |a ∩ b| for two SORTED-distinct long arrays via a merge scan —
    * O(m+n) with zero allocation, replacing `array_intersect`'s
    * per-pair hash set in the dedup verify stage. */
  def sortedIntersectSize(a: ArrayData, b: ArrayData): Int = {
    val x = a.toLongArray()
    val y = b.toLongArray()
    var i = 0
    var j = 0
    var n = 0
    while (i < x.length && j < y.length) {
      if (x(i) == y(j)) { n += 1; i += 1; j += 1 }
      else if (x(i) < y(j)) i += 1
      else j += 1
    }
    n
  }

  // ------------------------------------------------------ Column forms
  def dotD(a: Column, b: Column): Column =
    GraftBridge.column(DotD(GraftBridge.expression(a), GraftBridge.expression(b)))
  def normL2(a: Column): Column =
    GraftBridge.column(NormL2(GraftBridge.expression(a)))
  def dotLong(a: Column, b: Column): Column =
    GraftBridge.column(DotLong(GraftBridge.expression(a), GraftBridge.expression(b)))
  def sortedIntersectSize(a: Column, b: Column): Column =
    GraftBridge.column(SortedIntersectSize(GraftBridge.expression(a),
      GraftBridge.expression(b)))
}

case class DotD(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_d"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null else VecMath.dotD(x, y)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |if ($a.numElements() != $b.numElements()) { ${ev.isNull} = true; }
      |else { ${ev.value} = graft.functions.VecMath.dotD($a, $b); }
    """.stripMargin)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

case class NormL2(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "norm_l2"
  override def nullSafeEval(input: Any): Any =
    VecMath.normL2(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.functions.VecMath.normL2($input);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class DotLong(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_long"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null else VecMath.dotLong(x, y)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |if ($a.numElements() != $b.numElements()) { ${ev.isNull} = true; }
      |else { ${ev.value} = graft.functions.VecMath.dotLong($a, $b); }
    """.stripMargin)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Inputs MUST be sorted-distinct long arrays (the
  * [[TextHash.hashedNgrams]] output contract). */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "sorted_intersect_size"
  override def nullSafeEval(a: Any, b: Any): Any =
    VecMath.sortedIntersectSize(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecMath.sortedIntersectSize($a, $b);")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}
