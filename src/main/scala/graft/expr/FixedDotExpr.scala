package graft.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the fixed-point embedding dot
  * product ([[graft.ext.VectorSearch.fixedDot]]'s hot loop).
  *
  * The composed form is `aggregate(zip_with(a, b, …))` — higher-order
  * functions whose lambdas are interpreted per element, outside
  * whole-stage codegen, and `zip_with` materializes the intermediate
  * product array. This expression computes the identical LONG sum in
  * one fused loop via a single static call from generated code — no
  * allocation, stays inside the codegen stage.
  *
  * Bit-compatibility contract: per element, `floor(x·y·1e12 + 0.5)`
  * accumulated as LONG — exactly the Column formula and the DuckDB
  * oracle's unnest-sum twin (fold-order-free by integer addition).
  * ExprSpec asserts equality against the composed form. Callers divide
  * by the 1e12 scale to recover the double dot product.
  *
  * Contract: both inputs are non-null float/double arrays of equal
  * length (embedding tables guarantee this); mismatched lengths raise.
  */
case class FixedDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fixed_dot"

  private def floatElems(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs two float/double arrays, got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    FixedDotImpl.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      floatElems(left), floatElems(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expr.FixedDotImpl.compute($a, $b, ${floatElems(left)}, ${floatElems(right)})")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object FixedDotImpl {
  /** 1e12 fixed-point units — keep in sync with VectorSearch.DotScale
    * (ExprSpec pins the equality). */
  val Scale = 1e12

  def compute(a: ArrayData, b: ArrayData,
              aFloat: Boolean, bFloat: Boolean): Long = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"graft_fixed_dot: array length mismatch ($n vs ${b.numElements()})")
    var acc = 0L
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += math.floor(x * y * Scale + 0.5).toLong
      i += 1
    }
    acc
  }
}
