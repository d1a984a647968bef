package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst expression: sign-bit LSH bucket of a vector against
  * a hyperplane matrix — bit i of the result is set iff
  * dot(vec, planes[i]) > 0.
  *
  * One codegen'd nested loop replaces `planes` separate
  * `aggregate(zip_with(...))` higher-order folds, which Spark evaluates
  * INTERPRETED with per-element allocations (CodegenFallback) — the
  * same ~10× penalty QuantizedDot avoids on the scoring path, here on
  * the bucketing path (the multi-table variant evaluates 24+ buckets
  * per row, so the fold cost multiplies). The double accumulation runs
  * in ascending index order — the same order as the sequential HOF
  * fold — so bucket assignments are bit-for-bit identical to the HOF
  * formulation.
  *
  * Arguments: (array<float> vector, array<array<double>> planes); the
  * planes argument is a literal in practice (constant-folded once).
  * Null vector elements count as 0; planes must be non-null.
  */
case class SignBits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"signbits expects (array<float>, array<array<double>>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "signbits"

  override def nullSafeEval(v: Any, m: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val planes = m.asInstanceOf[ArrayData]
    var bucket = 0
    var p = 0
    while (p < planes.numElements()) {
      val plane = planes.getArray(p)
      val n = math.min(vec.numElements(), plane.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (!vec.isNullAt(i)) acc += vec.getFloat(i).toDouble * plane.getDouble(i)
        i += 1
      }
      if (acc > 0) bucket |= 1 << p
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, m) => {
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val plane = ctx.freshName("plane")
      val bucket = ctx.freshName("bucket")
      s"""
         |int $bucket = 0;
         |for (int $p = 0; $p < $m.numElements(); $p++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $plane = $m.getArray($p);
         |  int $n = java.lang.Math.min($v.numElements(), $plane.numElements());
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$v.isNullAt($i)) {
         |      $acc += (double) $v.getFloat($i) * $plane.getDouble($i);
         |    }
         |  }
         |  if ($acc > 0) $bucket |= (1 << $p);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SignBits =
    copy(left = newLeft, right = newRight)
}

object SignBits {

  private[functions] val info =
    new ExpressionInfo(classOf[SignBits].getName, "signbits")

  private[functions] def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, s"signbits expects 2 arguments, got ${exprs.length}")
    SignBits(exprs.head, exprs(1))
  }

  /** Idempotent per-session registration (see QuantizedDot.register). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("signbits", builder, "built-in")
}
