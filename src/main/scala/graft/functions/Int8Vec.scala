package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, FloatType, LongType}

/** Int8 vector kernels for the ANN broadcast-regime extension (the
  * r16 verdict's stretch item): pack an `array<float>` embedding into
  * a d-byte BINARY on the s9 symmetric per-vector grid, and take
  * integer dot products directly over the packed bytes.
  *
  * Why per-vector scale needs no bookkeeping here: s9's law is
  * scale = 127/max|x|, qᵢ = floor(xᵢ·scale + 0.5). A COSINE between
  * two packed vectors divides Σqaᵢqbᵢ by √Σqaᵢ²·√Σqbᵢ², and the two
  * per-vector scales cancel EXACTLY — the int8 cosine is simply the
  * cosine of the quantized vectors, no scale column travels with the
  * data. What does change is the grid: scores differ from the
  * ×1000-floor float grid by the quantization error (≤ 0.5/127
  * relative per element), so rankings can shift — the recall cost is
  * measured in SimilaritySpec/BENCHNOTES, and declared queries stay
  * on the float grid (this is a serving-layer compaction, not a new
  * score semantics).
  *
  * Both are real codegen expressions for the same reason qdot is: the
  * pack runs once per corpus row, but the dot runs once per CANDIDATE
  * PAIR — a tight `byte[]` loop inside WholeStageCodegen, no
  * per-element boxing. byte·byte products stay in int (≤ 16384), the
  * accumulator is long (d·16384 overflows nothing real).
  */
case class Int8Pack(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"int8pack expects array<float>, got ${dt.simpleString}")
  }

  override def dataType: DataType = BinaryType

  override def prettyName: String = "int8pack"

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    var mx = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i)) {
        val a = math.abs(x.getFloat(i).toDouble)
        if (a > mx) mx = a
      }
      i += 1
    }
    val scale = 127.0 / math.max(mx, 1e-30)
    val out = new Array[Byte](n)
    i = 0
    while (i < n) {
      val q = if (x.isNullAt(i)) 0L
        else math.floor(x.getFloat(i).toDouble * scale + 0.5).toLong
      out(i) = math.max(-128L, math.min(127L, q)).toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val mx = ctx.freshName("mx")
      val scale = ctx.freshName("scale")
      val q = ctx.freshName("q")
      val out = ctx.freshName("out")
      s"""
         |int $n = $v.numElements();
         |double $mx = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$v.isNullAt($i)) {
         |    double a = java.lang.Math.abs((double) $v.getFloat($i));
         |    if (a > $mx) $mx = a;
         |  }
         |}
         |double $scale = 127.0 / java.lang.Math.max($mx, 1e-30);
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $q = $v.isNullAt($i) ? 0L
         |    : (long) java.lang.Math.floor((double) $v.getFloat($i) * $scale + 0.5);
         |  $out[$i] = (byte) java.lang.Math.max(-128L, java.lang.Math.min(127L, $q));
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Int8Pack =
    copy(child = newChild)
}

/** `qdot8(binary, binary) -> bigint`: Σ aᵢ·bᵢ over SIGNED bytes —
  * the pair-time kernel for int8-packed memberships. Length mismatch
  * truncates to the shorter (same convention as qdot).
  */
case class Qdot8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"qdot8 expects (binary, binary), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "qdot8"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    val n = math.min(x.length, y.length)
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x(i).toLong * y(i).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.length, $b.length);
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (long) $a[$i] * (long) $b[$i];
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Qdot8 =
    copy(left = newLeft, right = newRight)
}

object Int8Vec {

  private def builder1(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, s"int8pack expects 1 argument, got ${exprs.length}")
    Int8Pack(exprs.head)
  }

  private def builder2(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, s"qdot8 expects 2 arguments, got ${exprs.length}")
    Qdot8(exprs.head, exprs(1))
  }

  /** Idempotent per-session registration (see QuantizedDot.register). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("int8pack", builder1, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("qdot8", builder2, "built-in")
  }
}
