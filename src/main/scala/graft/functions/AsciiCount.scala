package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared machinery for single-pass ASCII character-class counters.
  *
  * The text-quality paths (token counting, punctuation ratios) were
  * built on `regexp_extract_all` / `regexp_replace` over an ASCII
  * class — which materializes a token ARRAY just to take its size, or
  * builds a stripped STRING just to take its length. Both are O(n)
  * passes in principle but pay regex-engine stepping plus per-match
  * allocation; at the sf1 decade the punct_bp regexp_replace alone was
  * ~5x the parquet scan it rode on (BENCHNOTES round 12). A
  * character-class count needs none of that: one branch-light pass
  * over the UTF8String bytes with a 128-entry membership table.
  *
  * ASCII-class-on-UTF8 correctness: class members are single-byte
  * ASCII (< 0x80), and UTF-8 guarantees bytes of multi-byte sequences
  * are all >= 0x80, so a byte-level membership scan can neither split
  * nor miscount multi-byte characters — member BYTES are exactly
  * member CHARACTERS, and runs of member bytes are exactly the
  * `[class]+` regex matches. Non-member counts are therefore
  * char-correct too when computed as `length(s) - member_count(s)`
  * (length counts characters).
  */
abstract class AsciiClassCount extends UnaryExpression {

  /** The ASCII class, as an explicit member string (e.g. the 62
    * alphanumerics). Must be < 0x80 per char. */
  def members: String

  protected lazy val memberTable: Array[Boolean] = {
    val t = new Array[Boolean](128)
    members.foreach { c =>
      require(c < 128, s"ASCII class only, got '$c'"); t(c) = true
    }
    t
  }

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects string, got ${t.simpleString}")
    }

  override def dataType: DataType = LongType

  /** `true` counts runs of consecutive members ([class]+ matches),
    * `false` counts member characters. */
  def runs: Boolean

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var count = 0L
    var prev = false
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      val in = b >= 0 && memberTable(b)
      if (in && (!runs || !prev)) count += 1
      prev = in
      i += 1
    }
    count
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val table = ctx.addReferenceObj("memberTable", memberTable, "boolean[]")
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val in = ctx.freshName("in")
      val prev = ctx.freshName("prev")
      val count = ctx.freshName("count")
      val runCond = if (runs) s"$in && !$prev" else in
      s"""
         |byte[] $bytes = $v.getBytes();
         |long $count = 0L;
         |boolean $prev = false;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  byte $b = $bytes[$i];
         |  boolean $in = $b >= 0 && $table[$b];
         |  if ($runCond) $count++;
         |  $prev = $in;
         |}
         |${ev.value} = $count;
       """.stripMargin
    })
}

object AsciiClassCount {
  val Alnum: String =
    ('A' to 'Z').mkString + ('a' to 'z').mkString + ('0' to '9').mkString
}

/** `ascii_token_count(text)`: number of `[A-Za-z0-9]+` runs — the
  * byte-scan equivalent of `size(regexp_extract_all(text,
  * '[A-Za-z0-9]+', 0))` with no array materialization. */
case class AsciiTokenCount(child: Expression) extends AsciiClassCount {
  override def members: String = AsciiClassCount.Alnum
  override def runs: Boolean = true
  override def prettyName: String = "ascii_token_count"
  override protected def withNewChildInternal(newChild: Expression): AsciiTokenCount =
    copy(child = newChild)
}

/** `ascii_clean_count(text)`: number of characters in
  * `[A-Za-z0-9 ]` — so `length(text) - ascii_clean_count(text)` is the
  * punctuation count `length(text) - length(regexp_replace(text,
  * '[^A-Za-z0-9 ]', ''))` without building the stripped string. */
case class AsciiCleanCount(child: Expression) extends AsciiClassCount {
  override def members: String = AsciiClassCount.Alnum + " "
  override def runs: Boolean = false
  override def prettyName: String = "ascii_clean_count"
  override protected def withNewChildInternal(newChild: Expression): AsciiCleanCount =
    copy(child = newChild)
}

object AsciiCount {

  private[functions] val tokenInfo =
    new ExpressionInfo(classOf[AsciiTokenCount].getName, "ascii_token_count")
  private[functions] val cleanInfo =
    new ExpressionInfo(classOf[AsciiCleanCount].getName, "ascii_clean_count")

  /** Idempotent per-session registration (see QuantizedDot.register). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ascii_token_count",
      exprs => { require(exprs.length == 1); AsciiTokenCount(exprs.head) },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ascii_clean_count",
      exprs => { require(exprs.length == 1); AsciiCleanCount(exprs.head) },
      "built-in")
  }
}
