package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Bloom-filter primitive for pre-shuffle join pruning — the runtime
  * row-level filter a 100 TB shuffle join needs when the dimension
  * side is too big to broadcast as ROWS but its key-set fits as BITS.
  *
  * Two halves, both engine-grade:
  *
  *  - [[Bloom.bloomAgg]]: a mergeable `Aggregator` building the filter
  *    distributively (per-partition bitsets OR-merged — order- and
  *    partitioning-independent by construction, since set-bit union is
  *    commutative/associative/idempotent). One pass over the build
  *    side; the finished sketch is a self-describing byte blob
  *    (header: k; body: the bitset), control-plane sized (2²⁰ bits =
  *    128 KiB holds ~70k keys at ~1% FPR with k=7).
  *  - [[BloomMightContain]]: a native codegen expression probing the
  *    sketch with k double-hashed positions per row — ~k cache probes
  *    inside WholeStageCodegen, applied at the FACT SCAN so the
  *    exchange only carries probable matches. False positives are
  *    removed by the real join that follows; false negatives are
  *    impossible (no-false-negative property is spec-tested), so the
  *    prune never changes results — only shuffle bytes.
  *
  * Hashing is splitmix64 double hashing (h1 + i·h2 over a
  * power-of-two bit space): public-domain finalizer (Steele et al.,
  * "Fast splittable pseudorandom number generators", OOPSLA 2014),
  * identical in the Scala build path and the generated Java probe
  * (both call [[Bloom.mix]] — the object method compiles to a static
  * forwarder the generated code links against).
  */
object Bloom {

  /** splitmix64 finalizer: the 64→64-bit mix used by both build and
    * probe. Called from GENERATED Java — must stay a plain static
    * forwarder (no overloads, no default args).
    */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Set the k probe bits for `key` in `bits` (numBits = bits.length·64,
    * power of two — `1L << pos` relies on Java/Scala long-shift masking
    * to pos & 63).
    */
  private[functions] def setBits(bits: Array[Long], k: Int, key: Long): Unit = {
    val mask = bits.length.toLong * 64L - 1L
    val h1 = mix(key)
    val h2 = mix(h1) | 1L
    var i = 0
    while (i < k) {
      val pos = (h1 + i.toLong * h2) & mask
      bits((pos >>> 6).toInt) |= (1L << pos)
      i += 1
    }
  }

  def mightContain(bits: Array[Long], k: Int, key: Long): Boolean = {
    val mask = bits.length.toLong * 64L - 1L
    val h1 = mix(key)
    val h2 = mix(h1) | 1L
    var i = 0
    while (i < k) {
      val pos = (h1 + i.toLong * h2) & mask
      if ((bits((pos >>> 6).toInt) & (1L << pos)) == 0L) return false
      i += 1
    }
    true
  }

  /** Self-describing blob: 4-byte big-endian k, then the bitset longs
    * big-endian. numBits is implied by the length.
    */
  private[functions] def encode(bits: Array[Long], k: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + bits.length * 8)
    bb.putInt(k)
    bits.foreach(bb.putLong)
    bb.array()
  }

  def decode(blob: Array[Byte]): (Array[Long], Int) = {
    require(blob.length >= 12 && (blob.length - 4) % 8 == 0 &&
      java.lang.Long.bitCount((blob.length - 4L) / 8L) == 1,
      s"bloom blob must be 4 + (power-of-two × 8) bytes, got ${blob.length}")
    val bb = java.nio.ByteBuffer.wrap(blob)
    val k = bb.getInt
    require(k >= 1 && k <= 32, s"bloom k out of range: $k")
    val bits = Array.fill((blob.length - 4) / 8)(bb.getLong)
    (bits, k)
  }

  /** Build a bloom blob from a local key set (manifest/spec path —
    * file-granularity sketches are built per task over one file's
    * keys, so no distributed merge is involved there).
    */
  def buildLocal(keys: IterableOnce[Long], numBits: Int, k: Int): Array[Byte] = {
    require(numBits >= 64 && java.lang.Integer.bitCount(numBits) == 1,
      s"numBits must be a power of two >= 64, got $numBits")
    val bits = new Array[Long](numBits / 64)
    keys.iterator.foreach(setBits(bits, k, _))
    encode(bits, k)
  }

  /** Buffer wrapper (Encoders.product needs a case class). */
  case class BloomBuf(bits: Array[Long])

  private class BloomAggregator(numBits: Int, k: Int)
      extends Aggregator[Long, BloomBuf, Array[Byte]] {
    require(numBits >= 64 && java.lang.Integer.bitCount(numBits) == 1,
      s"numBits must be a power of two >= 64, got $numBits")
    override def zero: BloomBuf = BloomBuf(new Array[Long](numBits / 64))
    override def reduce(b: BloomBuf, key: Long): BloomBuf = {
      setBits(b.bits, k, key); b
    }
    override def merge(a: BloomBuf, b: BloomBuf): BloomBuf = {
      val out = a.bits.clone()
      var i = 0
      while (i < out.length) { out(i) |= b.bits(i); i += 1 }
      BloomBuf(out)
    }
    override def finish(b: BloomBuf): Array[Byte] = encode(b.bits, k)
    override def bufferEncoder: Encoder[BloomBuf] = Encoders.product[BloomBuf]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Distributed bloom build as a 1-row aggregate: map-side partial
    * bitsets, OR-merged — the collected blob is then embedded as a
    * literal on the probe side (control-plane bytes, never row data).
    */
  def bloomAgg(key: Column, numBits: Int = 1 << 20, k: Int = 7): Column =
    udaf(new BloomAggregator(numBits, k), Encoders.scalaLong).apply(key)
}

/** `bloom_might_contain(blob, key)` — native codegen probe. The blob
  * operand must be FOLDABLE (a literal / collected build result): it is
  * decoded ONCE per task into a long[] referenced by the generated
  * code, so the per-row cost is k masked reads. A NULL blob or NULL
  * key yields NULL (filter semantics drop the row, matching the
  * semi-join the prune fronts for).
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) if left.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckFailure(
        "bloom_might_contain expects a FOLDABLE blob (build the filter, " +
          "collect it, pass lit(bytes))")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain expects (binary, bigint), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = BooleanType

  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val decoded: (Array[Long], Int) =
    Bloom.decode(left.eval(null).asInstanceOf[Array[Byte]])

  override def nullSafeEval(blob: Any, key: Any): Any = {
    val (bits, k) = decoded
    Bloom.mightContain(bits, k, key.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (bitsArr, k) = decoded
    val bitsRef = ctx.addReferenceObj("bloomBits", bitsArr, "long[]")
    val mask = bitsArr.length.toLong * 64L - 1L
    nullSafeCodeGen(ctx, ev, (_, key) => {
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val i = ctx.freshName("i")
      val pos = ctx.freshName("pos")
      val ok = ctx.freshName("ok")
      s"""
         |long $h1 = graft.functions.Bloom.mix($key);
         |long $h2 = graft.functions.Bloom.mix($h1) | 1L;
         |boolean $ok = true;
         |for (int $i = 0; $i < $k; $i++) {
         |  long $pos = ($h1 + (long) $i * $h2) & ${mask}L;
         |  if (($bitsRef[(int) ($pos >>> 6)] & (1L << $pos)) == 0L) {
         |    $ok = false; break;
         |  }
         |}
         |${ev.value} = $ok;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

object BloomMightContain {

  private[functions] val info =
    new ExpressionInfo(classOf[BloomMightContain].getName, "bloom_might_contain")

  private[functions] def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"bloom_might_contain expects 2 arguments, got ${exprs.length}")
    BloomMightContain(exprs.head, exprs(1))
  }

  /** Idempotent per-session registration (see QuantizedDot.register). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("bloom_might_contain", builder, "built-in")
}
