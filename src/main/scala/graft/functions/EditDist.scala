package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native thresholded edit distance: BYTE-level Levenshtein with a
  * hard threshold `k`, returning the exact distance when it is ≤ k and
  * -1 otherwise (the builtin 3-arg `levenshtein` contract).
  *
  * Why it exists: the blocked near-dup pass (d13) evaluates the DP for
  * every in-block candidate pair, and Spark's builtin walks both
  * strings codepoint-by-codepoint through UTF8String decoding in the
  * O(len·k) inner loop — measured ~19 s for 394k pairs of 120-char
  * prefixes at sf0.1. r17 replaced it with a banded DP over raw UTF-8
  * bytes (~20 µs/pair); r18 replaces the kernel again with the
  * bit-parallel algorithm of Myers (1999) in the edit-distance
  * formulation of Hyyrö (2002): one column of the DP matrix becomes
  * O(⌈m/64⌉) word operations instead of O(band) cell operations —
  * ~120×91 ≈ 11k cells for d13's 120-char prefixes collapse to ~240
  * word ops. Exactness is unchanged (the bit vectors encode the exact
  * DP deltas; EditDistSpec cross-checks against the reference DP), and
  * the same threshold early-exit applies: the running score D[m][j]
  * can fall by at most 1 per remaining column, so
  * score − (n − j) > k proves the final distance exceeds k.
  *
  * Two further always-valid cuts run first: common prefix/suffix
  * stripping (Levenshtein is invariant under both; near-dup pairs —
  * the rows that matter — share long prefixes, making their DP nearly
  * free) and the |len(a) − len(b)| > k length bound.
  *
  * Byte-level vs codepoint-level: identical for ASCII inputs (the
  * declared corpus); for multi-byte UTF-8 a byte edit can count more
  * than a codepoint edit, so this is a DIFFERENT (documented) metric
  * there — do not substitute it where non-ASCII parity with the
  * builtin matters.
  */
object EditDist {

  /** Thread-local Peq scratch (256 byte values × 2 words): written and
    * re-zeroed per call over only the pattern's distinct bytes, so no
    * per-pair allocation and no cross-call leakage. 512 longs = 4 KB
    * per executor thread.
    */
  private val peqBuf = new ThreadLocal[Array[Long]] {
    override def initialValue(): Array[Long] = new Array[Long](512)
  }

  /** Thresholded byte-level Levenshtein; exact value if ≤ k, else -1. */
  def banded(a: Array[Byte], b: Array[Byte], k: Int): Int = {
    // strip common prefix and suffix — Levenshtein is invariant under
    // both (d(px, py) = d(x, y) = d(xs, ys))
    var lo = 0
    var aHi = a.length
    var bHi = b.length
    while (lo < aHi && lo < bHi && a(lo) == b(lo)) lo += 1
    while (aHi > lo && bHi > lo && a(aHi - 1) == b(bHi - 1)) {
      aHi -= 1; bHi -= 1
    }
    // pattern = shorter remainder
    var x = a; var y = b; var xHi = aHi; var yHi = bHi
    if (aHi - lo > bHi - lo) { x = b; y = a; xHi = bHi; yHi = aHi }
    val m = xHi - lo
    val n = yHi - lo
    if (n - m > k) return -1
    if (m == 0) return if (n <= k) n else -1
    if (m <= 64) myers1(x, lo, m, y, lo, n, k)
    else if (m <= 128) myers2(x, lo, m, y, lo, n, k)
    else bandedDp(x, lo, m, y, lo, n, k)
  }

  /** One-word Myers/Hyyrö bit-parallel Levenshtein (m ≤ 64). Bits of
    * each vector hold the DP column's vertical deltas; only bit m−1 is
    * ever read, and carries/shifts propagate upward only, so the
    * garbage above it is harmless with VP initialized to all-ones.
    */
  private def myers1(x: Array[Byte], xFrom: Int, m: Int,
      y: Array[Byte], yFrom: Int, n: Int, k: Int): Int = {
    val peq = peqBuf.get()
    var i = 0
    while (i < m) { peq(x(xFrom + i) & 0xFF) |= 1L << i; i += 1 }
    var vp = -1L
    var vn = 0L
    var score = m
    val mask = 1L << (m - 1)
    var j = 0
    var res = -2
    while (j < n && res == -2) {
      val eq = peq(y(yFrom + j) & 0xFF)
      val d0 = (((eq & vp) + vp) ^ vp) | eq | vn
      var hp = vn | ~(d0 | vp)
      var hn = d0 & vp
      if ((hp & mask) != 0L) score += 1
      else if ((hn & mask) != 0L) score -= 1
      j += 1
      if (score - (n - j) > k) res = -1
      else {
        hp = (hp << 1) | 1L
        hn = hn << 1
        vp = hn | ~(d0 | hp)
        vn = hp & d0
      }
    }
    i = 0
    while (i < m) { peq(x(xFrom + i) & 0xFF) = 0L; i += 1 }
    if (res == -1) -1 else if (score <= k) score else -1
  }

  /** Two-word blocked Myers (64 < m ≤ 128): identical recurrence with
    * explicit carry propagation word 0 → word 1 for the addition and
    * the two shifts. Covers d13/d25's 120-byte prefixes.
    */
  private def myers2(x: Array[Byte], xFrom: Int, m: Int,
      y: Array[Byte], yFrom: Int, n: Int, k: Int): Int = {
    val peq = peqBuf.get()
    var i = 0
    while (i < m) {
      val c = (x(xFrom + i) & 0xFF) << 1
      if (i < 64) peq(c) |= 1L << i else peq(c + 1) |= 1L << (i - 64)
      i += 1
    }
    var vp0 = -1L; var vp1 = -1L
    var vn0 = 0L; var vn1 = 0L
    var score = m
    val mask = 1L << (m - 65) // test bit lives in word 1 (m > 64)
    var j = 0
    var res = -2
    while (j < n && res == -2) {
      val c = (y(yFrom + j) & 0xFF) << 1
      val eq0 = peq(c)
      val eq1 = peq(c + 1)
      // D0 = (((Eq & VP) + VP) ^ VP) | Eq | VN, addition carrying 0→1
      val t0 = eq0 & vp0
      val s0 = t0 + vp0
      val carry = ((s0 ^ Long.MinValue) < (t0 ^ Long.MinValue))
      val s1 = (eq1 & vp1) + vp1 + (if (carry) 1L else 0L)
      val d00 = (s0 ^ vp0) | eq0 | vn0
      val d01 = (s1 ^ vp1) | eq1 | vn1
      var hp0 = vn0 | ~(d00 | vp0)
      var hp1 = vn1 | ~(d01 | vp1)
      var hn0 = d00 & vp0
      var hn1 = d01 & vp1
      if ((hp1 & mask) != 0L) score += 1
      else if ((hn1 & mask) != 0L) score -= 1
      j += 1
      if (score - (n - j) > k) res = -1
      else {
        val hpTop = hp0 >>> 63
        val hnTop = hn0 >>> 63
        hp1 = (hp1 << 1) | hpTop
        hp0 = (hp0 << 1) | 1L
        hn1 = (hn1 << 1) | hnTop
        hn0 = hn0 << 1
        vp0 = hn0 | ~(d00 | hp0)
        vp1 = hn1 | ~(d01 | hp1)
        vn0 = hp0 & d00
        vn1 = hp1 & d01
      }
    }
    i = 0
    while (i < m) {
      peq((x(xFrom + i) & 0xFF) << 1) = 0L
      peq(((x(xFrom + i) & 0xFF) << 1) + 1) = 0L
      i += 1
    }
    if (res == -1) -1 else if (score <= k) score else -1
  }

  /** Reference banded DP (the r17 kernel), kept as the m > 128
    * fallback and as the spec's cross-check arbiter. Operates on the
    * same stripped ranges as the bit-parallel paths.
    */
  private[functions] def bandedDp(x: Array[Byte], xFrom: Int, m: Int,
      y: Array[Byte], yFrom: Int, n: Int, k: Int): Int = {
    val inf = k + 1
    var prev = new Array[Int](n + 1)
    var cur = new Array[Int](n + 1)
    java.util.Arrays.fill(prev, inf)
    var j = 0
    while (j <= n && j <= k) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= m) {
      java.util.Arrays.fill(cur, inf)
      val lo = if (i - k > 1) i - k else 1
      val hi = if (i + k < n) i + k else n
      var rowMin = inf
      if (i <= k) { cur(0) = i; rowMin = i }
      val xi = x(xFrom + i - 1)
      var jj = lo
      while (jj <= hi) {
        var v = prev(jj - 1) + (if (xi == y(yFrom + jj - 1)) 0 else 1)
        val del = prev(jj) + 1
        if (del < v) v = del
        val ins = cur(jj - 1) + 1
        if (ins < v) v = ins
        if (v > inf) v = inf
        cur(jj) = v
        if (v < rowMin) rowMin = v
        jj += 1
      }
      if (rowMin > k) return -1 // every band cell already exceeds k
      val t = prev; prev = cur; cur = t
      i += 1
    }
    if (prev(n) <= k) prev(n) else -1
  }

  /** Idempotent SQL-surface registration (`bedit(a, b, k)` — the
    * query-side spelling; use via `expr("bedit(pa, pb, 45)")` like the
    * sibling `qdot`). `levenshtein(l, r, 45) >= 0` and
    * `bedit(l, r, 45) >= 0` select identical ASCII rows.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction("bedit",
      exprs => {
        require(exprs.length == 3, s"bedit expects 3 args, got ${exprs.length}")
        val k = exprs(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
          case other => other.eval(null).asInstanceOf[Number].intValue()
        }
        BandedEditDistance(exprs.head, exprs(1), k)
      }, "built-in")
}

case class BandedEditDistance(left: Expression, right: Expression,
    threshold: Int) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType &&
      threshold >= 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bedit expects (string, string) and threshold >= 0, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString}, $threshold)")

  override def dataType: DataType = IntegerType

  override def prettyName: String = "bedit"

  override def nullSafeEval(a: Any, b: Any): Any =
    EditDist.banded(a.asInstanceOf[UTF8String].getBytes,
      b.asInstanceOf[UTF8String].getBytes, threshold)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.EditDist.banded(" +
        s"$a.getBytes(), $b.getBytes(), $threshold);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BandedEditDistance =
    copy(left = newLeft, right = newRight)
}
