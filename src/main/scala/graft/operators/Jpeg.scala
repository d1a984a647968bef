package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational JPEG header triage — the third container family of the
  * triage matrix (PNG m10: fixed offsets; ISO-BMFF m11: length-prefixed
  * box walk; JPEG m12: MARKER walk). JPEG dimensions live in the SOFn
  * segment, reachable only by walking variable-length segments from
  * SOI: each segment is FF <marker> <u16 len includes itself>, and the
  * APP0/DQT/COM segments before SOF vary by encoder — fixed offsets
  * are wrong for any encoder but the one you tested. Same engineering
  * as Bmff: each walk step is a NAMED projection column (by-attribute
  * references keep the plan linear in walk depth), all substr/hex/conv
  * codegen'd scan-stage math, zero shuffles, zero codec CPU.
  *
  * The walk stops advancing at SOF (the answer), SOS (entropy-coded
  * data follows — dimensions behind it mean a malformed file), or any
  * non-FF byte / short length (corrupt), and `MaxSegments` bounds the
  * unroll: headers deeper than ~10 segments surface as NULL columns
  * with `is_jpeg` still true — routed, never crashed on (the m10/m11
  * loud-failure contract).
  */
object Jpeg {

  /** walk steps before SOF must appear; JFIF writers emit APP0 +
    * 1-2 DQT (+ optional COM/APPn) before SOFn, and each T.81 fill
    * byte consumes one step too — 16 covers several pads per boundary
    * while the named-column unroll keeps the plan linear in the bound
    */
  val MaxSegments = 16

  private def u8(p: Column, off: Column): Column =
    conv(hex(p.substr(off.cast("int"), lit(1))), 16, 10).cast("long")

  private def u16(p: Column, off: Column): Column =
    conv(hex(p.substr(off.cast("int"), lit(2))), 16, 10).cast("long")

  /** SOFn marker second bytes: C0-CF minus C4 (DHT), C8 (JPG ext),
    * CC (DAC) — the frame-header set across baseline/progressive/
    * lossless/arithmetic variants.
    */
  private val SofMarkers: Seq[Long] =
    Seq(0xC0L, 0xC1L, 0xC2L, 0xC3L, 0xC5L, 0xC6L, 0xC7L,
      0xC9L, 0xCAL, 0xCBL, 0xCDL, 0xCEL, 0xCFL)

  /** Header triage over a (id, payload: binary) frame: `is_jpeg`
    * (SOI signature FFD8), then from the SOFn segment — precision
    * (bits/sample), height, width, components. Non-JPEG rows keep
    * their id with is_jpeg=false and NULL facts.
    */
  def triage(df: DataFrame, idCol: String = "doc_id",
      payloadCol: String = "payload"): DataFrame = {
    val p = col(payloadCol)
    val isJpeg = length(p) >= 4 && hex(p.substr(1, 2)) === "FFD8"
    val o = (i: Int) => s"__jpg_o$i"
    // segment walk: o(1) = first segment after SOI (1-based byte 3)
    var out = df.withColumn(o(1), when(isJpeg, lit(3L)))
    for (i <- 1 until MaxSegments) {
      val prev = col(o(i))
      val mk = u8(p, prev + 1L)
      val len = u16(p, prev + 2L)
      // ITU T.81 §B.1.1.2: any number of 0xFF fill bytes may pad the
      // gap before a marker. mk == 0xFF means `prev` sits on a pad
      // byte, not a segment — step forward ONE byte (consuming one
      // pad per unroll step) instead of misreading the marker byte
      // as half of a length and derailing the walk.
      out = out.withColumn(o(i + 1),
        when(prev.isNotNull && u8(p, prev) === 0xFFL && mk === 0xFFL,
          prev + 1L)
        .when(prev.isNotNull && u8(p, prev) === 0xFFL &&
          !mk.isin(SofMarkers: _*) && mk =!= 0xDAL && len >= 2L,
          prev + 2L + len))
    }
    val sofHits = (1 to MaxSegments).map { i =>
      val oi = col(o(i))
      when(oi.isNotNull && u8(p, oi) === 0xFFL &&
        u8(p, oi + 1L).isin(SofMarkers: _*), oi)
    }
    out = out.withColumn("__sof",
      coalesce(sofHits :+ lit(null).cast("long"): _*))
    val sof = col("__sof")
    out.select(
      col(idCol),
      isJpeg.as("is_jpeg"),
      when(isJpeg, u8(p, sof + 4L)).as("precision"),
      when(isJpeg, u16(p, sof + 5L)).as("height"),
      when(isJpeg, u16(p, sof + 7L)).as("width"),
      when(isJpeg, u8(p, sof + 9L)).as("components"))
  }
}
