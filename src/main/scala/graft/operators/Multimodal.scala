package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media (image/audio/video) handled as
  * opaque `binary` payloads with typed metadata, decoded/featurized
  * per-partition.
  *
  * The decode step is behind the typed [[Decoder]] interface — a
  * compile-checked swap point instead of a comment. The only decoder
  * that can exist in this environment is a clearly-marked STUB (no
  * media codecs in the sandbox) producing deterministic fake features
  * (byte-histogram moments). Everything around it is the real
  * distributed shape: binary column + schema, `mapPartitions` batch
  * processing (the Scala analogue of `mapInPandas` batches: amortizes
  * per-partition setup such as codec/model initialization via
  * [[Decoder.open]]), explicit output schema, and no driver-side
  * collection. A production build registers a real codec under a name
  * and selects it with `spark.graft.multimodal.decoder`.
  */
object Multimodal {

  /** Typed decode interface: one payload in, fixed feature contract
    * out. Implementations must be Serializable (shipped to executors);
    * [[open]] runs once per partition before any [[decode]] call — the
    * place to initialize a codec/model and amortize it over the batch.
    */
  trait Decoder extends Serializable {
    def open(): Unit = ()
    def decode(payload: Array[Byte]): Decoded
  }

  /** Decoder output contract (frame count, mean byte, feature vector);
    * `n_bytes` is added by the plumbing, not the decoder.
    */
  case class Decoded(frameCount: Long, meanByte: Double,
      features: Array[Double])

  /** STUB decoder: deterministic fake "decode" of a binary payload —
    * 16-bin byte histogram (normalized) standing in for real image/
    * audio features. The m1-m3 oracles replay exactly this arithmetic.
    */
  object ByteHistogramDecoder extends Decoder {
    override def decode(payload: Array[Byte]): Decoded = {
      val hist = new Array[Double](16)
      var sum = 0L
      var i = 0
      while (i < payload.length) {
        val b = payload(i) & 0xff
        hist(b >> 4) += 1.0
        sum += b
        i += 1
      }
      val n = math.max(payload.length, 1)
      val mean = sum.toDouble / n
      val frames = payload.length / 256L + 1L // fake frame sampling
      Decoded(frames, mean, hist.map(_ / n))
    }
  }

  /** REAL image decoder: `javax.imageio` (JDK-stdlib PNG/JPEG/BMP/GIF
    * codecs — pure JVM, no native deps, present in any sandbox). The
    * feature contract packs exact image facts into [[Decoded]]:
    * features = [width, height, pixel-sum of channel 0], meanByte =
    * pixel-sum / pixel-count, frameCount = 1 (stills). Integer-exact
    * for images below 2^53 total luminance — the m4 oracle recomputes
    * the same sums analytically from the generation parameters, so
    * this decode of genuine binary media is hash-checked end to end.
    *
    * `ImageIO.read` allocates per call; a per-partition reader
    * instance would go in [[open]] — kept allocation-per-decode here
    * because ImageReader instances are not thread-safe and Spark may
    * run multiple partitions per executor JVM.
    */
  object ImageIoDecoder extends Decoder {
    override def decode(payload: Array[Byte]): Decoded = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      require(img != null,
        "ImageIoDecoder: payload is not a decodable image")
      val w = img.getWidth
      val h = img.getHeight
      val raster = img.getRaster
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          sum += raster.getSample(x, y, 0)
          x += 1
        }
        y += 1
      }
      Decoded(1L, sum.toDouble / (w.toLong * h),
        Array(w.toDouble, h.toDouble, sum.toDouble))
    }
  }

  /** REAL perceptual-hash decoder: decodes the image (javax.imageio)
    * and computes the 8×8 average-hash — cell (ci, cj) =
    * ((x·8)//w, (y·8)//h), bit k = ci·8+cj set iff the cell's mean
    * exceeds the image mean, compared by exact cross-multiplication
    * (`cell_sum · n_pixels > total_sum · cell_count` — no float in
    * the threshold). Requires dims ≥ 8 so every cell is non-empty.
    * The 64-bit hash is packed as two 32-bit halves in the double-
    * typed feature contract (each < 2^32, lossless): features =
    * [width, height, hash_hi, hash_lo]. m9 reassembles the long and
    * runs the same 16-bit-band pigeonhole pair join SimHash uses.
    */
  object AHashDecoder extends Decoder {
    override def decode(payload: Array[Byte]): Decoded = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      require(img != null, "AHashDecoder: payload is not a decodable image")
      val w = img.getWidth
      val h = img.getHeight
      require(w >= 8 && h >= 8,
        s"AHashDecoder needs dims >= 8, got ${w}x$h")
      val raster = img.getRaster
      val cellSum = new Array[Long](64)
      val cellCnt = new Array[Long](64)
      var tot = 0L
      var y = 0
      while (y < h) {
        val cj = y * 8 / h
        var x = 0
        while (x < w) {
          val ci = x * 8 / w
          val v = raster.getSample(x, y, 0).toLong
          cellSum(ci * 8 + cj) += v
          cellCnt(ci * 8 + cj) += 1L
          tot += v
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      var hash = 0L
      var k = 0
      while (k < 64) {
        if (cellSum(k) * n > tot * cellCnt(k)) hash |= 1L << k
        k += 1
      }
      Decoded(1L, tot.toDouble / n,
        Array(w.toDouble, h.toDouble,
          ((hash >>> 32) & 0xffffffffL).toDouble, (hash & 0xffffffffL).toDouble))
    }
  }

  /** REAL audio decoder: `javax.sound.sampled` (the JDK-stdlib
    * RIFF/WAVE codec — pure JVM, no native deps). Parses the container
    * header for the sample rate, streams the PCM frames, and packs
    * exact audio facts into [[Decoded]]: features = [sample_rate,
    * n_samples, sum_sq, zero_crossings, peak_abs] — all integers (the
    * fixture's 16-bit samples keep sum_sq far below 2^53, so the
    * double-typed feature array is lossless). frameCount = n_samples,
    * meanByte = sum_sq / n (mean energy). The m6 oracle recomputes the
    * same integers analytically from the generation parameters, so
    * this decode of genuine WAV binaries is hash-checked end to end.
    *
    * Only 16-bit signed LE mono PCM is accepted — the decoder
    * validates the container's declared format rather than silently
    * misreading the frame bytes of an unexpected layout.
    */
  object WavPcmDecoder extends Decoder {
    override def decode(payload: Array[Byte]): Decoded = {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
          !fmt.isBigEndian && fmt.getEncoding ==
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          s"WavPcmDecoder: expected 16-bit signed LE mono PCM, got $fmt")
        val raw = ais.readAllBytes()
        val n = raw.length / 2
        var sumSq = 0L
        var zc = 0L
        var peak = 0L
        var prev = 0
        var i = 0
        while (i < n) {
          val s = ((raw(2 * i + 1) << 8) | (raw(2 * i) & 0xff)).toShort.toInt
          sumSq += s.toLong * s
          if (math.abs(s) > peak) peak = math.abs(s).toLong
          if (i > 0 && prev.toLong * s < 0) zc += 1
          prev = s
          i += 1
        }
        Decoded(n.toLong, if (n == 0) 0.0 else sumSq.toDouble / n,
          Array(fmt.getSampleRate.toDouble, n.toDouble, sumSq.toDouble,
            zc.toDouble, peak.toDouble))
      } finally ais.close()
    }
  }

  /** Name → decoder selection. `byte-histogram` is the sandbox stub,
    * `imageio` the real JDK image codec, `wav-pcm` the real JDK audio
    * codec; ANY other name is treated as
    * a fully-qualified [[Decoder]] class (or Scala object) and loaded
    * reflectively — the real swap point: a production build sets
    * `spark.graft.multimodal.decoder=com.example.JpegDecoder` with its
    * codec on the executor classpath, and no graft code changes.
    */
  def decoderForName(name: String): Decoder = name match {
    case "byte-histogram" => ByteHistogramDecoder
    case "imageio" => ImageIoDecoder
    case "wav-pcm" => WavPcmDecoder
    case className =>
      val inst =
        try {
          // a Scala `object Foo` compiles to class Foo$ with MODULE$
          try Class.forName(className + "$").getField("MODULE$").get(null)
          catch { case _: ReflectiveOperationException =>
            Class.forName(className).getDeclaredConstructor().newInstance()
          }
        } catch { case e: ReflectiveOperationException =>
          throw new IllegalArgumentException(
            s"unknown multimodal decoder '$className' — not 'byte-histogram' " +
              "and not a loadable Decoder class/object on the classpath", e)
        }
      inst match {
        case d: Decoder => d
        case other => throw new IllegalArgumentException(
          s"'$className' is ${other.getClass.getName}, not a graft Decoder")
      }
  }

  // Non-nullable primitives: the typed encoder derives this from the
  // case class (primitives can't be null — tighter than the old
  // RDD-path schema, which had to declare everything nullable).
  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("frame_count", LongType, nullable = false),
    StructField("mean_byte", DoubleType, nullable = false),
    StructField("features", ArrayType(DoubleType, containsNull = false))))

  /** Attach a binary payload column (here: utf-8 bytes of the text —
    * the testdata has no real media; the *plumbing* is what's real).
    */
  def withPayload(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("payload", col(textCol).cast("binary"))

  case class PayloadIn(doc_id: Long, payload: Array[Byte])
  case class FeatureOut(doc_id: Long, n_bytes: Long, frame_count: Long,
      mean_byte: Double, features: Array[Double])

  /** Per-partition batch decode: binary payloads → typed features, as
    * a TYPED Dataset.mapPartitions (encoder-backed — stays on the
    * Tungsten serialization path rather than dropping to the RDD API
    * with driver-supplied Row schemas). `decoder.open()` runs once per
    * partition before the batch — where a real decoder hoists
    * codec/model init, the same shape `mapInPandas` gives Python. Zero
    * shuffle; partition sizing inherited from the source (at 100 TB:
    * bound via spark.sql.files.maxPartitionBytes so payload batches
    * fit in executor memory).
    *
    * The decoder defaults to the session config
    * `spark.graft.multimodal.decoder` (default: the sandbox stub);
    * pass one explicitly to bypass the registry.
    */
  def decodeFeatures(docsWithPayload: DataFrame,
      idCol: String = "doc_id", decoder: Decoder = null): DataFrame = {
    val spark = docsWithPayload.sparkSession
    val dec = Option(decoder).getOrElse(decoderForName(
      spark.conf.get("spark.graft.multimodal.decoder", "byte-histogram")))
    import spark.implicits._
    docsWithPayload
      .select(col(idCol).cast("long").as("doc_id"), col("payload"))
      .as[PayloadIn]
      .mapPartitions { batch =>
        dec.open() // once per partition: codec/model init amortization
        batch.map { p =>
          val d = dec.decode(p.payload)
          FeatureOut(p.doc_id, p.payload.length.toLong, d.frameCount,
            d.meanByte, d.features)
        }
      }
      .toDF()
  }

  /** 1:N decode seam — one payload, MANY typed rows: the frame/window
    * extraction shape every speech/video featurization pipeline has
    * (decode once, emit a row per analysis window). Distinct from
    * [[Decoder]] (1:1 summary features) and from m3's manifest
    * sampling (row-local arithmetic on synthetic frames): here the
    * expansion happens INSIDE the decoder against real decoded media.
    */
  trait WindowDecoder extends Serializable {
    def open(): Unit = ()
    def decodeWindows(docId: Long, payload: Array[Byte]): Iterator[AudioWindow]
  }

  /** Window row contract: exact integers only (sample counts, integer
    * energy, peak) — hash-comparable across engines with no float in
    * sight.
    */
  case class AudioWindow(doc_id: Long, window_idx: Long, w_samples: Long,
      w_sum_sq: Long, w_peak_abs: Long)

  /** REAL windowed audio features: decode the WAV container once
    * (javax.sound.sampled), then slice the PCM stream into fixed
    * `win`-sample analysis windows (the tail partial window is kept —
    * dropping it silently loses up to win−1 samples of audio). Per
    * window: sample count, sum-of-squares energy, peak amplitude.
    */
  class WavWindowDecoder(win: Int) extends WindowDecoder {
    require(win > 0, s"window size must be positive, got $win")
    override def decodeWindows(docId: Long,
        payload: Array[Byte]): Iterator[AudioWindow] = {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
          !fmt.isBigEndian && fmt.getEncoding ==
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          s"WavWindowDecoder: expected 16-bit signed LE mono PCM, got $fmt")
        val raw = ais.readAllBytes()
        val n = raw.length / 2
        val out = Vector.newBuilder[AudioWindow]
        var w = 0
        while (w * win < n) {
          val end = math.min((w + 1) * win, n)
          var sumSq = 0L
          var peak = 0L
          var i = w * win
          while (i < end) {
            val s = ((raw(2 * i + 1) << 8) | (raw(2 * i) & 0xff)).toShort.toInt
            sumSq += s.toLong * s
            if (math.abs(s) > peak) peak = math.abs(s).toLong
            i += 1
          }
          out += AudioWindow(docId, w.toLong, (end - w * win).toLong,
            sumSq, peak)
          w += 1
        }
        out.result().iterator
      } finally ais.close()
    }
  }

  /** Per-partition batch 1:N decode: binary payloads → window rows via
    * a typed flatMap (encoder-backed, Tungsten path). Zero shuffle —
    * at 100 TB window expansion must be a flatMap inside the scan
    * stage, never an exchange; output partitioning is inherited, and
    * per-payload decode state never leaves the executor.
    */
  def decodeAudioWindows(docsWithPayload: DataFrame,
      decoder: WindowDecoder,
      idCol: String = "doc_id"): DataFrame = {
    val spark = docsWithPayload.sparkSession
    import spark.implicits._
    docsWithPayload
      .select(col(idCol).cast("long").as("doc_id"), col("payload"))
      .as[PayloadIn]
      .mapPartitions { batch =>
        decoder.open()
        batch.flatMap(p => decoder.decodeWindows(p.doc_id, p.payload))
      }
      .toDF()
  }

  /** VIDEO frame-decode seam — the m3 stub made real: one multi-frame
    * container payload in, one typed row PER FRAME out. Same 1:N
    * batch discipline as [[WindowDecoder]] (typed flatMap inside the
    * scan stage, zero shuffles, payloads never on the driver); the
    * implementation below uses the one multi-frame container the JDK
    * stdlib can actually step frame-by-frame (GIF via javax.imageio).
    * A production build swaps in a real video codec behind this same
    * trait — the trait, not a comment, is the swap point.
    */
  trait FrameDecoder extends Serializable {
    def open(): Unit = ()
    def decodeFrames(docId: Long, payload: Array[Byte]): Iterator[VideoFrame]
  }

  /** Frame row contract: exact integers only (dims, gray pixel sum) —
    * hash-comparable across engines with no float in sight.
    */
  case class VideoFrame(doc_id: Long, frame_idx: Long, width: Long,
      height: Long, pix_sum: Long)

  /** REAL multi-frame decoder: steps an animated GIF frame by frame
    * through the JDK codec (`ImageReader.getNumImages(true)` +
    * per-index `read`) and emits each frame's dimensions and exact
    * gray pixel sum (`getRGB & 0xFF` — the palette-resolved sample,
    * not the palette index, so an identity-gray palette round-trips
    * bit-exactly). Frames are read as stored; the m13 fixture writes
    * full frames (no inter-frame disposal), which is what a
    * frame-extraction pipeline wants from its container anyway.
    */
  object GifFrameDecoder extends FrameDecoder {
    override def decodeFrames(docId: Long,
        payload: Array[Byte]): Iterator[VideoFrame] = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      require(readers.hasNext, "GifFrameDecoder: payload is not a decodable image")
      val reader = readers.next()
      try {
        reader.setInput(iis, false)
        val n = reader.getNumImages(true)
        val out = Vector.newBuilder[VideoFrame]
        var f = 0
        while (f < n) {
          val img = reader.read(f)
          val w = img.getWidth
          val h = img.getHeight
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              sum += (img.getRGB(x, y) & 0xFF).toLong
              x += 1
            }
            y += 1
          }
          out += VideoFrame(docId, f.toLong, w.toLong, h.toLong, sum)
          f += 1
        }
        out.result().iterator
      } finally {
        reader.dispose()
        iis.close()
      }
    }
  }

  /** Per-partition batch frame decode: binary payloads → frame rows
    * via a typed flatMap (encoder-backed, Tungsten path). Zero
    * shuffle — at 100 TB frame expansion must be a flatMap inside the
    * scan stage, never an exchange.
    */
  def decodeVideoFrames(docsWithPayload: DataFrame,
      decoder: FrameDecoder,
      idCol: String = "doc_id"): DataFrame = {
    val spark = docsWithPayload.sparkSession
    import spark.implicits._
    docsWithPayload
      .select(col(idCol).cast("long").as("doc_id"), col("payload"))
      .as[PayloadIn]
      .mapPartitions { batch =>
        decoder.open()
        batch.flatMap(p => decoder.decodeFrames(p.doc_id, p.payload))
      }
      .toDF()
  }

  /** Payload-to-payload media transform (resize / re-encode class):
    * the second half of a real multimodal pipeline, where decode is
    * only the entry point and the product is new MEDIA, not features.
    * Same batch discipline as [[Decoder]]: [[open]] once per
    * partition, one payload in, one payload out.
    */
  trait PayloadTransformer extends Serializable {
    def open(): Unit = ()
    def transform(payload: Array[Byte]): Array[Byte]
  }

  /** REAL image transform: 2×2 average-pool downsample (the classic
    * thumbnail/feature-pyramid step) through `javax.imageio` — decode
    * the payload, pool channel 0 with INTEGER cell averages (border
    * cells clip to the image, so odd dimensions pool to ceil(d/2)),
    * re-encode as 8-bit gray PNG. Integer division keeps every pooled
    * pixel analytically recomputable — the m5 oracle replays the pool
    * arithmetic from the generation params and the engine must agree
    * after a decode → pool → encode → decode round trip of genuine
    * PNG bytes.
    */
  object AvgPool2Transformer extends PayloadTransformer {
    override def transform(payload: Array[Byte]): Array[Byte] = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      require(img != null,
        "AvgPool2Transformer: payload is not a decodable image")
      val w = img.getWidth
      val h = img.getHeight
      val pw = (w + 1) / 2
      val ph = (h + 1) / 2
      val in = img.getRaster
      val out = new java.awt.image.BufferedImage(pw, ph,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = out.getRaster
      var cj = 0
      while (cj < ph) {
        var ci = 0
        while (ci < pw) {
          var sum = 0L
          var n = 0L
          var y = cj * 2
          while (y < math.min(cj * 2 + 2, h)) {
            var x = ci * 2
            while (x < math.min(ci * 2 + 2, w)) {
              sum += in.getSample(x, y, 0)
              n += 1
              x += 1
            }
            y += 1
          }
          raster.setSample(ci, cj, 0, (sum / n).toInt)
          ci += 1
        }
        cj += 1
      }
      val bytes = new java.io.ByteArrayOutputStream()
      require(javax.imageio.ImageIO.write(out, "png", bytes),
        "no PNG writer available")
      bytes.toByteArray
    }
  }

  /** Per-partition batch payload transform: (doc_id, payload) →
    * (doc_id, payload) with the media rewritten on executors — the
    * typed-Dataset twin of [[decodeFeatures]] for transforms. Zero
    * shuffle; compose with decodeFeatures to verify the output media.
    */
  def transformPayloads(docsWithPayload: DataFrame,
      transformer: PayloadTransformer,
      idCol: String = "doc_id"): DataFrame = {
    val spark = docsWithPayload.sparkSession
    import spark.implicits._
    docsWithPayload
      .select(col(idCol).cast("long").as("doc_id"), col("payload"))
      .as[PayloadIn]
      .mapPartitions { batch =>
        transformer.open()
        batch.map(p => PayloadIn(p.doc_id, transformer.transform(p.payload)))
      }
      .toDF()
  }

  /** Frame-sampling manifest: expand each "video" payload into one row
    * per SAMPLED frame (every `stride`-th of its `frameBytes`-sized
    * fake frames, matching ByteHistogramDecoder's frame arithmetic),
    * carrying a presentation timestamp and a content fingerprint of the
    * frame's leading bytes. The real-decoder swap point is the
    * fingerprint expression; the surrounding shape is production truth:
    * a row-local generate (posexplode of a computed index sequence),
    * ZERO shuffles, output partitioning inherited from the scan — at
    * 100 TB frame expansion must never be a shuffle, only a flatMap.
    *
    * frame_count uses INTEGER division (`div`), matching the oracle's
    * `//` at any magnitude — a double divide + cast-truncate is only
    * floor-equal below 2^53 and for non-negative lengths.
    */
  def sampleFrames(docs: DataFrame, frameBytes: Int = 256, stride: Int = 4,
      fpWindow: Int = 16, fps: Int = 25): DataFrame = {
    val frameMs = 1000 / fps
    docs
      .select(col("doc_id"), col("text"),
        expr(s"CAST(length(text) AS BIGINT) div $frameBytes + 1")
          .as("frame_count"))
      .select(col("doc_id"), col("text"), col("frame_count"),
        posexplode(sequence(lit(0L), col("frame_count") - 1, lit(stride.toLong))))
      .select(col("doc_id"),
        col("col").as("frame_idx"),
        (col("col") * frameMs).as("ts_ms"),
        substring(md5(col("text").substr(
          (col("col") * frameBytes + 1).cast("int"), lit(fpWindow))), 1, 8)
          .as("frame_fp"))
  }
}
