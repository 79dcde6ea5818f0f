package graft.multimodal

import org.apache.spark.sql.{Dataset, SparkSession}

/** Multimodal column plumbing (driver mandate: treat image/audio/video as
  * opaque binary columns with typed metadata; decode / feature-extract /
  * resize / frame-sample as partition-batched functions).
  *
  * The REAL Spark-side machinery is here and tested: the typed schema
  * (binary payload + metadata struct), the partition-batched execution
  * shape (decoder constructed ONCE per partition — the Scala analogue of
  * mapInPandas batch amortization: codec/model init is the expensive
  * part at 100 TB, so it must not happen per row), and the
  * repartition-by-cost hook. UNCOMPRESSED formats decode for real on
  * the pure JVM: [[PcmWavDecoder]] (RIFF/WAVE PCM-16) and
  * [[PpmImageDecoder]] (PPM P6 RGB). COMPRESSED codecs (JPEG/FLAC/
  * H.264) need libraries this container doesn't ship, so [[Decoder]]
  * stays the injection point with [[FakeDecoder]] as the clearly-marked
  * deterministic stand-in — swap in a JNI/javacpp-backed implementation
  * without touching any plumbing.
  */
object Media {

  /** Typed metadata travels WITH the payload so downstream ops can
    * filter/partition on it without decoding (metadata predicate
    * pushdown: e.g. drop oversized frames before the expensive decode). */
  final case class MediaMeta(mediaType: String, width: Int, height: Int,
      nFrames: Int, sampleRateHz: Int)

  final case class MediaRow(id: Long, payload: Array[Byte], meta: MediaMeta)

  final case class Frame(id: Long, frameIdx: Int, feature: Array[Float])

  /** Decode boundary. Implementations MUST be Serializable (constructed
    * on the driver, shipped to executors) and are instantiated once per
    * partition via the thunk passed to the ops below. */
  trait Decoder extends Serializable {
    /** payload → per-frame feature vectors (images: 1 frame). */
    def decodeFeatures(payload: Array[Byte], meta: MediaMeta): Array[Array[Float]]
  }

  /** STUB: deterministic fake decode — stands in for COMPRESSED codecs
    * (JPEG/FLAC/H.264) whose libraries this container doesn't ship.
    * Features derive only from payload bytes + meta, so tests are
    * exactly reproducible cross-run. The UNCOMPRESSED formats below
    * ([[PcmWavDecoder]], [[PpmImageDecoder]]) are real byte-level
    * decoders — no stub. */
  final class FakeDecoder extends Decoder {
    def decodeFeatures(payload: Array[Byte], meta: MediaMeta): Array[Array[Float]] =
      Array.tabulate(math.max(1, meta.nFrames)) { f =>
        Array.tabulate(4) { d =>
          val b = payload((f * 4 + d) % payload.length) & 0xff
          (b + f).toFloat / 255f
        }
      }
  }

  /** REAL audio decode: RIFF/WAVE, PCM 16-bit (format tag 1), any
    * channel count — pure-JVM chunk walking, no codec library needed
    * for uncompressed audio. The sample stream is split into
    * `meta.nFrames` equal windows (the frame-sampling contract: a
    * reduced frame budget reduces decode output); each window yields
    * [mean, rms, zero-cross rate, peak], amplitudes normalized to
    * [-1, 1]. Malformed payloads throw — a corrupt file must surface,
    * not silently yield zeros. */
  final class PcmWavDecoder extends Decoder {
    def decodeFeatures(payload: Array[Byte], meta: MediaMeta): Array[Array[Float]] = {
      val bb = java.nio.ByteBuffer.wrap(payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      require(payload.length >= 44 &&
        payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' &&
        payload(3) == 'F' && payload(8) == 'W' && payload(9) == 'A' &&
        payload(10) == 'V' && payload(11) == 'E', "not a RIFF/WAVE payload")
      var pos = 12
      var dataOff = -1; var dataLen = 0
      var fmtOk = false
      while (pos + 8 <= payload.length && (dataOff < 0 || !fmtOk)) {
        val id = new String(payload, pos, 4, "US-ASCII")
        val size = bb.getInt(pos + 4)
        if (id == "fmt ") {
          val audioFormat = bb.getShort(pos + 8)
          val bits = bb.getShort(pos + 22)
          require(audioFormat == 1 && bits == 16,
            s"unsupported WAV: format=$audioFormat bits=$bits (PCM-16 only)")
          fmtOk = true
        } else if (id == "data") {
          dataOff = pos + 8; dataLen = size
        }
        // A negative chunk size would advance pos by <= 0 and spin forever;
        // malformed must throw, per the decode contract above.
        require(size >= 0, s"corrupt WAV chunk '$id': negative size $size")
        pos += 8 + size + (size & 1) // chunks are word-aligned
      }
      require(fmtOk && dataOff >= 0, "WAV missing fmt/data chunk")
      val n = math.min(dataLen, payload.length - dataOff) / 2
      require(n > 0, "WAV data chunk empty")
      val windows = math.max(1, meta.nFrames)
      Array.tabulate(windows) { w =>
        val lo = (w.toLong * n / windows).toInt
        val hi = math.max(((w + 1).toLong * n / windows).toInt, lo + 1)
        var sum = 0.0; var sq = 0.0; var peak = 0.0; var zc = 0
        var prev = 0.0
        var i = lo
        while (i < hi) {
          val s = bb.getShort(dataOff + 2 * i) / 32768.0
          sum += s; sq += s * s
          if (math.abs(s) > peak) peak = math.abs(s)
          if (i > lo && s * prev < 0) zc += 1
          prev = s; i += 1
        }
        val len = hi - lo
        Array((sum / len).toFloat, math.sqrt(sq / len).toFloat,
          (zc.toDouble / len).toFloat, peak.toFloat)
      }
    }
  }

  /** REAL image decode: PPM "P6" (binary RGB, maxval 255) — the
    * uncompressed interchange format, parsed byte-for-byte on the JVM.
    * One frame per image; feature = [meanR, meanG, meanB, mean
    * luminance] in [0, 1] (Rec.601 luma weights). */
  final class PpmImageDecoder extends Decoder {
    def decodeFeatures(payload: Array[Byte], meta: MediaMeta): Array[Array[Float]] = {
      var pos = 0
      def skipWs(): Unit = {
        var done = false
        while (!done && pos < payload.length) {
          val c = payload(pos).toChar
          if (c == '#') { while (pos < payload.length && payload(pos) != '\n') pos += 1 }
          else if (c.isWhitespace) pos += 1
          else done = true
        }
      }
      def token(): String = {
        skipWs()
        val start = pos
        while (pos < payload.length && !payload(pos).toChar.isWhitespace) pos += 1
        new String(payload, start, pos - start, "US-ASCII")
      }
      require(token() == "P6", "not a P6 PPM payload")
      val w = token().toInt; val h = token().toInt
      val maxval = token().toInt
      require(maxval == 255, s"PPM maxval $maxval unsupported (255 only)")
      pos += 1 // single whitespace after maxval, then raster
      val need = w * h * 3
      require(payload.length - pos >= need,
        s"PPM raster truncated: need $need, have ${payload.length - pos}")
      var r = 0.0; var g = 0.0; var b = 0.0
      var i = 0
      while (i < need) {
        r += (payload(pos + i) & 0xff)
        g += (payload(pos + i + 1) & 0xff)
        b += (payload(pos + i + 2) & 0xff)
        i += 3
      }
      val px = (w * h).toDouble
      val (mr, mg, mb) = (r / px / 255.0, g / px / 255.0, b / px / 255.0)
      Array(Array(mr.toFloat, mg.toFloat, mb.toFloat,
        (0.299 * mr + 0.587 * mg + 0.114 * mb).toFloat))
    }
  }

  /** Feature extraction: one decoder per PARTITION, rows streamed through
    * it — never one decoder per row, never a collect. Frame explosion
    * happens executor-side so a 10k-frame video never materializes as a
    * single driver object. */
  def featurize(rows: Dataset[MediaRow], mkDecoder: () => Decoder): Dataset[Frame] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      val dec = mkDecoder() // per-partition init (codec tables, model weights)
      it.flatMap { r =>
        dec.decodeFeatures(r.payload, r.meta).iterator.zipWithIndex.map {
          case (feat, idx) => Frame(r.id, idx, feat)
        }
      }
    }
  }

  /** Frame sampling as a pure metadata rewrite: keep every `stride`-th
    * frame. Runs BEFORE decode — the decoder receives the reduced frame
    * budget, so sampling saves decode work instead of discarding it. */
  def sampleFrames(rows: Dataset[MediaRow], stride: Int): Dataset[MediaRow] = {
    import rows.sparkSession.implicits._
    require(stride >= 1)
    rows.map { r =>
      val kept = (r.meta.nFrames + stride - 1) / stride
      r.copy(meta = r.meta.copy(nFrames = math.max(kept, 1)))
    }
  }

  /** Resize is likewise metadata-first: record the target geometry; the
    * decoder applies it during decode (decode-at-target-size is how real
    * codecs avoid a full-res intermediate). */
  def resize(rows: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import rows.sparkSession.implicits._
    rows.map(r => r.copy(meta = r.meta.copy(width = w, height = h)))
  }

  /** Skew control: decode cost tracks payload size, not row count — so
    * rebalance on byte volume before a heavy decode stage. */
  def rebalanceByBytes(rows: Dataset[MediaRow], partitions: Int): Dataset[MediaRow] =
    rows.repartition(partitions,
      org.apache.spark.sql.functions.expr("crc32(payload)"))
}
