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
  * repartition-by-cost hook. The byte-level codecs themselves need
  * image/audio libraries this container doesn't ship, so [[Decoder]] is
  * the injection point and [[FakeDecoder]] is a clearly-marked
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

  /** STUB: deterministic fake decode — a real implementation would parse
    * the codec (JPEG/FLAC/H.264) here. Features derive only from payload
    * bytes + meta, so tests are exactly reproducible cross-run. */
  final class FakeDecoder extends Decoder {
    def decodeFeatures(payload: Array[Byte], meta: MediaMeta): Array[Array[Float]] =
      Array.tabulate(math.max(1, meta.nFrames)) { f =>
        Array.tabulate(4) { d =>
          val b = payload((f * 4 + d) % payload.length) & 0xff
          (b + f).toFloat / 255f
        }
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
