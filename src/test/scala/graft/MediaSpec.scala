package graft

import graft.multimodal.Media
import graft.multimodal.Media.{FakeDecoder, MediaMeta, MediaRow}

/** Multimodal plumbing: partition-batched decode shape, frame sampling
  * as metadata rewrite, deterministic features from the stub decoder. */
class MediaSpec extends SparkSpec {
  import spark.implicits._

  private def row(id: Long, frames: Int) = MediaRow(
    id, Array.tabulate(16)(i => (id * 31 + i).toByte),
    MediaMeta("video", 640, 480, frames, 0))

  test("featurize explodes frames executor-side, one feature row per frame") {
    val ds = Seq(row(1, 3), row(2, 1)).toDS().repartition(2)
    val out = Media.featurize(ds, () => new FakeDecoder).collect()
    assert(out.length == 4)
    assert(out.filter(_.id == 1).map(_.frameIdx).sorted.toSeq == Seq(0, 1, 2))
    assert(out.forall(_.feature.length == 4))
  }

  test("stub decode is deterministic: same payload+meta → same features") {
    val ds = Seq(row(7, 2)).toDS()
    val a = Media.featurize(ds, () => new FakeDecoder).collect().map(_.feature.toSeq)
    val b = Media.featurize(ds, () => new FakeDecoder).collect().map(_.feature.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("sampleFrames is a metadata-only rewrite with ceil-div semantics") {
    val ds = Seq(row(1, 24), row(2, 5), row(3, 1)).toDS()
    val out = Media.sampleFrames(ds, 4).collect().sortBy(_.id)
    assert(out.map(_.meta.nFrames).toSeq == Seq(6, 2, 1))
    // payload untouched — sampling must not copy or truncate bytes
    assert(out(0).payload.toSeq == row(1, 24).payload.toSeq)
  }

  test("resize rewrites target geometry; decode then honors it") {
    val ds = Seq(row(1, 2)).toDS()
    val out = Media.resize(ds, 224, 224).collect().head
    assert(out.meta.width == 224 && out.meta.height == 224)
  }

  test("PcmWavDecoder decodes a real RIFF/WAVE PCM-16 payload") {
    // synthesize a genuine WAV: 0.5-amplitude sine, 1000 samples, mono
    val n = 1000
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    (0 until n).foreach { i =>
      // half-sample phase: no sample lands exactly on zero, so every
      // crossing is a strict sign change
      val s = 0.5 * math.sin(2 * math.Pi * (i + 0.5) / 50.0)
      bb.putShort((s * 32767).toShort)
    }
    val wav = bb.array()
    val meta = MediaMeta("audio", 0, 0, nFrames = 2, sampleRateHz = 8000)
    val frames = new Media.PcmWavDecoder().decodeFeatures(wav, meta)
    assert(frames.length == 2) // frame budget honored
    frames.foreach { case Array(mean, rms, zcr, peak) =>
      assert(math.abs(mean) < 0.01)                  // sine is zero-mean
      assert(math.abs(rms - 0.3536) < 0.01)          // A/sqrt(2)
      assert(math.abs(zcr - 1.0 / 25.0) < 0.005)     // 2 crossings / 50-sample period
      assert(peak > 0.49 && peak <= 0.5)
    }
    // corrupt payloads must throw, not yield silent zeros
    intercept[IllegalArgumentException] {
      new Media.PcmWavDecoder().decodeFeatures("JUNKJUNK".getBytes, meta)
    }
    // and the decoder runs through the distributed featurize path
    val ds = Seq(MediaRow(9L, wav, meta)).toDS()
    val out = Media.featurize(ds, () => new Media.PcmWavDecoder).collect()
    assert(out.length == 2 && out.forall(_.feature.length == 4))
  }

  test("PpmImageDecoder decodes a real P6 payload with exact channel means") {
    val header = "P6\n# comment\n2 2\n255\n".getBytes("US-ASCII")
    val raster = Array.fill(4)(Array(100, 150, 200)).flatten.map(_.toByte)
    val ppm = header ++ raster
    val meta = MediaMeta("image", 2, 2, 1, 0)
    val Array(Array(r, g, b, y)) = new Media.PpmImageDecoder().decodeFeatures(ppm, meta)
    assert(math.abs(r - 100f / 255) < 1e-6)
    assert(math.abs(g - 150f / 255) < 1e-6)
    assert(math.abs(b - 200f / 255) < 1e-6)
    assert(math.abs(y - (0.299 * 100 + 0.587 * 150 + 0.114 * 200) / 255) < 1e-6)
    intercept[IllegalArgumentException] {
      new Media.PpmImageDecoder().decodeFeatures("P5\n1 1\n255\n!".getBytes, meta)
    }
  }

  test("rebalanceByBytes redistributes without losing rows") {
    val ds = Seq.tabulate(20)(i => row(i.toLong, 1)).toDS()
    val out = Media.rebalanceByBytes(ds, 5)
    assert(out.rdd.getNumPartitions == 5)
    assert(out.count() == 20)
  }
}
