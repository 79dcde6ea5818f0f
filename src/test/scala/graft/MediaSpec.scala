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

  test("rebalanceByBytes redistributes without losing rows") {
    val ds = Seq.tabulate(20)(i => row(i.toLong, 1)).toDS()
    val out = Media.rebalanceByBytes(ds, 5)
    assert(out.rdd.getNumPartitions == 5)
    assert(out.count() == 20)
  }
}
