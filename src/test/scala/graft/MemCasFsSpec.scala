package graft

import graft.ops.Manifest
import org.apache.hadoop.fs.Path

/** The conditional-put arbiter branch, raced for real (VERDICT r9 #4):
  * [[graft.ops.Manifest.publishIfAbsent]] routed through
  * `graft.manifest.conditionalPutSchemes` against [[MemCasFileSystem]],
  * whose exclusive create is a true compare-and-set and whose rename
  * THROWS — if the arbiter ever fell back to rename semantics on this
  * branch, every test here would explode rather than silently lose a
  * commit. The 8-writer commitWithRetry race is the same suite that
  * caught the probe-then-rename lost update on file: in round 7. Also
  * pins the ADVICE r9 rename-scheme allowlist: a scheme listed under
  * `graft.manifest.atomicRenameSchemes` publishes through Rename.NONE
  * instead of being rejected, unknown schemes still fail loudly. */
class MemCasFsSpec extends SparkSpec {

  private val hc = spark.sparkContext.hadoopConfiguration
  hc.set("fs.memcas.impl", classOf[MemCasFileSystem].getName)
  hc.set("graft.manifest.conditionalPutSchemes", "memcas")

  test("two racers through the conditional put: exactly one winner, temps cleaned") {
    MemCasFileSystem.clear()
    val dst = new Path("memcas://bucket/tbl/_manifest/v1.json")
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Boolean]()
    val gate = new java.util.concurrent.CountDownLatch(1)
    val ts = (1 to 2).map { i =>
      new Thread(() => {
        val tmp = new Path(s"memcas://bucket/tbl/_manifest/.tmp-$i.json")
        val fs = tmp.getFileSystem(hc)
        val out = fs.create(tmp, true)
        out.write(s"writer-$i".getBytes("UTF-8")); out.close()
        gate.await()
        results.add(Manifest.publishIfAbsent(hc, tmp, dst))
      })
    }
    ts.foreach(_.start()); gate.countDown(); ts.foreach(_.join())
    import scala.jdk.CollectionConverters._
    assert(results.asScala.count(identity) == 1,
      s"exactly one conditional put may win, got $results")
    val fs = dst.getFileSystem(hc)
    assert(fs.exists(dst), "the winner's manifest must be visible")
    (1 to 2).foreach { i =>
      assert(!fs.exists(new Path(s"memcas://bucket/tbl/_manifest/.tmp-$i.json")),
        s"writer $i temp file must be cleaned up")
    }
    // the published bytes are ONE writer's whole payload, never a blend
    val in = fs.open(dst)
    val body = new String(
      org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
    in.close()
    assert(body == "writer-1" || body == "writer-2", body)
  }

  test("8-writer commitWithRetry race over the object-store double: no lost update") {
    MemCasFileSystem.clear()
    val dir = "memcas://bucket/tbl-race"
    assert(Manifest.tryCommit(spark, dir, -1, Seq.empty) == Right(0))
    val nWriters = 8
    val gate = new java.util.concurrent.CountDownLatch(1)
    val ts = (1 to nWriters).map { i =>
      new Thread(() => {
        gate.await()
        Manifest.commitWithRetry(spark, dir, maxAttempts = 100) { (_, cur) =>
          cur :+ Manifest.FileEntry(s"mem://t$i.parquet", 1, 1, 0, 0)
        }
        ()
      })
    }
    ts.foreach(_.start()); gate.countDown(); ts.foreach(_.join())
    val head = Manifest.currentVersion(spark, dir)
    assert(head == nWriters, s"expected $nWriters commits past v0, got v$head")
    val byV = (0 to head).map(v =>
      Manifest.read(spark, dir, v).map(_.path).toSet)
    (1 to head).foreach { v =>
      assert(byV(v).size == byV(v - 1).size + 1, s"v$v not parent+1")
      assert(byV(v - 1).subsetOf(byV(v)), s"v$v dropped entries")
    }
    (1 to nWriters).foreach { i =>
      assert(byV(head).contains(s"mem://t$i.parquet"), byV(head))
    }
  }

  test("retry ambiguity: a PUT that lands but reports failure is reconciled, never re-applied") {
    MemCasFileSystem.clear()
    val dir = "memcas://bucket/tbl-ambig"
    assert(Manifest.tryCommit(spark, dir, -1, Seq.empty) == Right(0))
    // every 3rd winning create THROWS after its bytes land (the S3
    // 500-after-write), plus latency jitter on every store call — a
    // naive arbiter now rebases on its own commit and applies the
    // writer's delta twice
    MemCasFileSystem.ambiguityEvery = 3
    MemCasFileSystem.jitterMs = 3
    val nWriters = 8
    val gate = new java.util.concurrent.CountDownLatch(1)
    val committed = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val ts = (1 to nWriters).map { i =>
      new Thread(() => {
        gate.await()
        committed.add(Manifest.commitWithRetry(spark, dir, maxAttempts = 100) {
          (_, cur) =>
            cur :+ Manifest.FileEntry(s"mem://a$i.parquet", 1, 1, 0, 0)
        })
      })
    }
    ts.foreach(_.start()); gate.countDown(); ts.foreach(_.join())
    MemCasFileSystem.ambiguityEvery = 0
    MemCasFileSystem.jitterMs = 0
    // exactly one version per writer: ambiguity produced no duplicate
    // and no lost commit
    val head = Manifest.currentVersion(spark, dir)
    assert(head == nWriters, s"expected v$nWriters head, got v$head")
    import scala.jdk.CollectionConverters._
    assert(committed.asScala.toSet == (1 to nWriters).toSet,
      s"every writer owns exactly one distinct version: $committed")
    val byV = (0 to head).map(v =>
      Manifest.read(spark, dir, v).map(_.path).toSet)
    (1 to head).foreach { v =>
      assert(byV(v).size == byV(v - 1).size + 1, s"v$v not parent+1")
      assert(byV(v - 1).subsetOf(byV(v)), s"v$v dropped entries")
    }
    (1 to nWriters).foreach { i =>
      // each delta applied EXACTLY once across the whole chain
      assert(byV(head).count(_ == s"mem://a$i.parquet") == 1)
    }
  }

  test("rename-scheme allowlist: an opted-in HDFS-compatible scheme publishes") {
    val conf = new org.apache.hadoop.conf.Configuration(hc)
    conf.set("fs.mockabfs.impl", classOf[MockAbfsFs].getName)
    conf.set("fs.AbstractFileSystem.mockabfs.impl",
      classOf[MockAbfsAbstract].getName)
    conf.set("fs.mockabfs.impl.disable.cache", "true")
    val dir = java.nio.file.Files.createTempDirectory("graft-abfs").toString
    def path(n: String) = new Path(s"mockabfs://host$dir/$n")
    val fs = path("x").getFileSystem(conf)
    def stage(n: String, body: String): Path = {
      val p = path(n)
      val out = fs.create(p, true)
      out.write(body.getBytes("UTF-8")); out.close()
      p
    }
    // not listed: refuses loudly (the r8 default stands)
    val ex = intercept[UnsupportedOperationException] {
      Manifest.publishIfAbsent(conf, stage(".t0", "a"), path("v1.json"))
    }
    assert(ex.getMessage.contains("atomicRenameSchemes"), ex.getMessage)
    // listed: publishes through Rename.NONE; a second publish loses
    conf.set("graft.manifest.atomicRenameSchemes", "mockabfs")
    assert(Manifest.publishIfAbsent(conf, stage(".t1", "b"), path("v1.json")))
    assert(!Manifest.publishIfAbsent(conf, stage(".t2", "c"), path("v1.json")),
      "existing destination must lose")
    assert(!fs.exists(path(".t1")) && !fs.exists(path(".t2")),
      "temps must be cleaned")
  }
}

/** Local FS masquerading as an HDFS-compatible rename-atomic store. */
class MockAbfsFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "mockabfs"
  override def getUri: java.net.URI = java.net.URI.create("mockabfs://host/")
}

/** The AbstractFileSystem binding FileContext needs for the mock. */
class MockAbfsAbstract(uri: java.net.URI,
    conf: org.apache.hadoop.conf.Configuration)
  extends org.apache.hadoop.fs.DelegateToFileSystem(
    uri, new MockAbfsFs(), conf, "mockabfs", false)
