package graft

import java.io.{ByteArrayOutputStream, FileNotFoundException, OutputStream}
import java.net.URI
import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** In-memory OBJECT-STORE double for the conditional-put arbiter branch
  * ([[graft.ops.Manifest.publishIfAbsent]]): a flat key→bytes namespace
  * whose exclusive `create(path, overwrite = false)` is a true
  * compare-and-set (one `putIfAbsent` — the semantics of S3
  * `If-None-Match: *` / GCS `ifGenerationMatch=0`), and whose `rename`
  * THROWS — an object store has no atomic rename, and a commit path
  * that reached for it would be the probe-then-rename lost-update bug.
  * Keys live in a JVM-static map so every FileSystem instance (Hadoop
  * caches per scheme+authority) sees one namespace, like a bucket. */
object MemCasFileSystem {
  /** key → bytes; PENDING marks a claimed-but-unwritten object. */
  private[graft] val store = new ConcurrentHashMap[String, Array[Byte]]()
  private[graft] val PENDING = new Array[Byte](0)
  /** Retry-ambiguity injection: when > 0, every Nth SUCCESSFUL exclusive
    * create commits its bytes and then THROWS from close() — the PUT
    * landed, the response was lost (the S3 500-after-write shape). The
    * caller cannot tell this from a genuine conflict without reading the
    * head back. */
  @volatile private[graft] var ambiguityEvery: Int = 0
  private[graft] val createCount =
    new java.util.concurrent.atomic.AtomicInteger(0)
  /** Latency jitter bound in ms (0 = off) injected before open/create/
    * list — object-store calls are not instantaneous, and the arbiter
    * must not depend on any two of them appearing ordered. Seeded, so
    * runs are reproducible. */
  @volatile private[graft] var jitterMs: Int = 0
  private val rnd = new java.util.Random(0x9e3779b9L)
  private[graft] def jitter(): Unit = {
    val j = jitterMs
    if (j > 0) Thread.sleep(rnd.nextInt(j).toLong)
  }
  def clear(): Unit = {
    store.clear()
    ambiguityEvery = 0
    jitterMs = 0
    createCount.set(0)
  }
}

class MemCasFileSystem extends FileSystem {
  import MemCasFileSystem._

  private var fsUri: URI = URI.create("memcas:///")
  private var wd: Path = new Path("/")

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    fsUri = URI.create(
      s"${name.getScheme}://${Option(name.getAuthority).getOrElse("")}")
    setConf(conf)
  }

  override def getScheme: String = "memcas"
  override def getUri: URI = fsUri

  private def key(f: Path): String = makeQualified(f).toUri.getPath

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    jitter()
    val b = store.get(key(f))
    if (b == null || (b eq PENDING)) throw new FileNotFoundException(key(f))
    new FSDataInputStream(new MemInputStream(b))
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    jitter()
    val k = key(f)
    if (!overwrite) {
      // THE conditional put: one atomic claim, no exists probe
      if (store.putIfAbsent(k, PENDING) != null)
        throw new FileAlreadyExistsException(s"conditional put lost: $k")
    } else store.put(k, PENDING)
    // this create WON the claim; decide now whether its success will be
    // reported as a failure (retry ambiguity) — the bytes land either way
    val ambiguous = !overwrite && ambiguityEvery > 0 &&
      createCount.incrementAndGet() % ambiguityEvery == 0
    val bos = new ByteArrayOutputStream()
    val sink: OutputStream = new OutputStream {
      override def write(b: Int): Unit = bos.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        bos.write(b, off, len)
      override def close(): Unit = {
        store.put(k, bos.toByteArray)
        if (ambiguous)
          throw new java.io.IOException(
            s"simulated retry ambiguity: PUT landed at $k, response lost")
      }
    }
    new FSDataOutputStream(sink, null)
  }

  override def append(f: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("memcas: no append")

  override def rename(src: Path, dst: Path): Boolean =
    throw new UnsupportedOperationException(
      "memcas: an object store has no atomic rename — the arbiter must " +
        "not reach for one on the conditional-put branch")

  override def delete(f: Path, recursive: Boolean): Boolean = {
    val k = key(f)
    val direct = store.remove(k) != null
    if (recursive) {
      val pfx = if (k.endsWith("/")) k else k + "/"
      val it = store.keySet.iterator()
      var any = direct
      while (it.hasNext) {
        if (it.next().startsWith(pfx)) { it.remove(); any = true }
      }
      any
    } else direct
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    jitter()
    val k = key(f)
    // one consistent snapshot: a concurrent writer may create/delete
    // between listing and stat (an object-store LIST has the same
    // semantics), so statuses come from the snapshot, never a re-stat
    import scala.jdk.CollectionConverters._
    val snap = store.entrySet().asScala
      .map(e => e.getKey -> e.getValue).toMap
    snap.get(k) match {
      case Some(b) =>
        return Array(new FileStatus(b.length.toLong, false, 1, 4096, 0L,
          makeQualified(f)))
      case None => ()
    }
    val pfx = if (k.endsWith("/")) k else k + "/"
    val children = snap.keySet.filter(_.startsWith(pfx))
      .map(_.substring(pfx.length).takeWhile(_ != '/')).toSet
    if (children.isEmpty) throw new FileNotFoundException(k)
    children.toArray.sorted.map { c =>
      val ck = pfx + c
      snap.get(ck) match {
        case Some(b) => new FileStatus(b.length.toLong, false, 1, 4096, 0L,
          makeQualified(new Path(ck)))
        case None => new FileStatus(0L, true, 1, 4096, 0L,
          makeQualified(new Path(ck)))
      }
    }
  }

  override def setWorkingDirectory(dir: Path): Unit = { wd = dir }
  override def getWorkingDirectory: Path = wd
  override def mkdirs(f: Path, permission: FsPermission): Boolean = true

  override def getFileStatus(f: Path): FileStatus = {
    jitter()
    val k = key(f)
    val b = store.get(k)
    if (b != null)
      return new FileStatus(b.length.toLong, false, 1, 4096, 0L,
        makeQualified(f))
    val pfx = if (k.endsWith("/")) k else k + "/"
    import scala.jdk.CollectionConverters._
    if (store.keySet.asScala.exists(_.startsWith(pfx)))
      new FileStatus(0L, true, 1, 4096, 0L, makeQualified(f))
    else throw new FileNotFoundException(k)
  }

  /** Seekable in-memory FSInputStream (Hadoop's contract for open). */
  private class MemInputStream(bytes: Array[Byte]) extends FSInputStream {
    private var pos = 0
    override def seek(p: Long): Unit = { pos = p.toInt }
    override def getPos: Long = pos.toLong
    override def seekToNewSource(targetPos: Long): Boolean = false
    override def read(): Int =
      if (pos >= bytes.length) -1
      else { val b = bytes(pos) & 0xff; pos += 1; b }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (pos >= bytes.length) return -1
      val n = math.min(len, bytes.length - pos)
      System.arraycopy(bytes, pos, b, off, n)
      pos += n
      n
    }
  }
}
