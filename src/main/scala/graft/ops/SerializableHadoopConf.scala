package graft.ops

import java.io.{IOException, ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/** Java-serializable wrapper around a Hadoop Configuration (which is
  * Writable but not Serializable), so executors can read files through
  * the SESSION's configuration — FS credentials, scheme mappings,
  * parquet knobs — instead of a bare `new Configuration()` that only
  * sees the defaults. Same shape as Spark's own (private[spark])
  * SerializableConfiguration; ship it broadcast or captured. */
class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {

  @throws[IOException]
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  @throws[IOException]
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
