package graft

/** Java-serializable wrapper for a Hadoop `Configuration`, so executor-side
  * closures (e.g. per-partition sketch loaders) open storage through the
  * DRIVER's configured filesystem settings — `spark.hadoop.*` credentials,
  * custom `fs.<scheme>.impl` bindings — instead of a fresh default
  * `Configuration()` that silently drops them. `Configuration` itself is a
  * Hadoop `Writable`, not `Serializable`; this adapter bridges the two
  * (the same shape as Spark's internal `SerializableConfiguration`, which
  * is `private[spark]`).
  *
  * Use: broadcast one instance, call `.value` inside the task.
  */
class HadoopConfSer(@transient var value: org.apache.hadoop.conf.Configuration)
    extends Serializable {

  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}
