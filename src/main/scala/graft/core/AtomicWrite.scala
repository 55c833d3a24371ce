package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Atomic directory publication — the Parquet-era stand-in for the ACID
  * overwrite the reference gets for free from Delta
  * (ref SparkManager.scala:36-37 enables Delta; see SURVEY.md §2.6).
  *
  * A plain `df.write.mode("overwrite").parquet(target)` deletes the old tree
  * and then writes files into it one by one, so a concurrent reader of a
  * batch being re-run can list a half-written directory. [[publish]] instead
  * writes the complete new tree into a hidden temp sibling, then swaps it in
  * with two directory renames. A reader therefore observes the complete old
  * tree, the complete new tree, or — for the instant between the two
  * renames — a missing directory (a clean, retryable `FileNotFoundException`),
  * '''never''' a partial listing.
  *
  * Renames are O(1) metadata ops on HDFS-compatible filesystems regardless of
  * data size, so the swap cost does not grow with the 100 TB snapshot.
  */
object AtomicWrite {

  /** Run `write` against a temp path, then atomically swap the result into
    * place at `target`. `write` must produce a complete directory tree at the
    * path it is given (e.g. `df.write.parquet(tmp)`). */
  def publish(spark: SparkSession, target: String)(write: String => Unit): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val live = new Path(target)
    val fs = live.getFileSystem(conf)
    val parent = Option(live.getParent).getOrElse(
      throw new IllegalArgumentException(s"target has no parent: $target"))
    fs.mkdirs(parent)
    def side(prefix: String) =
      new Path(parent, s".$prefix-${live.getName}-${java.util.UUID.randomUUID.toString.take(8)}")
    val tmp = side("tmp")
    try {
      write(tmp.toString)
      val old = side("old")
      if (fs.exists(live) && !fs.rename(live, old))
        throw new java.io.IOException(s"atomic publish: failed to retire $live")
      if (!fs.rename(tmp, live))
        throw new java.io.IOException(s"atomic publish: failed to install $tmp -> $live")
      fs.delete(old, true)
    } finally {
      fs.delete(tmp, true) // no-op on success (renamed away); cleanup on failure
    }
  }
}
