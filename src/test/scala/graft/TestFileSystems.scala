package graft

import java.net.URI

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** Object-store stand-in for StoreLock capability specs: `setTimes` is
  * unsupported (s3a and friends no-op or reject it), everything else is the
  * local filesystem. Registered in a spec via
  * `fs.notimes.impl` → this class; paths look like `notimes:/tmp/...`.
  */
class NoSetTimesFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "notimes"
  override def getUri: URI = URI.create("notimes:///")
  override def setTimes(p: Path, mtime: Long, atime: Long): Unit =
    throw new UnsupportedOperationException(
      "setTimes is not supported (object-store behavior)")
}

/** A filesystem whose rename REFRESHES the destination's mtime instead of
  * carrying the source's — the behavior that made an age-only tombstone
  * re-check judge every renamed stale lock "fresh" and restore it forever.
  */
class RenameTouchFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "touchy"
  override def getUri: URI = URI.create("touchy:///")
  override def rename(src: Path, dst: Path): Boolean = {
    val ok = super.rename(src, dst)
    if (ok) super.setTimes(dst, System.currentTimeMillis(), -1)
    ok
  }
}

/** A filesystem whose `create(overwrite = false)` is BEST-EFFORT: it never
  * rejects an existing destination — object-store PUT semantics without a
  * conditional-write primitive (plain S3 before If-None-Match). The
  * exclusive create StoreLock's acquire relies on silently becomes
  * last-writer-wins, so two writers can both "acquire"; the spec pins that
  * this degrades to loud DETECTION, never a silent interleaving. setTimes
  * is left working so the object-store axes stay independently testable.
  */
class BestEffortCreateFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "put"
  override def getUri: URI = URI.create("put:///")
  // both overloads: FileSystem.create(path, overwrite=false) dispatches
  // through the FsPermission variant on RawLocalFileSystem
  override def create(p: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream =
    super.create(p, true, bufferSize, replication, blockSize, progress)
  override def create(p: Path,
      permission: org.apache.hadoop.fs.permission.FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long, progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream =
    super.create(p, permission, true, bufferSize, replication, blockSize,
      progress)
}

/** A filesystem that makes [[graft.StoreCommit]]'s bootstrap LOSE the
  * first-commit race deterministically: the first rename whose destination
  * is a `_commits` dir finds a winner's manifest already materialized
  * there (created inside this override, as if a concurrent writer's rename
  * landed first). Hadoop/posix then moves the source INSIDE the existing
  * destination (File.renameTo fails on a non-empty dir; the FileUtil.copy
  * fallback copies into it) and still returns true — the exact
  * undetectable-by-return-value outcome the commit path must verify by
  * effect.
  */
class CommitRaceFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "crace"
  override def getUri: URI = URI.create("crace:///")
  override def rename(src: Path, dst: Path): Boolean = {
    if (dst.getName == "_commits" && !exists(dst)) {
      mkdirs(dst)
      val out = super.create(new Path(dst, CommitRaceFileSystem.WinnerToken),
        true, 4096, 1.toShort, 33554432L, null)
      try out.write(CommitRaceFileSystem.WinnerToken.getBytes("UTF-8"))
      finally out.close()
    }
    super.rename(src, dst)
  }
}
object CommitRaceFileSystem { val WinnerToken = "winner-batch" }
