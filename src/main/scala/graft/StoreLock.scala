package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Another writer holds (or held) the store lock past the wait budget. */
class StoreLockTimeoutException(msg: String) extends RuntimeException(msg)

/** Our lock vanished or changed owner while the mutation ran — a stale-break
  * racer took it. The mutation's writes may have interleaved with the
  * thief's; the store needs inspection (batch dirs are replay-idempotent,
  * so re-running the losing append under a fresh lock is the usual repair).
  */
class StoreLockStolenException(msg: String) extends RuntimeException(msg)

/** Cross-writer mutual exclusion for the persisted-store family
  * (fingerprint / minhash / simhash / winnow / cluster / postings / emb /
  * SQ8 / PQ / IVF / SCD2 ...): every store MUTATOR runs its body under an
  * exclusive-create lock file, so two concurrent appenders can no longer
  * interleave a batch dir's overwrite, double-admit ids past a committed-
  * only clash check, or lose a check-then-write sidecar update (the winnow
  * meta race: two cold starts at different (k, w) both passing the
  * missing-meta check). The protocol is [[graft.catalog.JsonFileCatalog]]'s
  * proven one, generalized:
  *
  *  - acquire = atomic exclusive create of a token-bearing lock file
  *    (`java.io.File.createNewFile` — O_CREAT|O_EXCL — on `file://`, where
  *    Hadoop's LocalFileSystem `create(overwrite = false)` is
  *    check-then-create; `create(overwrite = false)` elsewhere: atomic
  *    server-side on HDFS, best-effort on object stores);
  *  - a lock older than `staleMs` is presumed abandoned and broken via
  *    atomic rename to a unique per-breaker tombstone; after the rename
  *    the tombstone is RE-CHECKED by TOKEN (and, where rename preserves
  *    mtimes, by age) — a breaker that raced a fresh replacement lock
  *    into its rename window restores it untouched, and the residual (a
  *    restore losing a further race) is caught loudly by the displaced
  *    owner's commit-time verify, never passed silently. The token
  *    compare makes breaking correct even on filesystems whose rename
  *    REFRESHES the destination's mtime (where an age-only re-check
  *    would judge every tombstone fresh and a dead writer's lock would
  *    be unbreakable);
  *  - waiting writers poll up to `waitMs`, then fail LOUDLY
  *    ([[StoreLockTimeoutException]]) instead of silently racing;
  *  - release deletes the lock only while it still carries OUR token;
  *  - after the body completes, ownership is re-verified — a stolen lock
  *    raises [[StoreLockStolenException]] so an interleaving is REPORTED,
  *    never silent (batch-dir writes are replay-idempotent, so the losing
  *    writer re-runs its token under a fresh lock).
  *
  * The lock file lives BESIDE the store root (`<parent>/.<name>.lock`),
  * not under it: builders legitimately delete the store root inside their
  * critical section, which must not release the lock. Re-entrant per
  * thread (builders call their own appenders). A HEARTBEAT thread
  * refreshes the held lock's mtime every `staleMs / 3`, so staleness only
  * ever fires on a writer whose process actually died — a live append of
  * ANY length is never broken out from under its owner, and `staleMs`
  * (default 30 min) is purely the crash-detection latency, not a bound on
  * critical-section length.
  *
  * SCOPE of that guarantee: it requires a filesystem whose `setTimes`
  * actually works. Each FileSystem is PROBED once (a scratch file beside
  * the lock: set a known mtime, read it back); where the probe fails —
  * object stores like s3a no-op or reject `setTimes` — heartbeats are
  * impossible for EVERY writer on that filesystem, so stale-breaking is
  * DISABLED there: a crashed writer's lock must be removed by an operator
  * (waiters keep failing loudly with [[StoreLockTimeoutException]], whose
  * message says exactly that), and a live writer is never broken. Liveness
  * degrades, safety never does. Reads never lock: probes see committed
  * batch dirs, and sidecar-staleness guards (bloom/sharded-bloom) refuse
  * rather than misread.
  *
  * The second capability this protocol leans on is an ATOMIC
  * `create(overwrite = false)`. Where a store offers only best-effort PUT
  * (no conditional write — plain S3 before If-None-Match, and any
  * eventually-consistent listing layer), two writers can both "win" the
  * exclusive create, and the guarantee degrades from PREVENTION to
  * DETECTION — the exact residual contract, spec-pinned against a
  * PUT-semantics filesystem stub: overlapping writers are possible, but
  * never silent. The displaced writer's commit-time verify raises
  * [[StoreLockStolenException]] (its token is gone), the surviving
  * writer's batch dirs are replay-idempotent, and the committed-read
  * manifest ([[StoreCommit]]) keeps half-written dirs invisible to every
  * probe throughout — so the repair is always "re-run the losing batch
  * token", never a corrupted store. Deployments that need true mutual
  * exclusion on such backends should point the lock's parent dir at a
  * filesystem with atomic create (HDFS, a conditional-PUT bucket) — the
  * lock file already lives beside, not inside, the store root, so the two
  * can use different filesystems.
  */
object StoreLock {

  private val held = new ThreadLocal[scala.collection.mutable.Set[String]] {
    override def initialValue() = scala.collection.mutable.Set.empty[String]
  }

  private def lockPathFor(storePath: String): Path = {
    val p = new Path(storePath)
    val parent = Option(p.getParent).getOrElse(
      throw new IllegalArgumentException(s"store path has no parent: $storePath"))
    new Path(parent, s".${p.getName}.lock")
  }

  private def tryCreate(fs: org.apache.hadoop.fs.FileSystem, lock: Path,
      token: String): Boolean = {
    fs.mkdirs(lock.getParent)
    if (fs.getScheme == "file") {
      val f = new java.io.File(lock.toUri.getPath)
      if (!f.createNewFile()) false
      else {
        java.nio.file.Files.write(f.toPath, token.getBytes("UTF-8"))
        true
      }
    } else {
      try {
        val out = fs.create(lock, false)
        try out.write(token.getBytes("UTF-8")) finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    }
  }

  private def readToken(fs: org.apache.hadoop.fs.FileSystem,
      lock: Path): Option[String] =
    try {
      val in = fs.open(lock)
      try Some(new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8"))
      finally in.close()
    } catch { case _: java.io.IOException => None }

  // per-FileSystem capability probes, each run at most once per JVM per
  // filesystem URI and cached: both cost one scratch-file round-trip in
  // the lock's parent dir, paid on the FIRST acquire/break attempt only
  private val mtimeRefreshableCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
  private val renamePreservesMtimeCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  private def probed(cache: java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean],
      fs: org.apache.hadoop.fs.FileSystem)(probe: => Boolean): Boolean = {
    val key = fs.getUri.toString
    val cached = cache.get(key)
    if (cached != null) return cached.booleanValue
    val ok = probe
    cache.putIfAbsent(key, java.lang.Boolean.valueOf(ok))
    ok
  }

  /** Does `setTimes` WORK on this filesystem — not merely not-throw, but
    * verifiably land? Object stores (s3a & co.) no-op or reject it; there
    * the heartbeat cannot prove liveness for ANY writer, so stale-breaking
    * must be disabled (see object scaladoc).
    */
  private[graft] def canRefreshMtime(fs: org.apache.hadoop.fs.FileSystem,
      near: Path): Boolean = probed(mtimeRefreshableCache, fs) {
    val probe = new Path(near.getParent,
      s".graft.mtime.probe.${java.util.UUID.randomUUID()}")
    try {
      val out = fs.create(probe, true); out.close()
      // second-aligned target: coarse-mtime filesystems still compare equal
      val want = (System.currentTimeMillis() - 120000L) / 1000L * 1000L
      fs.setTimes(probe, want, -1)
      fs.getFileStatus(probe).getModificationTime == want
    } catch { case scala.util.control.NonFatal(_) => false }
    finally scala.util.Try(fs.delete(probe, false))
  }

  /** Does rename carry the source's mtime to the destination? Where it
    * does NOT (the destination gets a fresh mtime), a tombstone's age says
    * nothing about the renamed lock's age and the stale re-check must rely
    * on the token compare alone.
    */
  private def renamePreservesMtime(fs: org.apache.hadoop.fs.FileSystem,
      near: Path): Boolean = probed(renamePreservesMtimeCache, fs) {
    val a = new Path(near.getParent,
      s".graft.rename.probe.${java.util.UUID.randomUUID()}")
    val b = new Path(s"${a.toString}.renamed")
    try {
      val out = fs.create(a, true); out.close()
      val want = (System.currentTimeMillis() - 120000L) / 1000L * 1000L
      fs.setTimes(a, want, -1)
      fs.rename(a, b) && fs.getFileStatus(b).getModificationTime == want
    } catch { case scala.util.control.NonFatal(_) => false }
    finally { scala.util.Try(fs.delete(a, false)); scala.util.Try(fs.delete(b, false)) }
  }

  private def breakStale(fs: org.apache.hadoop.fs.FileSystem, lock: Path,
      staleMs: Long): Unit = {
    // no working setTimes ⇒ no writer on this filesystem can heartbeat, so
    // age NEVER proves abandonment — never break, let the waiter fail loudly
    if (!canRefreshMtime(fs, lock)) return
    val st = try fs.getFileStatus(lock)
      catch { case _: java.io.FileNotFoundException => return }
    if (System.currentTimeMillis() - st.getModificationTime <= staleMs) return
    // the token we judged stale: the rename's cargo must still carry it,
    // or we renamed somebody else's FRESH replacement lock
    val staleToken = readToken(fs, lock).getOrElse(return)
    val tomb = new Path(lock.getParent,
      s"${lock.getName}.broken.${java.util.UUID.randomUUID()}")
    if (scala.util.Try(fs.rename(lock, tomb)).getOrElse(false)) {
      // re-check AFTER the atomic rename: another breaker may have broken
      // the stale lock and a new owner recreated it between our stat and
      // our rename — in that case we just grabbed a FRESH lock. Detect it
      // by TOKEN (rename-behavior-independent) and, where rename preserves
      // mtimes, by age (catches the same-token residual of a heartbeat
      // firing inside our stat→rename window). Restore a fresh lock
      // untouched (the owner's token is intact); if the restore loses a
      // further race, the displaced owner's commit-time verify reports the
      // interleaving loudly rather than letting it pass silently.
      val sameLock = readToken(fs, tomb).contains(staleToken)
      val freshByAge = renamePreservesMtime(fs, lock) && scala.util.Try(
        System.currentTimeMillis() -
          fs.getFileStatus(tomb).getModificationTime <= staleMs).getOrElse(false)
      if (sameLock && !freshByAge) fs.delete(tomb, false)
      else if (!scala.util.Try(fs.rename(tomb, lock)).getOrElse(false))
        fs.delete(tomb, false)
    }
  }

  /** Run `body` as the store's exclusive writer. Re-entrant per thread.
    * `waitMs`/`staleMs` default to 30 s / 30 min; the DEFAULTS can be
    * raised fleet-wide via the `graft.storeLock.waitMs` /
    * `graft.storeLock.staleMs` system properties (deployments whose
    * serialized append trains exceed the wait budget) — an explicitly
    * passed value always wins over the property.
    */
  def withLock[T](spark: SparkSession, storePath: String,
      waitMs: Long = -1L, staleMs: Long = -1L)(body: => T): T = {
    val lock = lockPathFor(storePath)
    val key = lock.toString
    if (held.get.contains(key)) return body // re-entrant: already ours
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val token = java.util.UUID.randomUUID().toString
    val effWait = if (waitMs >= 0) waitMs
      else sys.props.get("graft.storeLock.waitMs").map(_.toLong).getOrElse(30000L)
    val effStale = if (staleMs >= 0) staleMs
      else sys.props.get("graft.storeLock.staleMs").map(_.toLong)
        .getOrElse(30 * 60 * 1000L)
    val deadline = System.currentTimeMillis() + effWait
    var acquired = false
    while (!acquired) {
      if (tryCreate(fs, lock, token)) acquired = true
      else {
        breakStale(fs, lock, effStale)
        if (System.currentTimeMillis() > deadline) {
          val hint = if (canRefreshMtime(fs, lock))
            "delete the lock only if that writer is dead"
          else
            "this filesystem has no working setTimes, so crashed writers " +
              "are never auto-detected (stale-breaking disabled) — verify " +
              "the writer is dead, then delete the lock"
          throw new StoreLockTimeoutException(
            s"store $storePath locked by another writer ($lock held past " +
              s"${effWait}ms); $hint")
        }
        else Thread.sleep(20)
      }
    }
    held.get += key
    // HEARTBEAT: refresh the lock's mtime while the body runs, so a
    // critical section longer than the lease is never judged stale and
    // broken out from under a LIVE writer — staleness only ever fires on
    // a writer that actually died (its heartbeat stopped). Daemon thread;
    // touches only while the lock still carries our token. Where the
    // filesystem's setTimes doesn't land (object stores), the thread is
    // not started at all: breakStale is disabled on exactly those
    // filesystems, so the lock needs no freshening to stay safe.
    val beating = new java.util.concurrent.atomic.AtomicBoolean(true)
    val beat = if (!canRefreshMtime(fs, lock)) None else Some {
      val t = new Thread(() => {
        val interval = math.max(1000L, effStale / 3)
        while (beating.get) {
          try Thread.sleep(interval) catch { case _: InterruptedException => }
          if (beating.get && readToken(fs, lock).contains(token))
            scala.util.Try(fs.setTimes(lock, System.currentTimeMillis(), -1))
        }
      })
      t.setDaemon(true)
      t.setName(s"graft-store-lock-heartbeat-${lock.getName}")
      t.start()
      t
    }
    try {
      val out = body
      // commit-time ownership check: a stale-break thief between acquire
      // and here means our writes may have interleaved with its — report
      // loudly, never silently
      if (!readToken(fs, lock).contains(token))
        throw new StoreLockStolenException(
          s"store lock for $storePath changed owner while writing — " +
            "another writer interleaved; re-run this batch token")
      out
    } finally {
      beating.set(false)
      beat.foreach(_.interrupt())
      held.get -= key
      if (readToken(fs, lock).contains(token)) fs.delete(lock, false)
    }
  }
}
