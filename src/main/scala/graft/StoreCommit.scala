package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Committed-read manifest for the batch-dir store family (fingerprint /
  * minhash / simhash / winnow / window / line-census / cluster-label /
  * embedding stores, AND — since round 11 — the PQ/SQ8/IVF/IVF+PQ code
  * indexes and the postings index, whose codebook/meta sidecars are
  * written once at build and whose per-batch dirs commit through this
  * manifest like every other store): every append writes its `batch=<token>` dir(s) FIRST and then
  * registers the token with one marker-file create under
  * `<storeRoot>/_commits/<token>` — readers list the marker dir and open
  * only committed batch dirs. This closes the probe-during-append window:
  * a store writer's parquet job materializes task files one rename at a
  * time at commit, so a lock-free concurrent probe could previously read a
  * PARTIAL batch (some files moved, some not) — silently under-counting
  * duplicates. With the manifest, a batch is invisible until its marker
  * exists, and the marker is a single atomic file create (HDFS create,
  * object-store PUT).
  *
  * Multi-family stores (winnow: `fps/batch=<t>` + `sizes/batch=<t>`)
  * commit ONE marker per token at the store root after every family's dir
  * is written, so probes see the token's dirs across families all-or-
  * nothing.
  *
  * Legacy stores (no `_commits` dir) read with the full directory view
  * unchanged — the manifest is an opt-in layer that every builder/appender
  * in this engine now writes.
  *
  * Residual window, documented: the same-token REPLAY contract (a
  * crash-retried micro-batch overwrites its own batch dir) rewrites a dir
  * whose marker may already exist; a probe racing that rewrite can see the
  * partial rewrite. Mutators shrink the window by dropping the token's
  * marker before rewriting ([[uncommit]]); the window is replay-only and
  * never affects the common append path.
  */
object StoreCommit {

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def commitsDir(storeRoot: String) = new Path(s"$storeRoot/_commits")

  /** Every batch token currently LISTED anywhere in the store: `batch=`
    * dirs directly under the root plus those one level down in family
    * sub-dirs (winnow's `fps/`/`sizes/`) — the set a legacy (manifest-less)
    * reader considers visible.
    */
  private def allListedTokens(hfs: org.apache.hadoop.fs.FileSystem,
      storeRoot: String): Set[String] = {
    val root = new Path(storeRoot)
    if (!hfs.exists(root)) return Set.empty
    val entries = hfs.listStatus(root)
    val direct = entries.map(_.getPath.getName).filter(_.startsWith("batch="))
    val nested = entries.filter(e => e.isDirectory &&
        !e.getPath.getName.startsWith("batch=") &&
        !e.getPath.getName.startsWith("_") &&
        !e.getPath.getName.startsWith("."))
      .flatMap(e => hfs.listStatus(e.getPath).map(_.getPath.getName)
        .filter(_.startsWith("batch=")))
    (direct ++ nested).map(_.stripPrefix("batch=")).toSet
  }

  /** Register `batchToken` as committed — call AFTER its batch dir(s) are
    * fully written. Atomic: one marker-file create.
    *
    * FIRST commit on a store that predates the manifest (batch dirs exist,
    * `_commits` does not) ENROLLS every listed token before the manifest
    * becomes visible: under the legacy view those batches were already
    * readable, and a manifest listing only the new token would silently
    * disown them — the exact under-count this layer exists to prevent.
    * The bootstrap is atomic via build-aside + rename (a racing probe sees
    * either no manifest = full legacy view, or the complete enrolled set).
    * A rename RACE cannot be detected from the rename's return value:
    * Hadoop rename(tmp, dst) onto an EXISTING directory moves tmp INSIDE
    * dst (posix-mv semantics on HDFS; RawLocalFileSystem's FileUtil.copy
    * fallback does the same) and returns true — so the loser's enrolled
    * tokens would land nested under `_commits/_commits.tmp-<uuid>/`,
    * invisible to [[committedTokens]], silently disowning its fully-
    * written batch. So the outcome is verified by EFFECT instead: after
    * any rename attempt, our own marker must exist directly under
    * `_commits/`; when it doesn't, fall back to the idempotent per-marker
    * creates into the winner's dir and sweep any nested `_commits.tmp-*`
    * junk dir the mis-rename left behind. Only reachable when two writers
    * race the first-ever commit (StoreLock normally serializes mutators,
    * but the weak-PUT backends its scaladoc concedes admit the overlap).
    */
  def commit(spark: SparkSession, storeRoot: String, batchToken: String): Unit = {
    invalidate(storeRoot)
    val dir = commitsDir(storeRoot)
    val hfs = fs(spark, dir)
    def mark(d: Path, token: String): Unit = {
      val out = hfs.create(new Path(d, token), true)
      try out.write(token.getBytes("UTF-8")) finally out.close()
    }
    if (!hfs.exists(dir)) {
      val enroll = allListedTokens(hfs, storeRoot) + batchToken
      val tmp = new Path(s"$storeRoot/_commits.tmp-${java.util.UUID.randomUUID()}")
      hfs.mkdirs(tmp)
      enroll.foreach(mark(tmp, _))
      scala.util.Try(hfs.rename(tmp, dir))
      // verify by effect, not return value (see scaladoc): our marker must
      // sit DIRECTLY under _commits/ — a lost race nests tmp inside the
      // winner's dir with rename still returning true
      if (!hfs.exists(new Path(dir, batchToken))) {
        scala.util.Try(hfs.delete(tmp, true))
        enroll.foreach(mark(dir, _))
      }
      // sweep mis-rename junk: a nested _commits.tmp-* dir is not a real
      // token and would pollute committedTokens forever
      if (hfs.exists(dir))
        hfs.listStatus(dir).filter(_.getPath.getName.startsWith("_commits.tmp-"))
          .foreach(s => scala.util.Try(hfs.delete(s.getPath, true)))
    } else mark(dir, batchToken)
  }

  /** Drop `batchToken`'s marker — the replay hook: a crash-retry that is
    * about to delete/rewrite its own batch dir first makes it invisible,
    * so racing probes see the pre-replay store instead of a half-rewrite.
    */
  def uncommit(spark: SparkSession, storeRoot: String, batchToken: String): Unit = {
    invalidate(storeRoot)
    val m = new Path(commitsDir(storeRoot), batchToken)
    val hfs = fs(spark, m)
    if (hfs.exists(m)) { hfs.delete(m, false); () }
  }

  /** The committed token set, or None for a legacy store with no manifest
    * (full directory view applies).
    */
  def committedTokens(spark: SparkSession, storeRoot: String): Option[Set[String]] = {
    val dir = commitsDir(storeRoot)
    val hfs = fs(spark, dir)
    if (!hfs.exists(dir)) None
    else Some(hfs.listStatus(dir).map(_.getPath.getName).toSet)
  }

  /** Listed `batch=` dirs under `familyRoot` as (token, dir modification
    * time) — the mtime rides along from the same `listStatus` call at zero
    * extra I/O and keys the committed-read plan cache below: a same-token
    * REWRITE (replay) changes the dir's mtime even though the token set is
    * unchanged, so a cached plan (which pins concrete file names) can
    * never serve a rewritten batch's stale file list.
    */
  private def listedStatuses(spark: SparkSession,
      familyRoot: String): Seq[(String, Long)] = {
    val p = new Path(familyRoot)
    val hfs = fs(spark, p)
    if (!hfs.exists(p)) Seq.empty
    else hfs.listStatus(p)
      .filter(_.getPath.getName.startsWith("batch="))
      .map(s => (s.getPath.getName.stripPrefix("batch="),
        s.getModificationTime))
      .sortBy(_._1).toSeq
  }

  private def listedTokens(spark: SparkSession, familyRoot: String): Seq[String] =
    listedStatuses(spark, familyRoot).map(_._1)

  /** Batch tokens VISIBLE to readers of `storeRoot(/sub)`: the listed
    * `batch=` dirs intersected with the committed set (all listed dirs for
    * a legacy store). Sorted — the staleness contracts (bloom sketch
    * coverage) compare these lists verbatim.
    */
  def visibleTokens(spark: SparkSession, storeRoot: String,
      sub: Option[String] = None): Seq[String] = {
    val familyRoot = sub.fold(storeRoot)(s => s"$storeRoot/$s")
    val listed = listedTokens(spark, familyRoot)
    committedTokens(spark, storeRoot).fold(listed)(c => listed.filter(c))
  }

  /** Committed-read plan cache: the analyzed multi-dir DataFrame per
    * (session, familyRoot), VALIDATED on every read against the live
    * listing — reused only while the visible (token, dir-mtime) set is
    * byte-identical to the one the plan was built from. This removes the
    * per-probe driver cost the manifest layer added (a fresh
    * InMemoryFileIndex build + one parquet-footer schema read per
    * [[read]]) without caching any DATA: execution still scans the
    * parquet files each action, and ANY store mutation — append (new
    * token), replay rewrite (same token, new dir mtime), compaction
    * (token set and mtimes both change) — misses the cache by key. The
    * two `listStatus` calls the validation needs were already paid by the
    * uncached path. [[commit]]/[[uncommit]] also invalidate eagerly
    * (belt-and-braces for in-JVM mutators; cross-JVM mutators are caught
    * by the key comparison). Bounded: one entry per store family actually
    * probed in the session.
    */
  private val readCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      (Seq[(String, Long)], DataFrame)]()

  private[graft] def invalidate(storeRoot: String): Unit = {
    val it = readCache.keySet().iterator()
    while (it.hasNext) { if (it.next()._2.startsWith(storeRoot)) it.remove() }
  }

  /** Committed-only read of the batch-dir family at `storeRoot(/sub)`.
    * `basePath` keeps the `batch` partition column alive, so readers that
    * filter a replayed micro-batch's own dir (`col("batch") =!= t`) are
    * unchanged. Legacy stores (no manifest) read the plain directory view.
    * Throws when a manifest exists but no listed dir is committed — a
    * store in that state is mid-construction or corrupt, and reading it
    * as empty would silently report "no duplicates".
    */
  def read(spark: SparkSession, storeRoot: String,
      sub: Option[String] = None): DataFrame = {
    val familyRoot = sub.fold(storeRoot)(s => s"$storeRoot/$s")
    committedTokens(spark, storeRoot) match {
      case None => spark.read.parquet(familyRoot)
      case Some(committed) =>
        val visible = listedStatuses(spark, familyRoot)
          .filter(s => committed(s._1))
        require(visible.nonEmpty,
          s"no committed batches under $familyRoot — the store is " +
            "mid-construction (writer crashed before its first commit " +
            "marker) or its _commits dir was damaged")
        val key = (spark, familyRoot)
        val hit = readCache.get(key)
        if (hit != null && hit._1 == visible) hit._2
        else {
          val df = spark.read.option("basePath", familyRoot)
            .parquet(visible.map(t => s"$familyRoot/batch=${t._1}"): _*)
          readCache.put(key, (visible, df))
          df
        }
    }
  }
}
