package graft

import org.apache.spark.sql.functions._

/** Two-writer race gates for the persisted-store family: every store
  * mutator runs under [[StoreLock]], so concurrent appenders SERIALIZE (the
  * store ends exactly as some sequential order of the appends would leave
  * it) or fail LOUDLY — never silent interleaving, lost sidecar updates, or
  * double-counted ids. These specs drive real racing threads against real
  * stores; `local[32]` gives them genuine overlap.
  */
class StoreLockSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  // generous wait budget for the racing appenders: each runs a real Spark
  // write inside the lock, and a cold CI machine must not turn the last
  // waiter's queueing into a spurious StoreLockTimeoutException
  override def beforeAll(): Unit = {
    super.beforeAll()
    sys.props("graft.storeLock.waitMs") = "300000"
  }
  override def afterAll(): Unit = {
    sys.props.remove("graft.storeLock.waitMs")
    super.afterAll()
  }

  /** Run the thunks concurrently, return each one's failure (if any). */
  private def race(thunks: Seq[() => Unit]): Seq[Option[Throwable]] = {
    val results = new Array[Option[Throwable]](thunks.size)
    val start = new java.util.concurrent.CountDownLatch(1)
    val threads = thunks.zipWithIndex.map { case (t, i) =>
      val th = new Thread(() => {
        start.await()
        results(i) = try { t(); None } catch { case e: Throwable => Some(e) }
      })
      th.start(); th
    }
    start.countDown()
    threads.foreach(_.join(300000))
    results.toSeq
  }

  test("fingerprint store: four concurrent appenders serialize — union exact, no lock residue") {
    val store = tmpDir("race_fp")
    val d = Tables.documents(spark, dir)
    graft.operators.DedupOps.buildFingerprintStore(
      d.where(col("doc_id") < 100), "doc_id", "text", store)
    val slices = (0 until 4).map(i =>
      d.where(col("doc_id") >= 100 + i * 50 && col("doc_id") < 150 + i * 50))
    val errs = race(slices.zipWithIndex.map { case (s, i) => () =>
      graft.operators.DedupOps.appendFingerprintStore(
        s, "doc_id", "text", store, s"b$i")
    })
    assert(errs.forall(_.isEmpty), s"appends must serialize, got: $errs")
    // the store is the exact union: every id exactly once
    val back = spark.read.parquet(store).select(col("id"))
    assert(back.count() == 300 && back.distinct().count() == 300)
    assert(!new java.io.File(
      new java.io.File(store).getParent, s".${new java.io.File(store).getName}.lock").exists(),
      "released lock must not linger")
  }

  test("postings index: three concurrent appenders serialize — sidecars additive, probe == serial build") {
    val store = tmpDir("race_post") + "/idx"
    val d = Tables.documents(spark, dir).where(col("doc_id") < 300)
    graft.operators.SearchOps.buildPostingsIndex(
      d.where(col("doc_id") < 60), "doc_id", "text", store)
    val slices = (0 until 3).map(i =>
      d.where(col("doc_id") >= 60 + i * 80 && col("doc_id") < 140 + i * 80))
    val errs = race(slices.zipWithIndex.map { case (s, i) => () =>
      graft.operators.SearchOps.appendPostingsIndex(
        s, "doc_id", "text", store, s"b$i")
    })
    assert(errs.forall(_.isEmpty), s"appends must serialize, got: $errs")
    // the n_docs/n_tokens sidecars are additive and none was lost
    val counts = spark.read.parquet(s"$store/counts")
      .agg(sum(col("n_docs")), sum(col("n_tokens"))).head()
    assert(counts.getLong(0) == 300, s"lost sidecar update: ${counts.getLong(0)} docs")
    // probe equals a serially-built index over the same corpus
    val serial = tmpDir("race_post_serial") + "/idx"
    graft.operators.SearchOps.buildPostingsIndex(d, "doc_id", "text", serial)
    def probe(p: String) = graft.operators.SearchOps.keywordTopKIndexed(
        spark, p, Seq("ipsum", "lorem"), 20).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(probe(store) == probe(serial))
  }

  test("winnow store: concurrent cold-starts at DIFFERENT (k, w) — one wins, one refuses, never mixed") {
    val store = tmpDir("race_winnow") + "/store"
    val d = Tables.documents(spark, dir)
    val errs = race(Seq(
      () => graft.operators.DedupOps.appendWinnowStore(
        d.where(col("doc_id") < 50), "doc_id", "text", store, k = 4, w = 5, "a"),
      () => graft.operators.DedupOps.appendWinnowStore(
        d.where(col("doc_id") >= 50 && col("doc_id") < 100),
        "doc_id", "text", store, k = 5, w = 9, "b")))
    // pre-lock, BOTH passed the missing-meta check and the second writer's
    // meta overwrote the first's under incompatible fingerprints — now the
    // loser sees the winner's meta inside the lock and refuses loudly
    assert(errs.count(_.isEmpty) == 1 && errs.count(_.isDefined) == 1,
      s"exactly one cold-start may win, got: $errs")
    val loser = errs.flatten.head
    assert(loser.getMessage.contains("incompatible"), loser.getMessage)
    // the store is homogeneous: meta matches the single surviving batch
    val m = spark.read.parquet(s"$store/meta").head()
    val fpBatches = new java.io.File(s"$store/fps").listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName)
    assert(fpBatches.length == 1, s"mixed batches: ${fpBatches.mkString(",")}")
    assert((m.getAs[Int]("k"), fpBatches.head) == ((4, "batch=a"))
      || (m.getAs[Int]("k"), fpBatches.head) == ((5, "batch=b")))
  }

  test("hist store: two concurrent builders serialize — hist always matches its meta") {
    val root = tmpDir("race_hist_fs")
    val fstore = new graft.api.FeatureStore(root, spark)
    fstore.createNamespace("h")
    fstore.createFeature("h/v")
    val days = (0 until 59).map { i =>
      val d = java.time.LocalDate.of(2021, 1, 1).plusDays(i)
      (d.toString, (i + 1).toDouble: Any)
    }
    fstore.saveDf(seriesDf(days), name = Some("h/v"))
    val path = tmpDir("race_hist") + "/store"
    // two builders with DIFFERENT windows and binnings race the same path:
    // unlocked, one's hist could land beside the other's meta
    val errs = race(Seq(
      () => fstore.buildHistStore("h/v", "2021-01-01", "2021-01-31",
        lo = 0.0, hi = 32.0, bins = 8, path = path),
      () => fstore.buildHistStore("h/v", "2021-02-01", "2021-03-01",
        lo = 0.0, hi = 64.0, bins = 16, path = path)))
    assert(errs.forall(_.isEmpty), s"builders must serialize, got: $errs")
    // whichever builder won, the surviving hist must be exactly what a
    // serial build under the surviving meta's parameters produces
    val m = spark.read.parquet(s"$path/meta").head()
    val serial = tmpDir("race_hist_serial") + "/store"
    fstore.buildHistStore("h/v", m.getString(3), m.getString(4),
      m.getDouble(0), m.getDouble(1), m.getInt(2), serial)
    def hist(p: String) = spark.read.parquet(s"$p/hist").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hist(path) == hist(serial),
      "hist must match the meta beside it — no interleaved build")
  }

  test("lock: a held store refuses a second writer loudly after the wait budget") {
    val store = tmpDir("race_timeout") + "/store"
    val barrier = new java.util.concurrent.CountDownLatch(1)
    val inLock = new java.util.concurrent.CountDownLatch(1)
    val holder = new Thread(() =>
      StoreLock.withLock(spark, store) { inLock.countDown(); barrier.await() })
    holder.start()
    inLock.await()
    try {
      val e = intercept[StoreLockTimeoutException] {
        StoreLock.withLock(spark, store, waitMs = 300) { fail("must not enter") }
      }
      assert(e.getMessage.contains("locked by another writer"))
    } finally { barrier.countDown(); holder.join(60000) }
    // after release the store is writable again (and re-entrancy works:
    // a build that calls its own append takes the lock once)
    StoreLock.withLock(spark, store) {
      StoreLock.withLock(spark, store) { () } // re-entrant, no deadlock
    }
  }

  test("lock: heartbeat keeps a LIVE long writer's lock un-breakable past the lease") {
    val store = tmpDir("race_beat") + "/store"
    val release = new java.util.concurrent.CountDownLatch(1)
    val inLock = new java.util.concurrent.CountDownLatch(1)
    val stolen = new java.util.concurrent.atomic.AtomicBoolean(false)
    // 3s lease, ~1s heartbeat; the body holds for 7s — without the
    // heartbeat any waiter would judge the lock stale and break it
    val holder = new Thread(() =>
      try StoreLock.withLock(spark, store, staleMs = 3000) {
        inLock.countDown(); release.await()
      } catch { case _: StoreLockStolenException => stolen.set(true) })
    holder.start()
    inLock.await()
    Thread.sleep(7000)
    // a second writer with a short wait still times out: the heartbeat
    // kept the lock fresh, so breakStale never fires
    intercept[StoreLockTimeoutException] {
      StoreLock.withLock(spark, store, waitMs = 1500, staleMs = 3000) {
        fail("must not enter while the live writer holds the lock")
      }
    }
    release.countDown(); holder.join(60000)
    assert(!stolen.get, "the live writer's lock must never have been stolen")
    // and after the writer finishes, the store is free again
    StoreLock.withLock(spark, store) { () }
  }

  test("lock: no working setTimes (object store) — a live long writer is NEVER stale-broken") {
    spark.sparkContext.hadoopConfiguration.set(
      "fs.notimes.impl", classOf[NoSetTimesFileSystem].getName)
    val store = "notimes:" + tmpDir("race_notimes") + "/store"
    val release = new java.util.concurrent.CountDownLatch(1)
    val inLock = new java.util.concurrent.CountDownLatch(1)
    val holderErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    // 1.5s lease on a filesystem where heartbeats CANNOT land: before the
    // capability probe, the waiter judged the un-refreshable lock stale at
    // 1.5s, broke it, and the live holder died with StoreLockStolenException
    val holder = new Thread(() =>
      try StoreLock.withLock(spark, store, staleMs = 1500) {
        inLock.countDown(); release.await()
      } catch { case e: Throwable => holderErr.set(e); inLock.countDown() })
    holder.start()
    inLock.await()
    Thread.sleep(2500) // well past the lease — the lock LOOKS stale by age
    try {
      val e = intercept[StoreLockTimeoutException] {
        StoreLock.withLock(spark, store, waitMs = 1500, staleMs = 1500) {
          fail("must not enter: stale-breaking is disabled without setTimes")
        }
      }
      assert(e.getMessage.contains("no working setTimes"), e.getMessage)
    } finally { release.countDown(); holder.join(60000) }
    assert(holderErr.get == null,
      s"live writer must finish undisturbed, got: ${holderErr.get}")
    // released normally: the store is acquirable again on the same filesystem
    StoreLock.withLock(spark, store, staleMs = 1500) { () }
  }

  test("lock: rename-refreshes-mtime filesystem — a dead writer's lock is still breakable") {
    spark.sparkContext.hadoopConfiguration.set(
      "fs.touchy.impl", classOf[RenameTouchFileSystem].getName)
    val localDir = tmpDir("race_touchy")
    val store = "touchy:" + localDir + "/store"
    // a crashed writer's abandoned lock, mtime far in the past
    val lock = new java.io.File(localDir, ".store.lock")
    java.nio.file.Files.write(lock.toPath, "dead-writer".getBytes("UTF-8"))
    assert(lock.setLastModified(System.currentTimeMillis() - 3600 * 1000L))
    // before the token re-check, the breaker renamed the stale lock, the
    // rename refreshed the tombstone's mtime, the age re-check judged it
    // "fresh" and restored it — a dead writer's lock was unbreakable and
    // every waiter timed out forever
    var ran = false
    StoreLock.withLock(spark, store, waitMs = 30000, staleMs = 60000) { ran = true }
    assert(ran, "stale lock must be broken despite the mtime-refreshing rename")
    assert(!lock.exists(), "broken+released lock must be gone")
  }

  test("lock: a stale (crashed-writer) lock is broken with one winner") {
    val store = tmpDir("race_stale") + "/store"
    // a crashed writer's abandoned lock, mtime far in the past
    val lock = new java.io.File(
      new java.io.File(store).getParent, s".${new java.io.File(store).getName}.lock")
    java.nio.file.Files.write(lock.toPath, "dead-writer".getBytes("UTF-8"))
    assert(lock.setLastModified(System.currentTimeMillis() - 3600 * 1000L))
    var ran = false
    StoreLock.withLock(spark, store, staleMs = 60000) { ran = true }
    assert(ran, "stale lock must be broken and the writer admitted")
    assert(!lock.exists(), "broken+released lock must be gone")
  }

  test("lock: best-effort create(overwrite=false) (object-store PUT) — " +
      "double-acquire is DETECTED at commit, never silent") {
    spark.sparkContext.hadoopConfiguration.set(
      "fs.put.impl", classOf[BestEffortCreateFileSystem].getName)
    val store = "put:" + tmpDir("race_put") + "/store"
    val release = new java.util.concurrent.CountDownLatch(1)
    val inLock = new java.util.concurrent.CountDownLatch(1)
    val holderErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val holder = new Thread(() =>
      try StoreLock.withLock(spark, store) {
        inLock.countDown(); release.await()
      } catch { case e: Throwable => holderErr.set(e) })
    holder.start()
    inLock.await()
    // the second writer's "exclusive" create silently overwrites A's lock
    // on this filesystem — it is admitted despite A being live and inside
    // its critical section. This is the residual the StoreLock scaladoc
    // concedes for stores without an atomic conditional create.
    var bRan = false
    StoreLock.withLock(spark, store, waitMs = 1000) { bRan = true }
    assert(bRan, "best-effort create admits the second writer (by design " +
      "of the weak filesystem, not of the lock)")
    // the displaced first writer must FAIL LOUDLY at its commit-time
    // ownership verify — the interleaving is reported, never silent
    release.countDown(); holder.join(60000)
    assert(holderErr.get != null &&
      holderErr.get.isInstanceOf[StoreLockStolenException],
      s"displaced writer must raise StoreLockStolenException, got: " +
        s"${holderErr.get}")
  }
}
