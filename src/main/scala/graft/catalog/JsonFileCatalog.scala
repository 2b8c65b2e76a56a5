package graft.catalog

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import java.nio.charset.StandardCharsets

/** Thrown (internally) when the commit-time ownership check finds another
  * writer's token in the lock file: our lock was judged stale and broken
  * while we held it. The mutation retries on a fresh snapshot.
  */
private[graft] class LockStolenException extends RuntimeException("catalog lock stolen")

/** Durable catalog: one JSON document at `{root}/_catalog/catalog.json`,
  * written atomically (tmp + rename). Catalog traffic is low-QPS driver-side
  * metadata — a single small file is the right scale tradeoff even at 100 TB
  * of *data*, because the catalog holds feature definitions, not rows.
  * (Reference keeps this in SQLAlchemy/sqlite: src/qafs/model.py.)
  */
class JsonFileCatalog(root: String, hadoopConf: Configuration = new Configuration(),
    lockWaitMs: Long = 10000, lockStaleMs: Long = 60000)
    extends Catalog {

  private val mapper = new ObjectMapper()
    .registerModule(DefaultScalaModule)
    .configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)

  private val catalogPath = new Path(s"$root/_catalog/catalog.json")
  private def fs: FileSystem = catalogPath.getFileSystem(hadoopConf)

  /** (mtime, length) fingerprint of the file backing the last parse, plus the
    * parsed document. A `loadFeatures` of N features (plus transform-DAG
    * recursion) issues N+ catalog reads per query; without this cache each
    * one re-read and re-parsed the whole JSON document — the dominant share
    * of the per-query driver floor on small reads. The reference amortizes
    * the same traffic through a session-scoped SQLAlchemy connection
    * (src/qafs/connection.py:13-24).
    */
  @volatile private var docCache: (Long, Long, CatalogDoc) = _

  /** Read the document; repeat reads are served from [[docCache]] after ONE
    * cheap `getFileStatus` probe validating (mtime, length) — a foreign
    * process's write changes both. `fresh = true` (the locked mutate path)
    * bypasses the fingerprint check entirely: local-fs mtimes have
    * millisecond granularity, and a read-modify-write under the lock must
    * never bet correctness on it.
    */
  private def load(fresh: Boolean = false): CatalogDoc = this.synchronized {
    val st = try fs.getFileStatus(catalogPath)
      catch { case _: java.io.FileNotFoundException => null }
    if (st == null) CatalogDoc()
    else {
      val c = docCache
      if (!fresh && c != null && c._1 == st.getModificationTime && c._2 == st.getLen) c._3
      else {
        val in = fs.open(catalogPath)
        val doc = try {
          val bytes = org.apache.commons.io.IOUtils.toByteArray(in)
          mapper.readValue(new String(bytes, StandardCharsets.UTF_8), classOf[CatalogDoc])
            .normalized
        } finally in.close()
        require(doc.formatVersion <= Catalog.FormatVersion,
          s"catalog written by newer engine (v${doc.formatVersion})")
        if (doc.formatVersion < Catalog.FormatVersion) {
          // C5: in-place upgrade, persisted so the migration runs once
          // (reference upgrade.py:12-43 stamps the new version the same way)
          val up = CatalogMigrations.upgrade(doc)
          save(up)
          up
        } else {
          docCache = (st.getModificationTime, st.getLen, doc)
          doc
        }
      }
    }
  }

  /** Atomic replace: write tmp, then overwrite-rename in ONE filesystem op
    * (a delete-then-rename pair would leave no catalog at all if the
    * process dies between the two). `synchronized` serializes writers in
    * this JVM only — concurrent FeatureStore *processes* on one root are a
    * documented single-writer assumption, like the reference's sqlite.
    */
  private def save(doc: CatalogDoc): Unit = this.synchronized {
    val tmp = new Path(catalogPath.getParent, s".catalog.json.tmp${System.nanoTime()}")
    val out = fs.create(tmp, true)
    try out.write(mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(doc))
    finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(catalogPath.toUri, hadoopConf)
    fc.rename(tmp, catalogPath, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    // refresh the cache from what was just committed so same-JVM readers
    // never reparse (and never depend on sub-ms mtime resolution)
    docCache = try {
      val st = fs.getFileStatus(catalogPath)
      (st.getModificationTime, st.getLen, doc)
    } catch { case _: java.io.IOException => null }
  }

  private val lockPath = new Path(s"$root/_catalog/.catalog.lock")

  /** Atomically create the lock file containing `token`; false if it exists.
    * Hadoop's `create(overwrite = false)` on LocalFileSystem is
    * exists-check-then-create (NOT atomic), so `file://` roots go through
    * `java.io.File.createNewFile` (O_CREAT|O_EXCL — atomic); other
    * filesystems use `create(overwrite = false)` (atomic server-side on
    * HDFS; best-effort on object stores, backstopped by the commit-time
    * token verify in [[mutate]]).
    */
  private[graft] def tryCreateLock(token: String): Boolean = {
    fs.mkdirs(lockPath.getParent)
    if (fs.getScheme == "file") {
      val f = new java.io.File(lockPath.toUri.getPath)
      if (!f.createNewFile()) false
      else {
        java.nio.file.Files.write(f.toPath, token.getBytes(StandardCharsets.UTF_8))
        true
      }
    } else {
      try {
        val out = fs.create(lockPath, false)
        try out.write(token.getBytes(StandardCharsets.UTF_8)) finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    }
  }

  private[graft] def readLockToken(): Option[String] =
    try {
      val in = fs.open(lockPath)
      try Some(new String(org.apache.commons.io.IOUtils.toByteArray(in), StandardCharsets.UTF_8))
      finally in.close()
    } catch { case _: java.io.IOException => None }

  /** Break an abandoned (crashed-writer) lock with exactly ONE winner:
    * staleness is re-checked immediately before an atomic rename to a
    * unique per-breaker tombstone — of N racing breakers one rename
    * succeeds and the losers' sources are gone, so a winner can never
    * remove another breaker's FRESH replacement lock the way the old
    * observe-then-delete protocol could (two breakers both judging the
    * original stale → A deletes+recreates → B deletes A's fresh lock).
    * The residual stat→rename window (a live lock created in between is
    * renamed away) is caught by the commit-time token verify.
    */
  private[graft] def breakStaleLock(): Unit = {
    val st = try fs.getFileStatus(lockPath)
      catch { case _: java.io.FileNotFoundException => return }
    if (System.currentTimeMillis() - st.getModificationTime <= lockStaleMs) return
    val tomb = new Path(lockPath.getParent,
      s".catalog.lock.broken.${java.util.UUID.randomUUID()}")
    if (scala.util.Try(fs.rename(lockPath, tomb)).getOrElse(false))
      fs.delete(tomb, false)
  }

  /** Cross-writer mutual exclusion via an exclusive-create lock file holding
    * a unique owner token. A second writer (another JVM, or another catalog
    * instance over the same root — `synchronized` covers neither) WAITS up
    * to `lockWaitMs`, then fails LOUDLY instead of silently losing the
    * first writer's definitions in a read-modify-write race. A lock older
    * than `lockStaleMs` is presumed abandoned and broken (single-winner,
    * see [[breakStaleLock]]). Release deletes the lock only while it still
    * carries OUR token — blind delete would remove a thief's
    * now-legitimate lock. Reads never lock — they see the last
    * atomically-renamed document. Exclusion assumes lockStaleMs far
    * exceeds the critical-section time (the standard lease caveat).
    */
  private def withLock[T](f: String => T): T = {
    val token = java.util.UUID.randomUUID().toString
    val deadline = System.currentTimeMillis() + lockWaitMs
    var acquired = false
    while (!acquired) {
      if (tryCreateLock(token)) acquired = true
      else {
        breakStaleLock()
        if (System.currentTimeMillis() > deadline)
          throw new FeatureStoreException(
            s"catalog locked by another writer (lock file $lockPath older than " +
              s"${lockWaitMs}ms wait); delete it only if that writer is dead")
        else Thread.sleep(20)
      }
    }
    try f(token)
    finally if (readLockToken().contains(token)) fs.delete(lockPath, false)
  }

  /** Throws [[LockStolenException]] unless the lock still carries `token`. */
  private[graft] def verifyHeld(token: String): Unit =
    if (!readLockToken().contains(token)) throw new LockStolenException

  /** Locked read-modify-write with a commit-time ownership check: if our
    * lock was stolen between acquire and commit (stale-break racer), the
    * save is refused and the whole mutation re-runs on a fresh snapshot —
    * at most one writer's commit follows any given load.
    */
  private def mutate(f: CatalogDoc => CatalogDoc): Unit = this.synchronized {
    var done = false
    var attempts = 0
    while (!done) {
      attempts += 1
      try {
        withLock { token =>
          val cur = load(fresh = true)
          val next = f(cur)
          if (next ne cur) { // reference-equal result = declared no-op, skip the rewrite
            verifyHeld(token)
            save(next)
          }
        }
        done = true
      } catch {
        case _: LockStolenException if attempts < 5 => // retry on a fresh snapshot
      }
    }
  }

  // ---- namespaces ----

  override def listNamespaces(regex: Option[String]): Seq[NamespaceDef] = {
    val all = load().namespaces
    regex.fold(all)(r => all.filter(n => r.r.findFirstIn(n.name).isDefined))
      .sortBy(_.name)
  }

  override def getNamespace(name: String): Option[NamespaceDef] =
    load().namespaces.find(_.name == name)

  override def createNamespace(ns: NamespaceDef): Unit = mutate { doc =>
    Catalog.validateName(ns.name)
    // the reference dispatches per-namespace execution backends
    // (src/qafs/model.py:104-110); this engine dispatches the STORAGE
    // backend per namespace through [[Backends.available]] — unknown
    // selectors are rejected LOUDLY at create time instead of storing a
    // promise that would never be honored. Foreign documents carrying
    // other values still LOAD (lenient read, strict write). The selector
    // is immutable after creation (updateNamespace patches description/
    // meta only): data written under one format is never re-read as
    // another.
    Backends.formatFor(ns.backend)
    if (doc.namespaces.exists(_.name == ns.name))
      throw new FeatureStoreException(s"namespace exists: ${ns.name}")
    doc.copy(namespaces = doc.namespaces :+ ns)
  }

  override def updateNamespace(name: String, description: Option[String],
      metaPatch: Map[String, Option[String]]): Unit = mutate { doc =>
    val ns = doc.namespaces.find(_.name == name)
      .getOrElse(throw new MissingFeatureException(s"no namespace: $name"))
    val updated = ns.copy(
      description = description.getOrElse(ns.description),
      meta = Catalog.mergeMeta(ns.meta, metaPatch),
      version = ns.version + 1) // version bump, reference src/qafs/model.py:51-55
    doc.copy(namespaces = doc.namespaces.map(n => if (n.name == name) updated else n))
  }

  /** Refuses to delete a non-empty namespace (reference src/qafs/core.py:152-153). */
  override def deleteNamespace(name: String): Unit = mutate { doc =>
    if (doc.features.exists(_.namespace == name))
      throw new FeatureStoreException(s"namespace not empty: $name")
    if (!doc.namespaces.exists(_.name == name))
      throw new MissingFeatureException(s"no namespace: $name")
    doc.copy(namespaces = doc.namespaces.filterNot(_.name == name))
  }

  // ---- features ----

  override def listFeatures(namespace: Option[String], regex: Option[String]): Seq[FeatureDef] = {
    var all = load().features
    namespace.foreach(ns => all = all.filter(_.namespace == ns))
    regex.foreach(r => all = all.filter(f => r.r.findFirstIn(f.name).isDefined))
    all.sortBy(f => (f.namespace, f.name))
  }

  override def getFeature(namespace: String, name: String): Option[FeatureDef] =
    load().features.find(f => f.namespace == namespace && f.name == name)

  /** Create; upserts into update when the feature already exists
    * (reference src/qafs/core.py:289-298).
    */
  override def createFeature(f: FeatureDef): Unit = mutate { doc =>
    Catalog.validateName(f.name); Catalog.validateName(f.namespace)
    if (!doc.namespaces.exists(_.name == f.namespace))
      throw new MissingFeatureException(s"no namespace: ${f.namespace}")
    doc.features.find(e => e.namespace == f.namespace && e.name == f.name) match {
      case None => doc.copy(features = doc.features :+ f)
      case Some(existing) =>
        // serialized flag is immutable once set (reference src/qafs/model.py:138-142)
        if (existing.serialized != f.serialized)
          throw new FeatureStoreException(s"cannot change serialized flag of ${f.qualified}")
        val updated = existing.copy(
          description = if (f.description.nonEmpty) f.description else existing.description,
          transform = f.transform.orElse(existing.transform),
          check = f.check.orElse(existing.check),
          meta = existing.meta ++ f.meta,
          version = existing.version + 1)
        doc.copy(features = doc.features.map(e =>
          if (e.namespace == f.namespace && e.name == f.name) updated else e))
    }
  }

  override def updateFeature(namespace: String, name: String, description: Option[String],
      metaPatch: Map[String, Option[String]],
      transform: Option[TransformSpec], check: Option[CheckSpec]): Unit = mutate { doc =>
    val f = doc.features.find(e => e.namespace == namespace && e.name == name)
      .getOrElse(throw new MissingFeatureException(s"no feature: $namespace/$name"))
    val updated = f.copy(
      description = description.getOrElse(f.description),
      meta = Catalog.mergeMeta(f.meta, metaPatch),
      transform = transform.orElse(f.transform),
      check = check.orElse(f.check),
      version = f.version + 1)
    doc.copy(features = doc.features.map(e =>
      if (e.namespace == namespace && e.name == name) updated else e))
  }

  override def deleteFeature(namespace: String, name: String): Unit = mutate { doc =>
    if (!doc.features.exists(e => e.namespace == namespace && e.name == name))
      throw new MissingFeatureException(s"no feature: $namespace/$name")
    doc.copy(features = doc.features.filterNot(e => e.namespace == namespace && e.name == name))
  }

  override def pinFeatureDtype(namespace: String, name: String, dtype: String): Unit =
    pinFeatureMeta(namespace, name, Catalog.ValueDtypeKey, dtype)

  override def pinFeatureMeta(namespace: String, name: String, key: String,
      value: String): Unit = mutate { doc =>
    val f = doc.features.find(e => e.namespace == namespace && e.name == name)
      .getOrElse(throw new MissingFeatureException(s"no feature: $namespace/$name"))
    if (f.meta.get(key).contains(value)) doc // idempotent: no version bump, no rewrite
    else doc.copy(features = doc.features.map(e =>
      if (e.namespace == namespace && e.name == name)
        e.copy(meta = e.meta + (key -> value))
      else e))
  }

  // ---- feature groups ----

  override def listGroups(namespace: Option[String]): Seq[GroupDef] = {
    val all = load().groups
    namespace.fold(all)(ns => all.filter(_.namespace == ns)).sortBy(g => (g.namespace, g.name))
  }

  override def getGroup(namespace: String, name: String): Option[GroupDef] =
    load().groups.find(g => g.namespace == namespace && g.name == name)

  override def createGroup(g: GroupDef): Unit = mutate { doc =>
    Catalog.validateName(g.name); Catalog.validateName(g.namespace)
    g.columns.foreach(Catalog.validateName)
    require(g.columns.nonEmpty, "a feature group needs at least one column")
    if (!doc.namespaces.exists(_.name == g.namespace))
      throw new MissingFeatureException(s"no namespace: ${g.namespace}")
    if (doc.groups.exists(e => e.namespace == g.namespace && e.name == g.name))
      throw new FeatureStoreException(s"group exists: ${g.qualified}")
    doc.copy(groups = doc.groups :+ g)
  }

  override def deleteGroup(namespace: String, name: String): Unit = mutate { doc =>
    if (!doc.groups.exists(e => e.namespace == namespace && e.name == name))
      throw new MissingFeatureException(s"no group: $namespace/$name")
    doc.copy(groups = doc.groups.filterNot(e => e.namespace == namespace && e.name == name))
  }

  override def listStores(regex: Option[String]): Seq[StoreDef] = {
    val all = load().stores
    regex.fold(all)(rx => all.filter(s => rx.r.findFirstIn(s.name).isDefined))
      .sortBy(_.name)
  }

  override def getStore(name: String): Option[StoreDef] =
    load().stores.find(_.name == name)

  override def registerStore(st: StoreDef): Unit = mutate { doc =>
    Catalog.validateName(st.name)
    require(st.family.nonEmpty, "store family must be non-empty")
    require(st.path.nonEmpty, "store path must be non-empty")
    doc.stores.find(_.name == st.name) match {
      case None => doc.copy(stores = doc.stores :+ st)
      case Some(existing) =>
        // upsert: a rebuild/compact-and-swap re-registers with the fresh
        // path/params; family is identity and stays immutable (a "pq"
        // name silently becoming "postings" would misdirect every reader)
        if (existing.family != st.family)
          throw new FeatureStoreException(
            s"cannot change family of store ${st.name}: " +
              s"${existing.family} -> ${st.family}; unregister first")
        val updated = existing.copy(
          path = st.path,
          params = existing.params ++ st.params,
          description = if (st.description.nonEmpty) st.description else existing.description,
          meta = existing.meta ++ st.meta,
          version = existing.version + 1)
        doc.copy(stores = doc.stores.map(e => if (e.name == st.name) updated else e))
    }
  }

  override def unregisterStore(name: String): Unit = mutate { doc =>
    if (!doc.stores.exists(_.name == name))
      throw new MissingFeatureException(s"no store: $name")
    doc.copy(stores = doc.stores.filterNot(_.name == name))
  }
}
