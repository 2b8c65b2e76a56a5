package graft.catalog

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import java.nio.charset.StandardCharsets

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

  private def load(): CatalogDoc = this.synchronized {
    if (!fs.exists(catalogPath)) CatalogDoc()
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
      } else doc
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
  }

  /** Cross-writer mutual exclusion via an exclusive-create lock file:
    * `fs.create(path, overwrite = false)` is the one atomic
    * test-and-acquire primitive every Hadoop filesystem offers. A second
    * writer (another JVM, or another catalog instance over the same root —
    * `synchronized` covers neither) WAITS up to `lockWaitMs`, then fails
    * LOUDLY instead of silently losing the first writer's definitions in a
    * read-modify-write race. A lock older than `lockStaleMs` is presumed
    * abandoned (crashed writer) and broken. Reads never lock — they see
    * the last atomically-renamed document.
    */
  private def withLock[T](f: => T): T = {
    val lock = new Path(catalogPath.getParent, ".catalog.lock")
    val deadline = System.currentTimeMillis() + lockWaitMs
    var acquired = false
    while (!acquired) {
      try {
        fs.mkdirs(catalogPath.getParent)
        fs.create(lock, false).close()
        acquired = true
      } catch {
        case _: java.io.IOException =>
          val stale = scala.util.Try(fs.getFileStatus(lock)).toOption
            .exists(s => System.currentTimeMillis() - s.getModificationTime > lockStaleMs)
          if (stale) fs.delete(lock, false)
          else if (System.currentTimeMillis() > deadline)
            throw new FeatureStoreException(
              s"catalog locked by another writer (lock file $lock older than " +
                s"${lockWaitMs}ms wait); delete it only if that writer is dead")
          else Thread.sleep(20)
      }
    }
    try f finally fs.delete(lock, false)
  }

  private def mutate(f: CatalogDoc => CatalogDoc): Unit = this.synchronized {
    withLock { save(f(load())) }
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
      value: String): Unit =
    this.synchronized { withLock {
      val doc = load()
      val f = doc.features.find(e => e.namespace == namespace && e.name == name)
        .getOrElse(throw new MissingFeatureException(s"no feature: $namespace/$name"))
      if (!f.meta.get(key).contains(value))
        save(doc.copy(features = doc.features.map(e =>
          if (e.namespace == namespace && e.name == name)
            e.copy(meta = e.meta + (key -> value))
          else e)))
    } }

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
}
