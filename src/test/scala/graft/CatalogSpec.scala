package graft

import graft.catalog._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Catalog CRUD semantics (SURVEY §2 C1/C2/C5; reference
  * tests/test_feature_store.py:131-227).
  */
class CatalogSpec extends AnyFunSuite {

  def freshCatalog(): Catalog =
    new JsonFileCatalog(Files.createTempDirectory("cat").toString)

  test("namespace create/list/get + duplicate rejected") {
    val c = freshCatalog()
    c.createNamespace(NamespaceDef("test", "desc", Map("k" -> "v")))
    assert(c.getNamespace("test").exists(_.description == "desc"))
    assert(c.listNamespaces().map(_.name) == Seq("test"))
    intercept[FeatureStoreException](c.createNamespace(NamespaceDef("test")))
  }

  test("namespace meta merge, null-delete, version bump") {
    val c = freshCatalog()
    c.createNamespace(NamespaceDef("ns", meta = Map("key1" -> "a")))
    c.updateNamespace("ns", metaPatch = Map("key2" -> Some("b")))
    assert(c.getNamespace("ns").get.meta == Map("key1" -> "a", "key2" -> "b"))
    c.updateNamespace("ns", metaPatch = Map("key2" -> None))
    val ns = c.getNamespace("ns").get
    assert(ns.meta == Map("key1" -> "a"))
    assert(ns.version == 3) // two updates bumped 1 -> 3
  }

  test("nested meta values round-trip as JSON text with typed accessors") {
    val dir = Files.createTempDirectory("cat").toString
    val c = new JsonFileCatalog(dir)
    // the reference's meta holds nested dicts (model.py:62-72); here a
    // nested structure is one ENCODED value, merged/deleted like any other
    val nested = Meta.encode(Map(
      "owner" -> Map("team" -> "ml-infra", "priority" -> 3),
      "tags" -> Seq("prod", "pii"),
      "sampled" -> true))
    c.createNamespace(NamespaceDef("ns"))
    c.createFeature(FeatureDef("ns", "f", meta = Map("info" -> nested, "plain" -> "x")))
    c.updateFeature("ns", "f", metaPatch = Map("extra" -> Some(Meta.encode(Map("a" -> 1)))))
    c.updateFeature("ns", "f", metaPatch = Map("plain" -> None)) // null-delete
    // read through a FRESH instance: survives the catalog JSON round-trip
    val f = new JsonFileCatalog(dir).getFeature("ns", "f").get
    assert(f.meta.keySet == Set("info", "extra"))
    assert(Meta.string(f.meta, "info", "owner", "team").contains("ml-infra"))
    assert(Meta.long(f.meta, "info", "owner", "priority").contains(3L))
    assert(Meta.bool(f.meta, "info", "sampled").contains(true))
    assert(Meta.at(f.meta, "info", "tags").exists(n => n.isArray && n.size == 2))
    assert(Meta.long(f.meta, "extra", "a").contains(1L))
    // absent paths and non-JSON plain values are None, not errors
    assert(Meta.at(f.meta, "info", "owner", "missing").isEmpty)
    assert(Meta.json(Map("p" -> "plain text"), "p").isEmpty)
  }

  test("concurrent writers over one root lose no updates (lock file)") {
    val dir = Files.createTempDirectory("cat").toString
    new JsonFileCatalog(dir).createNamespace(NamespaceDef("ns"))
    // two SEPARATE instances (distinct monitors — JVM synchronized alone
    // cannot serialize them) interleave read-modify-write meta patches;
    // without the exclusive-create lock some patches vanish
    val writers = (0 until 2).map(_ => new JsonFileCatalog(dir))
    val threads = writers.zipWithIndex.map { case (c, w) =>
      new Thread(() =>
        (0 until 15).foreach(i =>
          c.updateNamespace("ns", metaPatch = Map(s"w${w}_k$i" -> Some("v")))))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val meta = new JsonFileCatalog(dir).getNamespace("ns").get.meta
    assert(meta.size == 30, s"lost updates: ${30 - meta.size} of 30 patches missing")
    // a stale lock (crashed writer) is broken, not waited on forever
    val lockDir = new org.apache.hadoop.fs.Path(s"$dir/_catalog")
    val lock = new org.apache.hadoop.fs.Path(lockDir, ".catalog.lock")
    val hfs = lock.getFileSystem(new org.apache.hadoop.conf.Configuration())
    hfs.create(lock, false).close()
    hfs.setTimes(lock, System.currentTimeMillis() - 3600 * 1000, -1)
    new JsonFileCatalog(dir).updateNamespace("ns", metaPatch = Map("after" -> Some("ok")))
    assert(new JsonFileCatalog(dir).getNamespace("ns").get.meta.contains("after"))
    // a FRESH lock makes a competing writer fail loudly after the wait
    hfs.create(lock, false).close()
    val ex = intercept[FeatureStoreException] {
      new JsonFileCatalog(dir, lockWaitMs = 200)
        .updateNamespace("ns", metaPatch = Map("blocked" -> Some("x")))
    }
    assert(ex.getMessage.contains("locked by another writer"))
    hfs.delete(lock, false)
  }

  test("stale break is single-winner: a racing breaker cannot remove a fresh replacement lock") {
    val dir = Files.createTempDirectory("cat").toString
    val a = new JsonFileCatalog(dir)
    val b = new JsonFileCatalog(dir)
    val lock = new org.apache.hadoop.fs.Path(s"$dir/_catalog/.catalog.lock")
    val hfs = lock.getFileSystem(new org.apache.hadoop.conf.Configuration())
    // plant an aged lock — the crashed-writer state both A and B observe
    hfs.mkdirs(lock.getParent)
    hfs.create(lock, false).close()
    hfs.setTimes(lock, System.currentTimeMillis() - 3600 * 1000, -1)
    // A breaks the stale lock and immediately re-acquires with its token —
    // this is exactly the judge interleaving: B still "knows" the lock is
    // stale from its earlier observation
    a.breakStaleLock()
    assert(a.tryCreateLock("tokenA"))
    // under the old observe-then-delete protocol B now deletes A's FRESH
    // lock and also acquires; the re-stat + single-winner rename must refuse
    b.breakStaleLock()
    assert(a.readLockToken().contains("tokenA"), "breaker removed a fresh competitor lock")
    assert(!b.tryCreateLock("tokenB"), "two writers both hold the lock")
    hfs.delete(lock, false)
  }

  test("commit-time ownership check refuses a stolen lock") {
    val dir = Files.createTempDirectory("cat").toString
    val a = new JsonFileCatalog(dir)
    assert(a.tryCreateLock("tokenA"))
    a.verifyHeld("tokenA") // holder passes
    // simulate theft: a stale-break racer replaced the lock with its own
    val lock = new org.apache.hadoop.fs.Path(s"$dir/_catalog/.catalog.lock")
    val hfs = lock.getFileSystem(new org.apache.hadoop.conf.Configuration())
    hfs.delete(lock, false)
    assert(a.tryCreateLock("tokenThief"))
    intercept[LockStolenException](a.verifyHeld("tokenA"))
    hfs.delete(lock, false)
  }

  test("document cache serves repeat reads and still sees foreign-process writes") {
    val dir = Files.createTempDirectory("cat").toString
    val c1 = new JsonFileCatalog(dir)
    val c2 = new JsonFileCatalog(dir) // separate instance = separate cache
    c1.createNamespace(NamespaceDef("ns"))
    c1.createFeature(FeatureDef("ns", "f"))
    assert(c1.getFeature("ns", "f").isDefined) // warm c1's cache
    c2.createFeature(FeatureDef("ns", "g"))    // foreign write
    // c1 must observe it: the (mtime, length) fingerprint changed
    assert(c1.getFeature("ns", "g").isDefined)
    // and c1's own mutation keeps its cache coherent
    c1.updateFeature("ns", "g", description = Some("d2"))
    assert(c1.getFeature("ns", "g").get.description == "d2")
    assert(c2.getFeature("ns", "g").get.description == "d2")
  }

  test("unknown backend selector is rejected at create; known ones dispatch; lenient load") {
    val dir = Files.createTempDirectory("cat").toString
    val c = new JsonFileCatalog(dir)
    val e = intercept[FeatureStoreException](
      c.createNamespace(NamespaceDef("p", backend = "pandas")))
    assert(e.getMessage.contains("not available"))
    c.createNamespace(NamespaceDef("s", backend = "spark"))
    c.createNamespace(NamespaceDef("o", backend = "spark-orc"))
    assert(Backends.formatFor("spark") == "parquet" &&
      Backends.formatFor("spark-orc") == "orc" && Backends.formatFor("") == "parquet")
    // a foreign document carrying another selector still loads (strict
    // write, lenient read) — written into a FRESH root: overwriting a
    // Hadoop-written file out-of-band would orphan its .crc sidecar
    val dir2 = Files.createTempDirectory("cat").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$dir2/_catalog"))
    Files.writeString(java.nio.file.Paths.get(s"$dir2/_catalog/catalog.json"),
      s"""{"formatVersion":${Catalog.FormatVersion},"namespaces":[{"name":"ext",
         |"description":"","meta":{},"version":1,"backend":"pandas"}],
         |"features":[],"groups":[]}""".stripMargin)
    assert(new JsonFileCatalog(dir2).getNamespace("ext").exists(_.backend == "pandas"))
  }

  test("delete namespace refuses when non-empty") {
    val c = freshCatalog()
    c.createNamespace(NamespaceDef("ns"))
    c.createFeature(FeatureDef("ns", "f1"))
    intercept[FeatureStoreException](c.deleteNamespace("ns"))
    c.deleteFeature("ns", "f1")
    c.deleteNamespace("ns")
    assert(c.listNamespaces().isEmpty)
  }

  test("feature CRUD + regex list + upsert-on-create bumps version") {
    val c = freshCatalog()
    c.createNamespace(NamespaceDef("ns"))
    c.createFeature(FeatureDef("ns", "alpha"))
    c.createFeature(FeatureDef("ns", "beta"))
    assert(c.listFeatures(Some("ns")).map(_.name) == Seq("alpha", "beta"))
    assert(c.listFeatures(Some("ns"), Some("^al")).map(_.name) == Seq("alpha"))
    c.createFeature(FeatureDef("ns", "alpha", description = "v2"))
    val f = c.getFeature("ns", "alpha").get
    assert(f.description == "v2" && f.version == 2)
  }

  test("serialized flag immutable; feature needs existing namespace") {
    val c = freshCatalog()
    c.createNamespace(NamespaceDef("ns"))
    c.createFeature(FeatureDef("ns", "f", serialized = true))
    intercept[FeatureStoreException](c.createFeature(FeatureDef("ns", "f", serialized = false)))
    intercept[MissingFeatureException](c.createFeature(FeatureDef("nope", "f")))
  }

  test("name validation + ns/name splitting sugar") {
    assert(Catalog.validateName("a.b#c_d-e9") == "a.b#c_d-e9")
    intercept[IllegalArgumentException](Catalog.validateName("bad name"))
    intercept[IllegalArgumentException](Catalog.validateName(""))
    assert(Catalog.splitName("ns/f") == ("ns", "f"))
    assert(Catalog.splitName("f", Some("d")) == ("d", "f"))
    intercept[IllegalArgumentException](Catalog.splitName("f"))
  }

  test("C5 forward-compat: docs written before feature groups load cleanly") {
    val root = Files.createTempDirectory("cat").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$root/_catalog"))
    Files.writeString(java.nio.file.Paths.get(s"$root/_catalog/catalog.json"),
      """{"formatVersion":1,"namespaces":[{"name":"old","description":"","meta":{},
         |"version":1,"backend":"spark"}],"features":[]}""".stripMargin)
    val c = new JsonFileCatalog(root)
    assert(c.getNamespace("old").isDefined)
    assert(c.listGroups().isEmpty) // absent field normalized, no NPE
    c.createGroup(GroupDef("old", "g", Seq("a")))
    assert(c.getGroup("old", "g").exists(_.columns == Seq("a")))
  }

  test("C5 migration: v1 doc upgrades in place to the current format") {
    val root = Files.createTempDirectory("cat").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$root/_catalog"))
    // v1 document whose namespace predates the backend selector
    Files.writeString(java.nio.file.Paths.get(s"$root/_catalog/catalog.json"),
      """{"formatVersion":1,"namespaces":[{"name":"legacy","description":"",
         |"meta":{},"version":1,"backend":""}],
         |"features":[{"namespace":"legacy","name":"f","description":"",
         |"partition":"date","serialized":false,"meta":{},"version":3}]}""".stripMargin)
    val c = new JsonFileCatalog(root)
    // definitions survive, backend backfilled
    assert(c.getNamespace("legacy").exists(_.backend == "spark"))
    assert(c.getFeature("legacy", "f").exists(_.version == 3))
    // migration was persisted: the raw document is now current-format
    val raw = Files.readString(java.nio.file.Paths.get(s"$root/_catalog/catalog.json"))
    assert(raw.contains(s""""formatVersion" : ${Catalog.FormatVersion}"""))
    // a second instance loads without re-migrating
    assert(new JsonFileCatalog(root).getNamespace("legacy").isDefined)
  }

  test("pinFeatureDtype is idempotent and does not bump the version") {
    val c = freshCatalog()
    c.createNamespace(NamespaceDef("p"))
    c.createFeature(FeatureDef("p", "f"))
    c.pinFeatureDtype("p", "f", "double")
    c.pinFeatureDtype("p", "f", "double")
    val f = c.getFeature("p", "f").get
    assert(f.meta(Catalog.ValueDtypeKey) == "double" && f.version == 1)
    intercept[MissingFeatureException](c.pinFeatureDtype("p", "ghost", "double"))
  }

  test("catalog rejects docs from a newer engine version") {
    val root = Files.createTempDirectory("cat").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$root/_catalog"))
    Files.writeString(java.nio.file.Paths.get(s"$root/_catalog/catalog.json"),
      """{"formatVersion":99,"namespaces":[],"features":[]}""")
    intercept[IllegalArgumentException](new JsonFileCatalog(root).listNamespaces())
  }

  test("catalog persists across instances (JSON round-trip incl. transform/check)") {
    val root = Files.createTempDirectory("cat").toString
    val c1 = new JsonFileCatalog(root)
    c1.createNamespace(NamespaceDef("ns"))
    c1.createFeature(FeatureDef("ns", "f",
      transform = Some(TransformSpec("sql", "a + b", Seq("ns/a", "ns/b"))),
      check = Some(CheckSpec(Some("bigint"), Seq("value > 0")))))
    val c2 = new JsonFileCatalog(root)
    val f = c2.getFeature("ns", "f").get
    assert(f.transform.get.args == Seq("ns/a", "ns/b"))
    assert(f.check.get.predicates == Seq("value > 0"))
  }

  test("store registry: upsert bumps version, family immutable, regex list, unregister") {
    val c = freshCatalog()
    c.registerStore(StoreDef("fp_main", "fingerprint", "/tmp/x/fp"))
    c.registerStore(StoreDef("pq_docs", "pq", "/tmp/x/pq",
      params = Map("m" -> "8", "ksub" -> "16")))
    assert(c.listStores().map(_.name) == Seq("fp_main", "pq_docs"))
    assert(c.listStores(Some("^pq")).map(_.name) == Seq("pq_docs"))
    // upsert: fresh path + merged params, version bump
    c.registerStore(StoreDef("pq_docs", "pq", "/tmp/x/pq2", params = Map("m" -> "8")))
    val pq = c.getStore("pq_docs").get
    assert(pq.version == 2 && pq.path == "/tmp/x/pq2" &&
      pq.params == Map("m" -> "8", "ksub" -> "16"))
    // family is identity
    val e = intercept[FeatureStoreException] {
      c.registerStore(StoreDef("pq_docs", "postings", "/tmp/x/pq2"))
    }
    assert(e.getMessage.contains("cannot change family"))
    c.unregisterStore("fp_main")
    assert(c.getStore("fp_main").isEmpty)
    intercept[MissingFeatureException](c.unregisterStore("fp_main"))
    // a v2 doc (pre-registry) loads with an empty registry
    assert(freshCatalog().listStores().isEmpty)
  }

}
