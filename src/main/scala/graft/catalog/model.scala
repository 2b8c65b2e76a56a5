package graft.catalog

/** Catalog data model.
  *
  * Mirrors the reference's SQLAlchemy model (reference: src/qafs/model.py:87-132)
  * as plain case classes serialized to a JSON file: a namespace is a named
  * container of features; a feature is a named single-valued timeseries with
  * optional quality check and optional stored transform (virtual feature).
  */

/** Partition scheme for a feature's parquet layout.
  * Reference: src/qafs/model.py:33 (enum "date" | "year"),
  * derivation src/qafs/backend/pandas.py:62-70.
  */
sealed abstract class PartitionScheme(val name: String)
object PartitionScheme {
  case object Date extends PartitionScheme("date") // yyyy-MM-dd string
  case object Year extends PartitionScheme("year") // int year
  def from(s: String): PartitionScheme = s match {
    case "date" => Date
    case "year" => Year
    case other  => throw new IllegalArgumentException(s"unknown partition scheme: $other")
  }
}

/** A stored transform definition (virtual feature).
  *
  * The reference stores cloudpickled Python closures (src/qafs/model.py:144-162);
  * pickled closures don't survive across JVMs, so the durable format here is
  * SQL expression text (`format = "sql"`, `body` = an expression over columns
  * named after `args`), with `format = "registry"` for arbitrary Scala
  * `DataFrame => DataFrame` logic re-registered at startup by name.
  */
case class TransformSpec(
    format: String,      // "sql" | "registry"
    body: String,        // sql expression text, or registry key
    args: Seq[String])   // input features, fully qualified "ns/name"

/** Declarative quality check evaluated on write.
  * Reference: pandera Column checks serialized to YAML (src/qafs/core.py:280-281).
  * `dtype` is a Spark DDL type name (e.g. "bigint", "double"); `predicates`
  * are SQL boolean expressions over the column `value`.
  */
case class CheckSpec(
    dtype: Option[String] = None,
    predicates: Seq[String] = Nil)

case class NamespaceDef(
    name: String,
    description: String = "",
    meta: Map[String, String] = Map.empty,
    version: Int = 1,
    backend: String = "spark")

case class FeatureDef(
    namespace: String,
    name: String,
    description: String = "",
    partition: String = "date", // PartitionScheme name
    serialized: Boolean = false,
    transform: Option[TransformSpec] = None,
    check: Option[CheckSpec] = None,
    meta: Map[String, String] = Map.empty,
    version: Int = 1) {
  def qualified: String = s"$namespace/$name"
  def partitionScheme: PartitionScheme = PartitionScheme.from(partition)
}

/** Multi-column feature group (extension beyond the reference's strict
  * one-value-column features, SURVEY §7 phase 7): N named signals sharing
  * one time axis stored as ONE partitioned parquet table — a single scan
  * serves any column subset via parquet column pruning instead of an N-way
  * join of per-feature directories.
  */
case class GroupDef(
    namespace: String,
    name: String,
    columns: Seq[String],
    description: String = "",
    partition: String = "date",
    meta: Map[String, String] = Map.empty,
    version: Int = 1) {
  def qualified: String = s"$namespace/$name"
  def partitionScheme: PartitionScheme = PartitionScheme.from(partition)
}

/** Registered persisted store/index artifact — catalog rows for the
  * engine's ~12 batch-dir store families (fingerprint / minhash / simhash /
  * winnow / window / line-census / cluster / embedding / SQ8 / PQ / IVF /
  * IVF+PQ / postings), which are otherwise addressed only by ad-hoc path
  * convention. A row gives a deployment what features get from the
  * catalog: DISCOVERY (list what exists), PARAMS PINNING (the
  * dimension/band/k parameters an appender must match — the
  * `appendIvfIndex` dimension check generalized, enforced via
  * [[graft.api.FeatureStore.verifyStoreParams]]), and a stable name to
  * hang staleness metadata on (live committed tokens are read from the
  * store's [[graft.StoreCommit]] manifest at listing time, generalizing
  * the bloom `batches.txt` pattern). Every existing path-based operator
  * API keeps working — registration is additive.
  */
case class StoreDef(
    name: String,
    family: String,
    path: String,
    params: Map[String, String] = Map.empty,
    description: String = "",
    meta: Map[String, String] = Map.empty,
    version: Int = 1)

/** Typed accessors over the string-valued `meta` maps: the reference's meta
  * is free-form JSON with NESTED values (src/qafs/model.py:62-72 — its
  * tests store dicts), while this catalog keeps `Map[String, String]` on
  * the wire. Nested structures round-trip as JSON TEXT values — write with
  * [[Meta.encode]], read typed with [[Meta.at]]/[[Meta.string]]/etc. Plain
  * string values need no encoding and are read with `meta.get` as before;
  * the merge/null-delete patch semantics ([[Catalog.mergeMeta]]) are
  * value-agnostic and apply unchanged.
  */
object Meta {
  import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
  import com.fasterxml.jackson.module.scala.DefaultScalaModule
  private val mapper = new ObjectMapper().registerModule(DefaultScalaModule)

  /** Encode a nested value (Map/Seq/number/string/bool, arbitrarily deep)
    * as a JSON text meta value.
    */
  def encode(v: Any): String = mapper.writeValueAsString(v)

  /** Parse a meta value as JSON; None when absent or not valid JSON
    * (plain unencoded strings are by design not JSON documents).
    */
  def json(meta: Map[String, String], key: String): Option[JsonNode] =
    meta.get(key).flatMap(s => scala.util.Try(mapper.readTree(s)).toOption)

  /** Navigate `path` field names into a nested JSON meta value. */
  def at(meta: Map[String, String], key: String, path: String*): Option[JsonNode] =
    json(meta, key).flatMap(root =>
      path.foldLeft(Option(root))((n, p) => n.flatMap(x => Option(x.get(p)))))

  def string(meta: Map[String, String], key: String, path: String*): Option[String] =
    at(meta, key, path: _*).filter(_.isTextual).map(_.asText)
  def long(meta: Map[String, String], key: String, path: String*): Option[Long] =
    at(meta, key, path: _*).filter(_.canConvertToLong).map(_.asLong)
  def double(meta: Map[String, String], key: String, path: String*): Option[Double] =
    at(meta, key, path: _*).filter(_.isNumber).map(_.asDouble)
  def bool(meta: Map[String, String], key: String, path: String*): Option[Boolean] =
    at(meta, key, path: _*).filter(_.isBoolean).map(_.asBoolean)
}

/** Whole catalog document persisted as one JSON file.
  * `formatVersion` mirrors the reference's FeatureStoreVersion migration table
  * (src/qafs/model.py:79-84, upgrade.py:12-43).
  */
case class CatalogDoc(
    formatVersion: Int = Catalog.FormatVersion,
    namespaces: Seq[NamespaceDef] = Nil,
    features: Seq[FeatureDef] = Nil,
    groups: Seq[GroupDef] = Nil,
    stores: Seq[StoreDef] = Nil) {
  /** Jackson leaves absent collections null when reading docs written by
    * older versions; normalize so the rest of the code never sees null.
    */
  def normalized: CatalogDoc = copy(
    namespaces = Option(namespaces).getOrElse(Nil),
    features = Option(features).getOrElse(Nil),
    groups = Option(groups).getOrElse(Nil),
    stores = Option(stores).getOrElse(Nil))
}

/** In-place catalog format migrations (C5) — the JSON-document analog of the
  * reference's alembic upgrade (src/qafs/upgrade.py:12-43: detect stored
  * version < code version, apply schema deltas, stamp the new version).
  * Each step upgrades FROM version n TO n+1; [[JsonFileCatalog]] applies
  * pending steps on load and persists the upgraded document.
  */
object CatalogMigrations {
  val steps: Map[Int, CatalogDoc => CatalogDoc] = Map(
    // v1 -> v2: namespaces gain the `backend` selector (mirrors the
    // reference's own add_column("namespace", "backend") migration);
    // older docs may carry null/empty after JSON decode
    1 -> { doc =>
      doc.copy(
        formatVersion = 2,
        namespaces = doc.namespaces.map { ns =>
          if (ns.backend == null || ns.backend.isEmpty) ns.copy(backend = "spark") else ns
        })
    },
    // v2 -> v3: the store/index registry arrives; older docs simply have
    // no rows (Jackson decodes the absent field to null — normalized)
    2 -> { doc => doc.copy(formatVersion = 3,
      stores = Option(doc.stores).getOrElse(Nil)) }
  )

  def upgrade(doc: CatalogDoc): CatalogDoc = {
    var d = doc
    while (d.formatVersion < Catalog.FormatVersion)
      d = steps.getOrElse(d.formatVersion, throw new FeatureStoreException(
        s"no migration from catalog format v${d.formatVersion}"))(d)
    d
  }
}

/** Catalog operations (CRUD over namespaces + features).
  * Mirrors reference src/qafs/core.py:71-383 semantics; see SURVEY.md §2 C1-C5.
  */
trait Catalog {
  // namespaces (C1)
  def listNamespaces(regex: Option[String] = None): Seq[NamespaceDef]
  def getNamespace(name: String): Option[NamespaceDef]
  def createNamespace(ns: NamespaceDef): Unit
  def updateNamespace(name: String, description: Option[String] = None,
      metaPatch: Map[String, Option[String]] = Map.empty): Unit
  def deleteNamespace(name: String): Unit

  // features (C2)
  def listFeatures(namespace: Option[String] = None, regex: Option[String] = None): Seq[FeatureDef]
  def getFeature(namespace: String, name: String): Option[FeatureDef]
  def createFeature(f: FeatureDef): Unit
  def updateFeature(namespace: String, name: String, description: Option[String] = None,
      metaPatch: Map[String, Option[String]] = Map.empty,
      transform: Option[TransformSpec] = None, check: Option[CheckSpec] = None): Unit
  def deleteFeature(namespace: String, name: String): Unit

  /** Pin the stored value dtype (under [[Catalog.ValueDtypeKey]] in meta)
    * at first write — idempotent, NO version bump: this is storage
    * bookkeeping, not a user-visible definition change. Lets the save path
    * drift-check against the catalog instead of re-reading parquet footers
    * on every append (a driver-side file listing per write).
    */
  def pinFeatureDtype(namespace: String, name: String, dtype: String): Unit

  /** Generic storage-bookkeeping meta pin: set `key -> value` in feature
    * meta, idempotent, NO version bump (same contract as
    * [[pinFeatureDtype]], which is the `ValueDtypeKey` instance of this).
    */
  def pinFeatureMeta(namespace: String, name: String, key: String, value: String): Unit

  // feature groups (extension)
  def listGroups(namespace: Option[String] = None): Seq[GroupDef]
  def getGroup(namespace: String, name: String): Option[GroupDef]
  def createGroup(g: GroupDef): Unit
  def deleteGroup(namespace: String, name: String): Unit

  // persisted store/index registry (extension; see [[StoreDef]])
  def listStores(regex: Option[String] = None): Seq[StoreDef]
  def getStore(name: String): Option[StoreDef]
  /** Upsert by name: a re-registration replaces the row and bumps its
    * version (path/params refresh after a rebuild or a compact-and-swap).
    */
  def registerStore(st: StoreDef): Unit
  def unregisterStore(name: String): Unit
}


object Catalog {
  val FormatVersion = 3

  /** Meta key holding a feature's pinned value dtype (catalogString). */
  val ValueDtypeKey = "value_dtype"

  /** Valid feature/namespace name. Reference: src/qafs/model.py:32. */
  private val NamePattern = "^[a-zA-Z0-9.#_-]+$".r
  def validateName(s: String): String = {
    require(s.nonEmpty && NamePattern.matches(s), s"invalid name: '$s'")
    s
  }

  /** Split "ns/name" sugar; reference tests' `_split_name`
    * (reference tests/test_feature_store.py:104-128).
    */
  def splitName(qualified: String, defaultNs: Option[String] = None): (String, String) =
    qualified.split("/", 2) match {
      case Array(ns, n) => (ns, n)
      case Array(n) =>
        (defaultNs.getOrElse(throw new IllegalArgumentException(
          s"feature '$n' has no namespace and no default given")), n)
    }

  /** Merge-update semantics for meta: new keys overwrite, `None` deletes.
    * Reference: src/qafs/model.py:62-72.
    */
  def mergeMeta(old: Map[String, String], patch: Map[String, Option[String]]): Map[String, String] =
    patch.foldLeft(old) {
      case (m, (k, Some(v))) => m.updated(k, v)
      case (m, (k, None))    => m - k
    }
}

class FeatureStoreException(msg: String) extends RuntimeException(msg)
class MissingFeatureException(msg: String) extends FeatureStoreException(msg)
class CheckFailedException(msg: String) extends FeatureStoreException(msg)
