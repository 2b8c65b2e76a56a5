package graft.catalog

/** Per-namespace execution/storage backend dispatch — the engine's analogue
  * of the reference's `available_backends` table
  * (/root/reference/src/qafs/model.py:104-110, where a namespace's
  * `backend` selector picks the processor serving it and an unavailable
  * selector raises). Here every backend executes on Spark — what a selector
  * picks is the STORAGE ENGINE a namespace's feature data lives in:
  *
  *  - `"spark"` (default): snappy parquet — the columnar default.
  *  - `"spark-orc"`: ORC — a genuinely distinct reader/writer stack inside
  *    Spark (own encodings, own predicate pushdown path); the selector of
  *    record for ORC-standardized lakes.
  *
  * The selector is validated LOUDLY at namespace creation and is IMMUTABLE
  * afterwards (`updateNamespace` patches description/meta only): data
  * written under one format must never be re-read as another. Every
  * [[graft.storage.TimeseriesStorage]] IO site resolves its format through
  * this table via the namespace, so hive partitioning, time-bound pruning,
  * and filter pushdown behave identically across backends — the spec
  * parity gate drives both.
  */
object Backends {

  /** backend selector → Spark datasource format. */
  val available: Map[String, String] = Map(
    "spark" -> "parquet",
    "spark-orc" -> "orc")

  /** Resolve a selector (empty/null = default "spark"); unknown selectors
    * fail loudly, mirroring the reference's RuntimeError. This is the
    * WRITE-PATH/creation gate: [[graft.catalog.JsonFileCatalog]] calls it
    * at `createNamespace`, so no namespace is ever CREATED with a foreign
    * selector.
    */
  def formatFor(backend: String): String = {
    val b = if (backend == null || backend.isEmpty) "spark" else backend
    available.getOrElse(b, throw new FeatureStoreException(
      s"backend '$b' is not available: this engine serves " +
        available.keys.toSeq.sorted.mkString("[", ", ", "]")))
  }

  /** Per-IO dispatch resolution — LENIENT, preserving the catalog's
    * lenient-read contract: a catalog document carrying a selector this
    * engine doesn't serve (e.g. the reference's `"pandas"`, whose data is
    * plain parquet on disk) must not make the namespace UNREADABLE, so a
    * foreign selector falls back to parquet with a one-time warning per
    * selector. Creation stays strict ([[formatFor]]); the "written under
    * one format is never re-read as another" invariant holds because a
    * foreign selector resolves to parquet on EVERY dispatch.
    */
  def dispatchFormatFor(backend: String): String = {
    val b = if (backend == null || backend.isEmpty) "spark" else backend
    available.getOrElse(b, {
      if (warned.add(b))
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"namespace backend '$b' is not served by this engine; " +
            "dispatching its storage as parquet (the reference engines' " +
            "on-disk format) — recreate the namespace to silence this")
      "parquet"
    })
  }

  private val warned =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
}
