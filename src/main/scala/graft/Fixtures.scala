package graft

import graft.api.FeatureStore
import graft.catalog.NamespaceDef
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import scala.collection.concurrent.TrieMap

/** Ingests the driver test tables into a real feature store once per
  * (JVM, sfDir), so every `SparkEntry.queries` entry exercises the actual
  * write path (S1/P3/P4/M1) before the read path under test.
  *
  * The `events` table becomes one feature per `event_type`, *tripled* into
  * three versions per timestamp so the read path's latest-version dedup (A1)
  * and time-travel (F2) semantics are observable:
  *   version v ∈ {0,1,2}: value = value * (v+1), created_time = time - v minutes.
  * Latest (max created_time) is v=0 → plain `value`; time-travel "-30s"
  * excludes v=0 → picks v=1 → `value*2`; "-90s" → v=2 → `value*3`.
  * (Reference versioning fixture shape: tests/test_feature_store.py:451-492.)
  */
object Fixtures {
  private val stores = TrieMap[String, FeatureStore]()
  val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  def store(spark: SparkSession, sfDir: String): FeatureStore =
    stores.getOrElseUpdate(sfDir, build(spark, sfDir))

  private def build(spark: SparkSession, sfDir: String): FeatureStore = {
    val root = s"/tmp/graft_fixtures/${sfDir.replaceAll("[^a-zA-Z0-9.]", "_")}"
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(rootPath)) fs.delete(rootPath, true)

    val store = new FeatureStore(root, spark)
    store.catalog.createNamespace(NamespaceDef("events", "driver events table"))

    val tripled = Tables.events(spark, sfDir)
      .select(col("ts").as("time"), col("event_type"), col("value"))
      .crossJoin(spark.range(3).select(col("id").as("v")))
      .select(
        col("time"), col("event_type"),
        (col("value") * (col("v") + 1)).as("value"),
        expr("time - make_interval(0, 0, 0, 0, 0, v, 0)").as("created_time"))

    EventTypes.foreach { et =>
      store.createFeature(s"events/$et", s"events.value where event_type=$et")
      store.saveDf(
        tripled.where(col("event_type") === et).drop("event_type", "v"),
        name = Some(s"events/$et"))
    }
    // transforms over the click series (T1/T2 DAG)
    store.registerSqlTransform("events/click_sq", Seq("click"), "click * click")
    store.registerSqlTransform("events/click_comb", Seq("click", "click_sq"), "click + click_sq")
    store
  }
}
