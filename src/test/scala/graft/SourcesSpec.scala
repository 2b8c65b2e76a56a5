package graft

import graft.sources.Sources
import org.apache.spark.sql.functions._

class SourcesSpec extends SparkTestBase {

  test("csv round-trip preserves a feature frame") {
    val df = seriesDf(Seq("2021-01-01" -> 1.5, "2021-01-02" -> 2.5))
    val path = tmpDir("csv") + "/out"
    Sources.writeCsv(df, path)
    val back = Sources.readCsv(spark, path)
      .withColumn("time", col("time").cast("timestamp"))
      .withColumn("value", col("value").cast("double"))
    assert(collectMap(back) == collectMap(df))
  }

  test("json-lines round-trip preserves a feature frame") {
    val df = seriesDf(Seq("2021-01-01" -> 1.5, "2021-01-02" -> 2.5))
    val path = tmpDir("json") + "/out"
    Sources.writeJsonLines(df, path)
    val back = Sources.readJsonLines(spark, path)
      .withColumn("time", col("time").cast("timestamp"))
    assert(collectMap(back) == collectMap(df))
  }

  test("bucketed tables join with no shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      Sources.writeBucketed(Tables.lineitem(spark, dir), "li_b", Seq("l_orderkey"), 8)
      Sources.writeBucketed(Tables.orders(spark, dir), "ord_b", Seq("o_orderkey"), 8)
      val joined = spark.table("li_b").join(spark.table("ord_b"),
        col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() > 0)
      // same key aggregation: also exchange-free
      val agg = spark.table("li_b").groupBy("l_orderkey").count()
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }

  test("layout_bucketed_join fixture joins bucket-to-bucket with no exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val (fact, dim) = Fixtures.bucketedTables(spark, "/root/testdata/sf0.001")
      val joined = spark.table(fact).join(spark.table(dim), "user_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed fixture join must not shuffle:\n$plan")
      assert(joined.count() == spark.table(fact).count(),
        "inner join on a complete dim must preserve the fact row count")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("explicit csv schema skips inference and pins types") {
    import org.apache.spark.sql.types._
    val df = seriesDf(Seq("2021-01-01" -> 7.0))
    val path = tmpDir("csv2") + "/out"
    Sources.writeCsv(df, path)
    val schema = StructType(Seq(StructField("time", TimestampType),
      StructField("value", DoubleType)))
    val back = Sources.readCsv(spark, path, Some(schema))
    assert(back.schema == schema)
    assert(collectMap(back) == collectMap(df))
  }
}
