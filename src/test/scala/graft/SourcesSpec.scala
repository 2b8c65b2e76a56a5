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
