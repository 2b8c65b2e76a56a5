package graft

import graft.storage.TimeseriesStorage
import graft.ts.Align
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import java.sql.Timestamp

/** Property-based invariants (SURVEY §5 test plan): save→load round-trip
  * identity modulo dedup, ffill idempotence and completeness — randomized
  * via ScalaCheck generators over fixed seeds (deterministic CI).
  */
class PropertySpec extends SparkTestBase {

  private val seriesGen: Gen[List[(Int, Option[Double], Int)]] =
    Gen.listOfN(40, for {
      dayOffset <- Gen.choose(0, 60)
      value <- Gen.option(Gen.choose(-1000.0, 1000.0))
      version <- Gen.choose(0, 2)
    } yield (dayOffset, value, version))

  private def samples(n: Int): Seq[List[(Int, Option[Double], Int)]] =
    (1 to n).flatMap(i => seriesGen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def dayTs(d: Int): Timestamp =
    Timestamp.valueOf(java.time.LocalDate.of(2021, 1, 1).plusDays(d).atStartOfDay())

  private def toDf(rows: List[(Int, Option[Double], Int)]) = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("time", TimestampType),
      StructField("value", DoubleType), StructField("created_time", TimestampType)))
    val data = rows.map { case (d, v, ver) =>
      org.apache.spark.sql.Row(dayTs(d), v.orNull,
        Timestamp.valueOf(java.time.LocalDateTime.of(2021, 3, 1, ver, 0)))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data, 3), schema)
  }

  test("property: save→load returns exactly the max-created version per time") {
    samples(5).filter(_.nonEmpty).foreach { rows =>
      val st = new TimeseriesStorage(tmpDir("prop"), spark)
      st.save("p", "f", toDf(rows))
      val got = st.load("p", "f").collect()
        .map(r => r.getAs[Timestamp]("time") -> r.getAs[Any]("value")).toMap
      val byDay = rows.groupBy(_._1)
      assert(got.keySet == byDay.keySet.map(dayTs))
      // where the winning version is unique per time, the value must match it
      byDay.foreach { case (d, vs) =>
        val maxVer = vs.map(_._3).max
        val winners = vs.filter(_._3 == maxVer)
        if (winners.size == 1)
          assert(got(dayTs(d)) == winners.head._2.map(x => x: Any).orNull, s"day $d")
      }
    }
  }

  test("property: ffill is idempotent") {
    samples(4).filter(_.nonEmpty).foreach { rows =>
      val df = toDf(rows).select("time", "value").dropDuplicates("time")
      val once = Align.ffill(df, "time", Seq("value"), buckets = 4)
      val twice = Align.ffill(once, "time", Seq("value"), buckets = 4)
      assert(collectMap(once) == collectMap(twice))
    }
  }

  test("property: no null survives ffill after the first non-null") {
    samples(4).filter(_.nonEmpty).foreach { rows =>
      val df = toDf(rows).select("time", "value").dropDuplicates("time")
      val out = Align.ffill(df, "time", Seq("value"), buckets = 4)
        .orderBy("time").collect()
      var seen = false
      out.foreach { r =>
        if (!r.isNullAt(1)) seen = true
        else assert(!seen, "null after a non-null value survived ffill")
      }
    }
  }
}
