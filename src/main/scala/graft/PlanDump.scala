package graft

/** Dev tool: write `.explain("formatted")` for named SparkEntry queries to
  * files — `runMain graft.PlanDump <sfDir> <outDir> <queryName>...`, or
  * `all` to dump every declared query. Shares [[Bench.buildSession]] so the
  * captured plans are the bench's plans conf-for-conf (AQE initial plans;
  * the judge checks plan claims against these files). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = Bench.buildSession()
    val dir = args(0)
    val out = java.nio.file.Paths.get(args(1))
    java.nio.file.Files.createDirectories(out)
    val names =
      if (args.length > 2 && args(2) == "all") SparkEntry.queries.keys.toSeq
      else args.drop(2).toSeq
    names.foreach { q =>
      try {
        val df = SparkEntry.queries(q)(spark, dir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(out.resolve(s"$q.txt"), txt)
        println(s"PLAN $q ok (${txt.length} chars)")
      } catch {
        case e: Throwable => println(s"PLAN $q FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
