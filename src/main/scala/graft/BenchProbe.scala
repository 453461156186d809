package graft

/** Dev probe: run named queries repeatedly to separate cold-start cost from
  * steady-state cost (`runMain graft.BenchProbe q33_covered_duration 3`).
  * Shares [[Bench.buildSession]] so probe numbers are comparable to bench
  * numbers conf-for-conf. */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Bench.buildSession()
    val reps = args.lastOption.flatMap(s => scala.util.Try(s.toInt).toOption).getOrElse(2)
    val names = args.filterNot(a => scala.util.Try(a.toInt).isSuccess)
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.count()
        println(f"PROBE $name rep$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
