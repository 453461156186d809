package graft

/** Dev probe: split a query's wall time into Catalyst phases (analysis /
  * optimization / physical planning, from QueryPlanningTracker) vs
  * construction vs execution — `runMain graft.PhaseProbe <query> <reps>`. */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Bench.buildSession()
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.toRdd.count()
      val t2 = System.nanoTime()
      val phases = df.queryExecution.tracker.phases.map { case (k, v) =>
        s"$k=${v.durationMs}ms"
      }.mkString(" ")
      println(f"PHASE $name rep$i construct=${(t1 - t0) / 1e9}%.3f exec=${(t2 - t1) / 1e9}%.3f  $phases")
    }
    spark.stop()
  }
}
