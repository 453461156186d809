package graft

/** Dev probe: run named SparkEntry queries and report the NUMBER of Spark
  * jobs/stages/tasks each one schedules — structural cost evidence immune
  * to the machine's roving slowdown bands (wall-clock probes are not).
  * `runMain graft.JobCountProbe <query>...` (2 reps; the 2nd is steady
  * state once per-dataset index tables exist). */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Bench.buildSession()
    val jobs = new java.util.concurrent.atomic.AtomicLong(0)
    val stages = new java.util.concurrent.atomic.AtomicLong(0)
    val tasks = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size.toLong)
        tasks.addAndGet(j.stageInfos.map(_.numTasks.toLong).sum)
      }
    })
    args.foreach { name =>
      (1 to 2).foreach { rep =>
        jobs.set(0); stages.set(0); tasks.set(0)
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
        val dt = (System.nanoTime() - t0) / 1e9
        // listener bus is async; give it a beat to drain before reading
        Thread.sleep(300)
        println(f"JOBS $name rep$rep jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get} wall=$dt%.3f s")
      }
    }
    spark.stop()
  }
}
