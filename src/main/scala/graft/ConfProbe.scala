package graft

/** Dev probe: A/B-time a query under alternating SQL-conf override sets in
  * ONE session (round-robin, so the machine's roving slowdown bands hit all
  * arms equally) — `runMain graft.ConfProbe <query> <rounds> <set>...`
  * where each <set> is `k=v;k=v` (use `default` for the empty set).
  * Reports per-arm minimums. Diagnostic only. */
object ConfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Bench.buildSession()
    val name = args(0)
    val rounds = args(1).toInt
    val sets = args.drop(2).map { s =>
      if (s == "default") Array.empty[(String, String)]
      else s.split(";").map { kv => val Array(k, v) = kv.split("=", 2); (k, v) }
    }
    val fn = SparkEntry.queries(name)
    // one untimed warm pass with defaults
    fn(spark, sfDir).queryExecution.toRdd.count()
    val times = Array.fill(sets.length)(List.empty[Double])
    (1 to rounds).foreach { _ =>
      sets.zipWithIndex.foreach { case (ovr, i) =>
        val prev = ovr.map { case (k, _) =>
          (k, scala.util.Try(spark.conf.get(k)).toOption)
        }
        ovr.foreach { case (k, v) => spark.conf.set(k, v) }
        try {
          val t0 = System.nanoTime()
          fn(spark, sfDir).queryExecution.toRdd.count()
          times(i) ::= (System.nanoTime() - t0) / 1e9
        } finally prev.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None) => spark.conf.unset(k)
        }
      }
    }
    sets.zipWithIndex.foreach { case (ovr, i) =>
      val label = if (ovr.isEmpty) "default" else ovr.map(kv => kv._1 + "=" + kv._2).mkString(";")
      println(f"AB $name min=${times(i).min}%.3f all=[${times(i).reverse.map(t => f"$t%.2f").mkString(",")}]  $label")
    }
    spark.stop()
  }
}
