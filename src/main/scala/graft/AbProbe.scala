package graft

import org.apache.spark.sql.functions._

/** Dev probe: same-session A/B of hand-picked frame constructions
  * (round-robin so hypervisor bands hit both arms equally). Edit the
  * `arms` map per experiment; `runMain graft.AbProbe <arm>... <rounds>`. */
object AbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val sp = Bench.buildSession()
    def docs = sp.read.parquet(s"$sfDir/documents.parquet")
    val arms: Map[String, () => org.apache.spark.sql.DataFrame] = Map(
      "span_raw" -> (() => graft.functions.Dedup.dupSpanFraction(
        docs, "doc_id", "text", 5)),
      "span_par" -> (() => graft.functions.Dedup.dupSpanFraction(
        graft.sources.Scans.parallelized(docs), "doc_id", "text", 5)),
      "keepone_raw" -> (() => graft.functions.Dedup.removeDupSpansKeepOne(
        docs, "doc_id", "text", 5)),
      "keepone_par" -> (() => graft.functions.Dedup.removeDupSpansKeepOne(
        graft.sources.Scans.parallelized(docs), "doc_id", "text", 5))
    )
    val names = args.dropRight(1)
    val rounds = args.last.toInt
    // warm
    names.foreach(n => arms(n)().queryExecution.toRdd.count())
    val times = scala.collection.mutable.Map(names.map(_ -> List.empty[Double]): _*)
    (1 to rounds).foreach { _ =>
      names.foreach { n =>
        val t0 = System.nanoTime()
        arms(n)().queryExecution.toRdd.count()
        times(n) ::= (System.nanoTime() - t0) / 1e9
      }
    }
    names.foreach { n =>
      val ts = times(n)
      println(f"ARM $n min=${ts.min}%.3f all=[${ts.reverse.map(t => f"$t%.2f").mkString(",")}]")
    }
    sp.stop()
  }
}
