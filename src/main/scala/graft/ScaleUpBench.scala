package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Warm-vs-warm 4× scale-up curves for the suite's slowest queries.
  *
  * Builds (once, cached by path) a 4× dataset derived from sf0.1 whose
  * copies are STRUCTURALLY DISJOINT — the levers matter, because a naive
  * 4× self-union makes every doc an exact duplicate of 3 clones and the
  * dedup/near-dup queries degenerate into quadratic pair blowups that
  * measure the fixture, not the operator:
  *
  *  - documents: doc_id offset per copy; every whitespace token in copies
  *    1-3 gains a copy suffix, so shingles/terms NEVER collide across
  *    copies (cross-copy Jaccard/containment = 0, vocabulary ×4, per-doc
  *    length +tokens·3 chars) while each copy keeps the original intra-
  *    corpus duplicate structure. n_chars recomputed for consistency.
  *  - lineitem/orders: order keys offset per copy, part keys SHARED —
  *    4× baskets over the same catalog (edge sets unchanged, weights ×4;
  *    the basket-keyed shuffles see 4× rows).
  *  - embeddings: vec_id offset per copy, vectors kept — ANN corpus and
  *    (hash-sampled) query side both scale 4×, so the full-probe exact
  *    audit (q137) is expected ~16× (it is O(corpus × queries) BY DESIGN;
  *    the production path caps queries or probes nProbe < nLists).
  *  - part: copied as-is.
  *
  * Runs each target query warm (one full warm pass per dir, then
  * min-of-`reps` measured passes — Bench.scala's discipline) at 1× and 4×
  * and prints one JSON line per query: name, t1x, t4x, ratio.
  */
object ScaleUpBench {
  private val Off = 100000000L // key offset per copy; >> any sf0.1 key

  val targets: Seq[String] = Seq(
    "q137_label_agreement", "q133_overlap_matrix", "q74_bm25",
    "q159_label_prop", "q75_cluster_canonical", "q172_leakage_audit",
    "q145_copurchase", "q139_jaccard_join", "q78_bm25_index",
    "q84_hybrid_rrf")

  private def copies(df: DataFrame, n: Int)(remap: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until n).map(c => remap(df, c)).reduce(_ unionAll _)

  /** Build the 4× dir if absent. Idempotent via a DONE marker written last. */
  def buildScaled(spark: SparkSession, srcDir: String, outDir: String,
      factor: Int = 4): Unit = {
    val done = new java.io.File(outDir, "_DONE")
    if (done.exists()) return
    val read = (t: String) => spark.read.parquet(s"$srcDir/$t.parquet")
    val write = (df: DataFrame, t: String) =>
      df.write.mode("overwrite").parquet(s"$outDir/$t.parquet")

    write(copies(read("documents"), factor) { (d, c) =>
      if (c == 0) d
      else {
        val salted = array_join(
          transform(split(col("text"), "\\s+"), t => concat(t, lit(s"~c$c"))),
          " ")
        d.select((col("doc_id") + c * Off).as("doc_id"), salted.as("text"),
          col("lang"), col("source"), length(salted).as("n_chars"))
      }
    }, "documents")

    write(copies(read("embeddings"), factor) { (d, c) =>
      d.select((col("vec_id") + c * Off).as("vec_id"), col("embedding"),
        col("label"))
    }, "embeddings")

    write(copies(read("lineitem"), factor) { (d, c) =>
      d.withColumn("l_orderkey", col("l_orderkey") + c * Off)
    }, "lineitem")

    write(copies(read("orders"), factor) { (d, c) =>
      d.withColumn("o_orderkey", col("o_orderkey") + c * Off)
    }, "orders")

    write(read("part"), "part")
    java.nio.file.Files.writeString(done.toPath, "ok\n")
    ()
  }

  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = Bench.buildSession()
    buildScaled(spark, srcDir, outDir)

    def measure(dir: String): Map[String, Double] = {
      targets.foreach { n => // warm pass (codegen, readers, index builds)
        try SparkEntry.queries(n)(spark, dir).queryExecution.toRdd.count()
        catch { case e: Throwable =>
          System.err.println(s"[scaleup] warm $n @ $dir failed: ${e.getMessage}") }
      }
      (1 to reps).map { _ =>
        targets.map { n =>
          val t0 = System.nanoTime()
          try SparkEntry.queries(n)(spark, dir).queryExecution.toRdd.count()
          catch { case _: Throwable => () }
          n -> (System.nanoTime() - t0) / 1e9
        }.toMap
      }.reduce((a, b) => a.map { case (k, v) => k -> math.min(v, b(k)) })
    }

    val t1 = measure(srcDir)
    val t4 = measure(outDir)
    def f(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    targets.foreach { n =>
      println(s"""{"query":"$n","t1x_sec":${f(t1(n))},"t4x_sec":${f(t4(n))},"ratio":${f(t4(n) / t1(n))}}""")
    }
    spark.stop()
  }
}
