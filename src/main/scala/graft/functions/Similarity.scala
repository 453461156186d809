package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector-similarity search over an embedding column (`array<float>`).
  *
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *    The (small) query set is broadcast against the full corpus, so the
  *    corpus is scanned once, partition-parallel, no shuffle of the corpus
  *    itself; only k rows per query survive the window.
  *  - [[lshTopK]]: the scale path — sign-random-projection LSH buckets both
  *    sides, turning the crossJoin into an equi-join on the bucket code.
  *    Recall < 1 by construction (single-probe); the bucket count/planes
  *    trade recall for speed.
  *
  * Dot products run in double precision via `zip_with` + `aggregate`
  * (sequential fold, deterministic order — reproducible by the oracle).
  */
object Similarity {

  /** Native codegen'd dot product (see [[graft.expressions.DotProduct]]);
    * element-order double accumulation, so values are bit-identical to the
    * interpreted `zip_with`+`aggregate` fold and to the SQL oracle. */
  def dot(a: Column, b: Column): Column =
    graft.expressions.GraftExtensions.dot_product(a, b)

  /** The interpreted-HOF formulation, kept as the parity/behavior oracle
    * for [[dot]] (SimilaritySpec pins both paths equal). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>")
    val bd = b.cast("array<double>")
    dot(ad, bd) / (norm(ad) * norm(bd))
  }

  /** Exact top-k neighbours for each query vector.
    * Ranking key is (round(sim, 4) desc, id asc): rounding makes the rank
    * stable across engines whose last-ulp sums differ; ties break by id. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    val sim = corpus.join(broadcast(q), col(idCol) =!= col("q_id"))
      .select(col("q_id"), col(idCol),
        round(cosine(col(vecCol), col("q_vec")), 4).as("sim"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col(idCol))
    sim.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplanes for sign-projection LSH. */
  def randomPlanes(nPlanes: Int, dim: Int, seed: Long = 7L): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** Sign-projection bucket code: bit i = (v · plane_i) > 0. */
  def lshCode(vec: Column, planes: Seq[Seq[Double]]): Column = {
    val vd = vec.cast("array<double>")
    planes.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(lit): _*)
      when(dot(vd, planeCol) > 0.0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Approximate top-k: candidates restricted to the query's LSH bucket. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      planes: Seq[Seq[Double]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cWithCode = corpus.withColumn("code", lshCode(col(vecCol), planes))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
      .withColumn("code", lshCode(col("q_vec"), planes))
    val sim = cWithCode.join(broadcast(q), Seq("code"))
      .where(col(idCol) =!= col("q_id"))
      .select(col("q_id"), col(idCol),
        round(cosine(col(vecCol), col("q_vec")), 4).as("sim"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col(idCol))
    sim.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
