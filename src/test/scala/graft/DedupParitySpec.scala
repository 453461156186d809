package graft

import org.apache.spark.sql.functions._
import graft.functions.Dedup

/** The imperative fast path ([[Dedup.signatures]]) must produce values
  * bit-identical to the pure-Column expression path (which is what the
  * DuckDB oracle mirrors). */
class DedupParitySpec extends SparkSuite {

  test("mapPartitions signatures == Column-expression signatures on real docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    val fast = Dedup.signatures(docs, "text", "doc_id")
      .select(col("id"), col("sig"), col("bhs"))
      .collect().map(r => r.getLong(0) -> ((r.getSeq[Long](1), r.getSeq[Long](2)))).toMap
    val cols = docs
      .withColumn("__hs", Dedup.shingleHashes(col("text")))
      .withColumn("__sig", Dedup.minhashFromHashes(col("__hs"), 16))
      .select(col("doc_id"), col("__sig"),
        transform(Dedup.bandHashes(col("__sig"), 4, 4), _.getField("bh")).as("__bhs"))
      .collect().map(r => r.getLong(0) -> ((r.getSeq[Long](1), r.getSeq[Long](2)))).toMap
    assert(fast.keySet == cols.keySet)
    fast.foreach { case (id, (sig, bhs)) =>
      assert(sig == cols(id)._1, s"sig mismatch doc $id")
      assert(bhs == cols(id)._2, s"band-hash mismatch doc $id")
    }
  }

  test("simhashFast == simhash32 Column path on real docs (incl. empty/odd tokens)") {
    import spark.implicits._
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(60)
    val edge = Seq((9001L, ""), (9002L, "   "), (9003L, "one"),
      (9004L, "a  b\t c\nd"), (9005L, "ünïcødé tökens £§"),
      (9006L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val docs = real.select(col("doc_id"), col("text")).unionAll(edge)
    val fast = Dedup.simhashFast(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cols = docs.select(col("doc_id"), Dedup.simhash32(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == cols)
  }

  test("repetitionFast == dupTokenRatio/dupBigramRatio Column path") {
    import spark.implicits._
    import graft.functions.{TextFunctions => TF}
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(60)
    val edge = Seq((9001L, ""), (9002L, "only"), (9003L, "a a a a"),
      (9004L, "x y x y x y"), (9005L, " spaced   out\ttabs\nlines "),
      (9006L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val docs = real.select(col("doc_id"), col("text")).unionAll(edge)
    val fast = TF.repetitionFast(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val cols = docs.select(col("doc_id"),
        TF.dupTokenRatio(col("text")).as("a"), TF.dupBigramRatio(col("text")).as("b"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(fast == cols)
  }

  test("shingle hash set parity (as sets — order differs by construction)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
    val fast = Dedup.signatures(docs, "text", "doc_id")
      .select(col("id"), col("hs")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val cols = docs.select(col("doc_id"), Dedup.shingleHashes(col("text")).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(fast == cols)
  }

  test("charEntropyFast == charEntropy Column path on real docs + unicode edges") {
    import graft.functions.{TextFunctions => TF}
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(80).select(col("doc_id"), col("text"))
    val edge = Seq((9101L, ""), (9102L, "a"), (9103L, "aaaa"),
      (9104L, "abab"), (9105L, "\u4f60\u597d\u4f60"), (9106L, "mixed \u00e9\u00e9 zz"),
      (9107L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val docs = real.unionAll(edge)
    val fast = TF.charEntropyFast(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val cols = TF.charEntropy(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(fast == cols)
    assert(!fast.contains(9101L) && !fast.contains(9107L)) // empty/null omitted
  }
}
