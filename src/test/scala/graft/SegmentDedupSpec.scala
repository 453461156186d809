package graft

import org.apache.spark.sql.functions._
import graft.functions.Dedup

class SegmentDedupSpec extends SparkSuite {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)]) =
    Dedup.dedupSegments(docs.toDF("doc_id", "text"), "doc_id", "text",
        delim = "\\n", joiner = "\n")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

  test("cross-document repeats keep only the global first occurrence") {
    val out = run(Seq(
      1L -> "unique one\ncookie banner\nbody text",
      2L -> "cookie banner\nsecond body",
      3L -> "third body\ncookie banner"))
    assert(out(1L) == ((3L, 3L, "unique one\ncookie banner\nbody text")))
    assert(out(2L) == ((2L, 1L, "second body")))
    assert(out(3L) == ((2L, 1L, "third body")))
  }

  test("within-document repeats also dedup (first position wins)") {
    val out = run(Seq(10L -> "a\nb\na\nc\nb"))
    assert(out(10L) == ((5L, 3L, "a\nb\nc")))
  }

  test("first = smallest (doc, position), not arrival order of the plan") {
    // doc 5 has the segment at position 2, doc 4 at position 0: doc 4 wins
    val out = run(Seq(5L -> "x\ny\nshared", 4L -> "shared\nz"))
    assert(out(4L)._3 == "shared\nz")
    assert(out(5L)._3 == "x\ny")
  }

  test("segments trim and empties drop; all-duplicate docs yield empty text") {
    val out = run(Seq(
      1L -> "  padded  \n\n\n  padded  ",
      2L -> "padded"))
    // both segments of doc 1 trim to "padded"; first occurrence is doc 1 pos 0
    assert(out(1L) == ((2L, 1L, "padded")))
    assert(out(2L) == ((1L, 0L, "")))
  }

  test("docs with no non-empty segments are absent from the output") {
    val out = run(Seq(1L -> "   \n  \n", 2L -> "real"))
    assert(!out.contains(1L) && out.contains(2L))
  }

  test("idempotence: deduping the cleaned corpus removes nothing") {
    val docs = Seq(
      1L -> "alpha\nbeta\ngamma",
      2L -> "beta\ndelta",
      3L -> "gamma\ndelta\nepsilon")
    val cleaned = Dedup.dedupSegments(docs.toDF("doc_id", "text"),
        "doc_id", "text", delim = "\\n", joiner = "\n")
      .where(col("n_kept") > 0)
      .select(col("id").as("doc_id"), col("clean_text").as("text"))
    val again = Dedup.dedupSegments(cleaned, "doc_id", "text",
      delim = "\\n", joiner = "\n")
    assert(again.where(col("n_kept") =!= col("n_segs")).count() == 0)
  }

  test("partitioning does not change the result (deterministic winner)") {
    val docs = (0L until 200L).map(i => i -> s"seg${i % 17}\nseg${i % 5}\nuniq$i")
    val a = Dedup.dedupSegments(docs.toDF("doc_id", "text"), "doc_id", "text",
      delim = "\\n", joiner = "\n")
    val b = Dedup.dedupSegments(docs.toDF("doc_id", "text").repartition(13),
      "doc_id", "text", delim = "\\n", joiner = "\n")
    assertSameRows(a, b)
  }
}
