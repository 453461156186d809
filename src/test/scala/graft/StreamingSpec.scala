package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.QuantileWindows
import graft.streaming.StreamingIntervalJoin

class StreamingSpec extends SparkSuite {
  import spark.implicits._

  test("stream-static interval join emits per-batch matches in append mode") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long)] // (id, start, stop)
    val stream = input.toDF()
      .select(col("_1").as("id"),
        struct(col("_2").as("start"), col("_3").as("stop")).as("span"))
    val wins = QuantileWindows.quantileWindows(spark, 4, 0L, 400L, "span", "w")

    val joined = StreamingIntervalJoin.joinStreamStatic(stream, wins, "span" -> "span")
    val q = joined.writeStream.format("memory").queryName("sj").outputMode("append").start()
    try {
      input.addData((1L, 0L, 100L), (2L, 150L, 250L), (3L, 390L, 410L))
      q.processAllAvailable()
      val out = spark.sql("SELECT * FROM sj").collect()
      // id=1 overlaps windows [0,100): 1 window exactly; id=2 spans 2 windows; id=3 hits last window
      val counts = out.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
      assert(counts == Map(1L -> 1, 2L -> 2, 3L -> 1))
      // intersection column present and clipped
      assert(out.forall { r =>
        val i = r.getStruct(r.fieldIndex("span"))
        i.getLong(1) > i.getLong(0)
      })
      // second batch arrives incrementally
      input.addData((4L, 100L, 300L))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM sj WHERE id = 4").count() == 2)
    } finally q.stop()
  }

  test("stream-stream interval join with watermarks matches overlapping pairs") {
    implicit val sqlCtx = spark.sqlContext
    val leftIn = MemoryStream[(Long, Long, Long)]
    val rightIn = MemoryStream[(Long, Long, Long)]
    def mk(df: org.apache.spark.sql.DataFrame, idName: String) = df
      .select(col("_1").as(idName),
        struct(col("_2").as("start"), col("_3").as("stop")).as("span"),
        timestamp_micros((col("_2") / 1000L).cast("long")).as("ts"))
    val joined = StreamingIntervalJoin.joinStreamStream(
      mk(leftIn.toDF(), "lid"), mk(rightIn.toDF(), "rid"),
      "span" -> "span", "ts", "10 seconds", maxDuration = 5000000000L)
    val q = joined.writeStream.format("memory").queryName("ss").outputMode("append").start()
    try {
      // second-scale ns offsets from a realistic base epoch: Spark clamps
      // its state watermark at epoch 0, silently dropping rows whose event
      // time sits within the watermark delay of 1970 — real data never does
      val ns = 1000000000L
      val base = 1704067200L * ns // 2024-01-01
      leftIn.addData((1L, base, base + 3L * ns), (2L, base + 10L * ns, base + 12L * ns))
      rightIn.addData((7L, base + 2L * ns, base + 4L * ns), (8L, base + 20L * ns, base + 21L * ns))
      q.processAllAvailable()
      val pairs = spark.sql("SELECT lid, rid FROM ss").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == Set((1L, 7L))) // only [0,3)x[2,4) overlap
    } finally q.stop()
  }
}
