package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming semantics the bounded complete-mode oracles (q80/q81)
  * cannot exercise: append-mode window finalization driven by the
  * watermark, and late-data drop.
  */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("watermark finalizes windows in append mode and drops late rows") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String)]
    val agg = ms.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes").as("w"), col("k"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("start"), col("k"), col("n"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("wm_test").start()
    try {
      // two rows in window [10:00, 10:10)
      ms.addData((ts("2024-01-01 10:01:00"), "a"), (ts("2024-01-01 10:06:00"), "a"))
      q.processAllAvailable()
      // nothing emitted yet: watermark (10:06 - 10m) hasn't passed 10:10
      assert(spark.table("wm_test").count() == 0)
      // an 11:00 row pushes the watermark to 10:50 => first window final
      ms.addData((ts("2024-01-01 11:00:00"), "a"))
      q.processAllAvailable()
      val emitted = spark.table("wm_test").collect()
      assert(emitted.length == 1)
      assert(emitted.head.getAs[Long]("n") == 2)
      // a very late row (9:00, far below the watermark) must be dropped
      ms.addData((ts("2024-01-01 09:00:00"), "a"))
      // and another advance to flush anything it might have created
      ms.addData((ts("2024-01-01 12:00:00"), "a"))
      q.processAllAvailable()
      val after = spark.table("wm_test").collect()
      assert(!after.exists(_.getAs[Timestamp]("start") == ts("2024-01-01 09:00:00")),
        "late row below the watermark must not produce a window")
    } finally q.stop()
  }
}
