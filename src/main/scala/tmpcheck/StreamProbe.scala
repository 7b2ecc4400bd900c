import org.apache.spark.sql.SparkSession
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false")
      .config("spark.sql.session.timeZone","UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(s"$name: ${(System.nanoTime()-t0)/1e9}%.2f".replace("%.2f",""))
    }
    // warm
    spark.range(100).selectExpr("sum(id)").collect()
    for (trial <- 1 to 2) {
      time(s"t$trial q80 default") { graft.SparkEntry.queries("q80_stream_tumbling")(spark, d).count() }
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      time(s"t$trial q80 noDataBatch=off") { graft.SparkEntry.queries("q80_stream_tumbling")(spark, d).count() }
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      time(s"t$trial q80 +rocksdb") { graft.SparkEntry.queries("q80_stream_tumbling")(spark, d).count() }
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      spark.conf.unset("spark.sql.streaming.noDataMicroBatches.enabled")
      time(s"t$trial q83 default") { graft.SparkEntry.queries("q83_incremental_index")(spark, d).count() }
      time(s"t$trial q84 default") { graft.SparkEntry.queries("q84_stream_dedup")(spark, d).count() }
    }
    spark.stop()
  }
}
