import org.apache.spark.sql.SparkSession
object Q67Check {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.ui.enabled","false")
      .config("spark.sql.session.timeZone","UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1"))
      { println(d); graft.SparkEntry.queries("q67_ann_recall")(spark, d).show(45, false) }
    spark.stop()
  }
}
