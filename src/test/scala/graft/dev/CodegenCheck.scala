package graft.dev
import org.apache.spark.sql.SparkSession
object CodegenCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("q64_build_index")(spark, "/root/testdata/sf0.001")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val genLine = p.linesIterator.find(_.contains("Generate")).getOrElse("NO GENERATE NODE")
    println("GENLINE: " + genLine.trim.take(120))
    spark.stop()
  }
}
