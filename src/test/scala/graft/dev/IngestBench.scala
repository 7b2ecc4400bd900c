package graft.dev
import org.apache.spark.sql.SparkSession
object IngestBench {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, d)
    docs.count() // warm scan
    val out = "/root/repo/target/ingest_bench/index"
    val t0 = System.nanoTime()
    graft.sources.IndexStore.build(spark, docs, out)
    val sec = (System.nanoTime() - t0) / 1e9
    val n = spark.read.parquet(out).count()
    println(f"INGEST chunks=$n%d sec=$sec%.2f rate=${n / sec}%.0f chunks/s")
    spark.stop()
  }
}
