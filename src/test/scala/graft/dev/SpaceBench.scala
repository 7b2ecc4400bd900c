package graft.dev
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures knnSpace's two dispatch paths over the same corpus: the
  * codegen'd float kernels (ARRAY<FLOAT>) vs the declarative
  * higher-order folds (ARRAY<DOUBLE>) — same arithmetic, different
  * execution. Run:
  *   sbt "Test/runMain graft.dev.SpaceBench"
  * (SPARK_GRAFT_SF_DIR to change scale). */
object SpaceBench {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // tile the fixture 50x (distinct ids) so the measurement sees
    // kernel throughput, not per-job overhead
    val emb = graft.Tables.embeddings(spark, d)
      .crossJoin(spark.range(50).select(col("id").as("rep")))
      .select((col("vec_id") * 50 + col("rep")).as("vec_id"), col("embedding"))
      .repartition(32)
      .localCheckpoint() // isolate the kernel cost from the scan
    val dbl = emb.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("vec"))
      .localCheckpoint()
    val n = emb.count()
    def run(tag: String, corpus: org.apache.spark.sql.DataFrame,
            vecCol: String): Unit = {
      val qs = corpus.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col(vecCol).as("qvec"))
      Seq("cosine", "ip", "l2").foreach { sp =>
        // warm once (plan + codegen), then measure
        graft.operators.VectorSearch.knnSpace(corpus, "vec_id", vecCol, qs, 10, sp).count()
        val t0 = System.nanoTime()
        val rows = graft.operators.VectorSearch
          .knnSpace(corpus, "vec_id", vecCol, qs, 10, sp).count()
        val t = (System.nanoTime() - t0) / 1e9
        println(f"SPACE $tag%-6s $sp%-6s n=$n%d x 8 queries: $t%.2fs ($rows rows)")
      }
    }
    run("float", emb, "embedding")
    run("double", dbl, "vec")
    spark.stop()
  }
}
