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

    // ---- the documented caveat, measured: l2-trained IVF cells
    // serving a NON-unit corpus under each collection space. Layout
    // rows mirror q122's synthesis (scale 1 + vec_id % 4); ground
    // truth is the exact knnSpace ranking over the same rows.
    import graft.sources.IndexStore
    import graft.operators.VectorSearch
    val scaled = graft.Tables.embeddings(spark, d).select(
      concat(lit("v"), lpad(col("vec_id").cast("string"), 6, "0")).as("chunk_id"),
      col("vec_id").as("doc_id"),
      concat(lit("s"), (col("vec_id") % 3).cast("string")).as("source"),
      lit("").as("chunk"),
      (col("vec_id") + 2).as("sheet_row"),
      transform(col("embedding"),
        x => (x.cast("double") * (lit(1.0) + (col("vec_id") % 4).cast("double")))
          .cast("float")).as("embedding"))
    val rows = scaled
      .withColumn("lsh_buckets", graft.functions.hashExprs.lshBuckets(
        col("embedding"), 64, IndexStore.LshBits, IndexStore.LshTables))
      .withColumn("sq8_code", graft.functions.vecIndexExprs.sq8Code(col("embedding")))
      .withColumn("sq8_factor", graft.functions.vecIndexExprs.sq8Factor(col("embedding")))
      .localCheckpoint()
    val qvec = rows.filter(col("doc_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val qDf = rows.filter(col("doc_id") === 0)
      .select(col("chunk_id").as("query_id"), col("embedding").as("qvec"))
    Seq("cosine", "ip", "l2").foreach { sp =>
      val ivfPath = s"/root/repo/target/space_bench/ivf_$sp"
      IndexStore.buildIvfFromRows(spark, rows, ivfPath, nCells = 16, lloydIters = 2)
      IndexStore.writeCollectionMetadata(spark, ivfPath,
        Map(IndexStore.SpaceKey -> sp))
      val exact = VectorSearch.knnSpace(rows, "chunk_id", "embedding",
          qDf, 10, sp).collect().map(_.getString(2)).toSet
      Seq(1, 2, 4).foreach { probes =>
        // k=11 then drop the self row: knnSpace excludes the query
        // row, the layout search necessarily returns it
        val got = IndexStore.searchTopKIvfVec(spark, ivfPath, qvec,
            k = 11, probes = probes, overfetch = 64).collect()
          .sortBy(_.getAs[Int]("rank"))
          .map(_.getAs[String]("chunk_id")).filter(_ != "v000000")
          .take(10).toSet
        val recall = (exact & got).size / 10.0
        println(f"SPACE ivf-recall space=$sp%-6s probes=$probes recall@10=$recall%.2f")
      }
    }
    spark.stop()
  }
}
