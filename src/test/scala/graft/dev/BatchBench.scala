package graft.dev
import org.apache.spark.sql.SparkSession

/** Measures the batch-search win: N queries through ONE
  * searchTopKIvfBatch plan vs N sequential searchTopKIvf calls over
  * the same persisted index. The single-query path re-plans, re-reads
  * the quantizer and re-dispatches per query; the batch path pays one
  * scan of the probed-cell union. Run:
  *   sbt "Test/runMain graft.dev.BatchBench" (SPARK_GRAFT_SF_DIR to
  * change scale, SPARK_GRAFT_BATCH to change N). */
object BatchBench {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val n = sys.env.get("SPARK_GRAFT_BATCH").flatMap(v =>
      scala.util.Try(v.trim.toInt).toOption).filter(_ > 0).getOrElse(32)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val path = "/root/repo/target/batch_bench/index"
    graft.sources.IndexStore.buildIvf(spark,
      graft.Tables.documents(spark, d), path)
    val queries = (0 until n).map(i =>
      i.toLong -> s"query number $i about partitioned columnar scans and joins")
    // warm both paths once (plan/codegen caches) so the loop measures
    // steady-state dispatch cost, not first-plan compilation
    graft.sources.IndexStore.searchTopKIvf(spark, path, queries.head._2).count()
    graft.sources.IndexStore.searchTopKIvfBatch(spark, path, queries.take(2)).count()
    val t0 = System.nanoTime()
    val batchRows = graft.sources.IndexStore
      .searchTopKIvfBatch(spark, path, queries).count()
    val tBatch = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    var singleRows = 0L
    queries.foreach { case (_, text) =>
      singleRows += graft.sources.IndexStore.searchTopKIvf(spark, path, text).count()
    }
    val tSingle = (System.nanoTime() - t1) / 1e9
    println(f"BATCH ivf n=$n%d batch=$tBatch%.2fs ($batchRows%d rows) " +
      f"sequential=$tSingle%.2fs ($singleRows%d rows) speedup=${tSingle / tBatch}%.1fx")
    // same experiment on the graph family: one traversal pass vs N
    val hPath = "/root/repo/target/batch_bench/hnsw"
    graft.sources.IndexStore.buildHnsw(spark,
      graft.Tables.documents(spark, d), hPath)
    graft.sources.IndexStore.searchTopKHnsw(spark, hPath, queries.head._2).count()
    graft.sources.IndexStore.searchTopKHnswBatch(spark, hPath, queries.take(2)).count()
    val t2 = System.nanoTime()
    val hBatchRows = graft.sources.IndexStore
      .searchTopKHnswBatch(spark, hPath, queries).count()
    val tHBatch = (System.nanoTime() - t2) / 1e9
    val t3 = System.nanoTime()
    var hSingleRows = 0L
    queries.foreach { case (_, text) =>
      hSingleRows += graft.sources.IndexStore.searchTopKHnsw(spark, hPath, text).count()
    }
    val tHSingle = (System.nanoTime() - t3) / 1e9
    println(f"BATCH hnsw n=$n%d batch=$tHBatch%.2fs ($hBatchRows%d rows) " +
      f"sequential=$tHSingle%.2fs ($hSingleRows%d rows) speedup=${tHSingle / tHBatch}%.1fx")
    // hybrid: one pruned postings scan + one IVF batch scan + fusion
    // vs N full single-query hybrid pipelines. Queries are document
    // prefixes so the lexical side does real posting work.
    import org.apache.spark.sql.functions.col
    val lexPath = "/root/repo/target/batch_bench/lex"
    graft.sources.LexicalStore.build(spark,
      spark.read.parquet(path).select("chunk_id", "chunk"),
      lexPath, "chunk_id", "chunk")
    val hyQueries = graft.Tables.documents(spark, d)
      .filter(col("doc_id") < n).select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split(" ").take(8).filter(_.nonEmpty).mkString(" "))
      .sortBy(_._1).toSeq
    graft.operators.Hybrid.searchTopKHybrid(spark, lexPath, path,
      hyQueries.head._2).count()
    graft.operators.Hybrid.searchTopKHybridBatch(spark, lexPath, path,
      hyQueries.take(2)).count()
    val t4 = System.nanoTime()
    val yBatchRows = graft.operators.Hybrid
      .searchTopKHybridBatch(spark, lexPath, path, hyQueries).count()
    val tYBatch = (System.nanoTime() - t4) / 1e9
    val t5 = System.nanoTime()
    var ySingleRows = 0L
    hyQueries.foreach { case (_, text) =>
      ySingleRows += graft.operators.Hybrid
        .searchTopKHybrid(spark, lexPath, path, text).count()
    }
    val tYSingle = (System.nanoTime() - t5) / 1e9
    println(f"BATCH hybrid n=$n%d batch=$tYBatch%.2fs ($yBatchRows%d rows) " +
      f"sequential=$tYSingle%.2fs ($ySingleRows%d rows) speedup=${tYSingle / tYBatch}%.1fx")
    spark.stop()
  }
}
