package graft.dev
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures maintenance-op latency on the source-partitioned layout
  * at full fixture scale: delete one document by id, upsert one
  * revised document — the takedown/correction path. Asserts the
  * partition-rewrite claim while timing it: only the touched source
  * directory's files change. Run:
  *   sbt "Test/runMain graft.dev.MaintBench" */
object MaintBench {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val path = "/root/repo/target/maint_bench/index"
    val docs = graft.Tables.documents(spark, d)
    graft.sources.IndexStore.build(spark, docs, path)
    val all = spark.read.parquet(path)
    val nChunks = all.count()
    val nSources = all.select("source").distinct().count()
    def fileSet(): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(path)).map(f => s"${f.getPath}:${f.lastModified}").toSet
    }
    // delete one document's chunks by explicit id (the takedown)
    val victim = all.orderBy("chunk_id").select("chunk_id", "doc_id", "source")
      .first()
    val doomed = all.filter(col("doc_id") === victim.getLong(1) &&
        col("source") === victim.getString(2))
      .select("chunk_id").collect().map(_.getString(0)).toSeq
    val before = fileSet()
    val t0 = System.nanoTime()
    graft.sources.IndexStore.deleteIds(spark, path, doomed)
    val tDel = (System.nanoTime() - t0) / 1e9
    val changed = fileSet().diff(before).map(_.split(":")(0))
      .map(p => p.stripPrefix(path + "/").split("/")(0)).toSet
    // upsert one revised document (the correction)
    val revised = docs.filter(col("doc_id") === victim.getLong(1) + 1)
      .limit(1).withColumn("text", concat(lit("revised "), col("text")))
    val t1 = System.nanoTime()
    graft.sources.IndexStore.upsertDocs(spark, revised, path)
    val tUp = (System.nanoTime() - t1) / 1e9
    println(f"MAINT corpus=$nChunks%d chunks/$nSources%d sources " +
      f"delete_one_doc=$tDel%.2fs (dirs touched: ${changed.mkString(",")}) " +
      f"upsert_one_doc=$tUp%.2fs")
    // segment maintenance: build + 8 append waves (one file per
    // touched cell each), then compact every crowded cell to one file
    val ivf = "/root/repo/target/maint_bench/ivf"
    val waves = 8
    val perWave = 100L
    graft.sources.IndexStore.buildIvf(spark,
      docs.filter(col("doc_id") < 1000), ivf)
    (0 until waves).foreach { w =>
      graft.sources.IndexStore.appendIvf(spark,
        docs.filter(col("doc_id") >= 1000 + w * perWave &&
          col("doc_id") < 1000 + (w + 1) * perWave), ivf)
    }
    def cellFiles(): Seq[Int] = {
      val root = new java.io.File(ivf)
      root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("cell="))
        .map(_.listFiles().count(_.getName.endsWith(".parquet"))).toSeq
    }
    val filesBefore = cellFiles()
    val t2 = System.nanoTime()
    graft.sources.IndexStore.compactIvf(spark, ivf, maxFilesPerCell = 1)
    val tCompact = (System.nanoTime() - t2) / 1e9
    val filesAfter = cellFiles()
    println(f"COMPACT waves=$waves%d files/cell before=${filesBefore.max}%d(max)/" +
      f"${filesBefore.sum}%d(total) after=${filesAfter.max}%d(max)/" +
      f"${filesAfter.sum}%d(total) sec=$tCompact%.2f")
    spark.stop()
  }
}
