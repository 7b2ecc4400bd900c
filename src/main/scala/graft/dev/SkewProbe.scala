package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.IndexStore

/** Dev-only writer-skew probe (NOT a gate) — the experiment the r19
  * verdict asked for before changing the bulk-build write path: the
  * r19 one-file-per-cell fix gives each cell exactly ONE writer
  * task, so a corpus whose embeddings cluster unevenly (they all do
  * — the q190 skew report exists because of it) serializes the hot
  * cell's entire mass through one task. This probe builds an IVF
  * layout over a deliberately skewed corpus (`hot` fraction of rows
  * share one embedding → one cell) TWICE — once with the bound
  * disabled (the r19 behavior: hot cell = 1 writer, 1 giant file)
  * and once with a rows-per-writer bound that splits only the hot
  * cell — and reports build wall-time, per-cell file counts, and
  * cold search latency for both, so the bound's win (parallel hot
  * writers) and its non-cost (quiet cells keep 1 file) are both
  * measured, not argued.
  *
  * Run: SPARK_GRAFT_ROWS=200000 SPARK_GRAFT_BOUND=16384 \
  *        sbt "runMain graft.dev.SkewProbe"
  * Prints one JSON line; numbers land in BASELINE.md + the r20
  * probe record (dev/bench/r20_skew_probe.json).
  */
object SkewProbe {

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_ROWS", "200000").toInt
    val bound = sys.env.getOrElse("SPARK_GRAFT_BOUND", "16384").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/root/repo/target/spark-warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.{vecIndexExprs, Embed}

    // half the corpus is ONE text (one embedding -> one IVF cell);
    // the rest vary per row so they spread across the other cells
    val rows = spark.range(n)
      .select(col("id").as("chunk_id"), col("id").as("doc_id"),
        lit("probe").as("source"), (col("id") + 2).as("sheet_row"),
        when(col("id") % 2 === 0, lit("hot topic gpu kernels fused"))
          .otherwise(concat(lit("doc "), col("id") % 977,
            lit(" body "), col("id") % 331)).as("chunk"))
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("embedding", Embed.embedCol(col("chunk")))
      .withColumn("sq8_code", vecIndexExprs.sq8Code(col("embedding")))
      .withColumn("sq8_factor", vecIndexExprs.sq8Factor(col("embedding")))
      .localCheckpoint()

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def fileStats(path: String): (Int, Int, Long) = {
      val hPath = new org.apache.hadoop.fs.Path(path)
      val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val perCell = fs.listStatus(hPath).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
        .map(s => fs.listStatus(s.getPath)
          .count(_.getPath.getName.endsWith(".parquet")))
      val maxBytes = fs.listStatus(hPath).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
        .flatMap(s => fs.listStatus(s.getPath).toSeq.map(_.getLen))
        .maxOption.getOrElse(0L)
      (perCell.sum, perCell.maxOption.getOrElse(0), maxBytes)
    }
    def probe(path: String, rowsPerFile: Int): (Double, Int, Int, Long, Double) = {
      val (_, buildS) = timed(IndexStore.buildIvfFromRows(spark, rows, path,
        nCells = 16, maxRowsPerCellFile = rowsPerFile))
      val (files, maxFilesPerCell, maxFileBytes) = fileStats(path)
      val (_, coldS) = timed(IndexStore.searchTopKIvf(spark, path,
        "hot topic gpu kernels fused", 10, probes = 3, overfetch = 64).collect())
      (buildS, files, maxFilesPerCell, maxFileBytes, coldS)
    }

    val (oldB, oldF, oldMaxF, oldBytes, oldCold) =
      probe(s"/root/repo/target/skew_probe_old_$n", Int.MaxValue)
    val (newB, newF, newMaxF, newBytes, newCold) =
      probe(s"/root/repo/target/skew_probe_bounded_$n", bound)

    def f(d: Double) = f"$d%.3f".toDouble
    println(
      s"""{"metric":"skew_probe","rows":$n,"hot_frac":0.5,"bound":$bound,""" +
      s""""unbounded":{"build_sec":${f(oldB)},"files":$oldF,""" +
      s""""max_files_per_cell":$oldMaxF,"max_file_mb":${f(oldBytes / 1e6)},""" +
      s""""search_cold_sec":${f(oldCold)}},""" +
      s""""bounded":{"build_sec":${f(newB)},"files":$newF,""" +
      s""""max_files_per_cell":$newMaxF,"max_file_mb":${f(newBytes / 1e6)},""" +
      s""""search_cold_sec":${f(newCold)}}}""")
    spark.stop()
  }
}
