package graft.dev

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.{IndexStore, LexicalStore}

/** Dev-only scale probe (NOT a gate): build the two flagship index
  * families — the lexical BM25 layout and the IVF-SQ vector layout —
  * over a synthetically inflated corpus (default 10× the sf0.1
  * documents table) and record build throughput, the shuffle bytes
  * each build actually moved, and cold/warm search latency. The
  * first empirical point on the "would the plan survive 100×" axis:
  * the measured quantities to check are (a) build time scaling
  * ~linearly in rows, (b) shuffle volume scaling ~linearly in rows
  * (the builds are one partial-agg pass + partitioned write — no
  * quadratic term anywhere), and (c) search latency scaling with the
  * PRUNED read (query-term buckets / probed cells), not the corpus.
  *
  * Inflation: each doc replicates `factor` times under a fresh
  * doc_id (id = doc_id·factor + r). Texts repeat, so df scales by
  * factor and vocabulary stays fixed — conservative for the lexical
  * build (the tf partial agg combines LESS on real data with a
  * growing vocabulary, but the shuffle is keyed by (doc, term) whose
  * cardinality scales the same either way).
  *
  * Run: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_SCALE=10 \
  *        sbt "runMain graft.dev.ScaleProbe"
  * Prints one JSON line; numbers land in BASELINE.md's standing
  * measured facts.
  */
object ScaleProbe {

  private class ShuffleMeter extends SparkListener {
    @volatile var read = 0L
    @volatile var write = 0L
    @volatile var input = 0L
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        read += m.shuffleReadMetrics.totalBytesRead
        write += m.shuffleWriteMetrics.bytesWritten
        input += m.inputMetrics.bytesRead
      }
    }
    def snap(): (Long, Long, Long) = (read, write, input)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/root/repo/target/spark-warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)

    val base = graft.Tables.documents(spark, sfDir)
    val sess = spark
    import sess.implicits._
    val reps = (0 until factor).toDF("r")
    val docs = base.crossJoin(broadcast(reps))
      .select((col("doc_id") * factor + col("r")).as("doc_id"),
        col("text"), col("source"))
      .localCheckpoint() // inflation priced outside both builds
    val nDocs = docs.count()

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def phase[A](f: => A): (A, Double, Long, Long, Long) = {
      // stage-completion events arrive on the ASYNC listener bus —
      // settle before each snapshot or the last stages' bytes land in
      // the next phase's delta (listenerBus.waitUntilEmpty is
      // private[spark]; a settle is adequate for a dev probe)
      def settled(): (Long, Long, Long) = { Thread.sleep(800); meter.snap() }
      val (r0, w0, i0) = settled()
      val (a, secs) = timed(f)
      val (r1, w1, i1) = settled()
      (a, secs, r1 - r0, w1 - w0, i1 - i0)
    }

    // ---- lexical layout ------------------------------------------------
    val lexPath = s"/root/repo/target/scale_probe_lex_x$factor"
    val (_, lexBuildS, lexR, lexW, _) =
      phase(LexicalStore.build(spark, docs, lexPath))
    val postings = spark.read.parquet(lexPath).count()
    val terms = Seq("stream", "window", "partition", "merge")
    val (_, lexColdS, _, _, lexColdIn) = phase(
      LexicalStore.searchTopKLexical(spark, lexPath, terms, 10).collect())
    val lexWarmS = (1 to 3).map(_ => timed(
      LexicalStore.searchTopKLexical(spark, lexPath, terms, 10).collect())._2)

    // ---- IVF-SQ layout ---------------------------------------------------
    val ivfPath = s"/root/repo/target/scale_probe_ivf_x$factor"
    val (_, ivfBuildS, ivfR, ivfW, _) =
      phase(IndexStore.buildIvf(spark, docs, ivfPath, nCells = 64))
    val chunks = spark.read.parquet(ivfPath).count()
    val qText = terms.mkString(" ")
    val (_, ivfColdS, _, _, ivfColdIn) = phase(
      IndexStore.searchTopKIvf(spark, ivfPath, qText, 10, probes = 8,
        overfetch = 64).collect())
    val ivfWarmS = (1 to 3).map(_ => timed(
      IndexStore.searchTopKIvf(spark, ivfPath, qText, 10, probes = 8,
        overfetch = 64).collect())._2)

    def f(d: Double) = f"$d%.3f".toDouble
    println(
      s"""{"metric":"scale_probe","sf_dir":"$sfDir","factor":$factor,""" +
      s""""n_docs":$nDocs,"lex":{"build_sec":${f(lexBuildS)},""" +
      s""""docs_per_sec":${f(nDocs / lexBuildS)},"postings":$postings,""" +
      s""""shuffle_read_mb":${f(lexR / 1e6)},"shuffle_write_mb":${f(lexW / 1e6)},""" +
      s""""search_cold_sec":${f(lexColdS)},"search_cold_input_mb":${f(lexColdIn / 1e6)},""" +
      s""""search_warm_sec":[${lexWarmS.map(f).mkString(",")}]},""" +
      s""""ivf":{"build_sec":${f(ivfBuildS)},""" +
      s""""docs_per_sec":${f(nDocs / ivfBuildS)},"chunks":$chunks,""" +
      s""""shuffle_read_mb":${f(ivfR / 1e6)},"shuffle_write_mb":${f(ivfW / 1e6)},""" +
      s""""search_cold_sec":${f(ivfColdS)},"search_cold_input_mb":${f(ivfColdIn / 1e6)},""" +
      s""""search_warm_sec":[${ivfWarmS.map(f).mkString(",")}]}}""")
    spark.stop()
  }
}
