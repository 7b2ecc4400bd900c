package graft.dev

import org.apache.spark.sql.SparkSession
import graft.{SparkEntry, Tables}
import graft.sources.{LexicalStore, QueryParser}

/** Dev probe: split a parsed-query search's wall time into its three
  * phases — driver-side clause prep (parse + dictionary collects +
  * DataFrame assembly), Catalyst planning (analyze/optimize/physical),
  * and execution — so optimization aims at the real cost instead of
  * guessing (guide §1). Run: `sbt "runMain graft.dev.ParsedProbe"`.
  */
object ParsedProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    // build the layouts once through the real gates
    t("q231 cold (build+search)") {
      SparkEntry.queries("q231_query_parser")(spark, sfDir).count()
    }
    val d = sfDir
    def p(base: String) = s"/root/repo/target/$base/" +
      d.stripPrefix("/").replaceAll("[^A-Za-z0-9.]", "_")
    val fields = Map("body" -> p("q115_lex_index"), "title" -> p("q213_title_index"))
    val positional = Map("body" -> p("q197_pos_index"))
    val toks = Tables.documents(spark, d).filter("doc_id = 0")
      .select("text").head().getString(0)
      .split(" ").filter(_.nonEmpty).take(2).toSeq
    val q = s"""+stream title:window^2 merge s* "${toks.head} ${toks(1)}" -slow streem~2"""
    // count the jobs each phase fires and their spans
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long)]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Integer, java.lang.Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts.put(js.jobId, js.time)
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val s = Option(starts.get(je.jobId)).map(_.longValue).getOrElse(je.time)
          jobs.add((je.jobId, s, je.time))
        }
      })
    def drainJobs(label: String): Unit = {
      Thread.sleep(200)
      val js = Iterator.continually(jobs.poll()).takeWhile(_ != null).toSeq
      val tot = js.map { case (_, s, e) => e - s }.sum
      println(f"[probe]   $label%-26s ${js.size}%3d jobs, ${tot / 1e3}%7.3f s summed")
    }
    // dump the formatted plan once (the plans/r21 before/after artifact)
    sys.env.get("PROBE_PLAN_OUT").foreach { out =>
      val df0 = LexicalStore.searchParsed(spark, QueryParser.parse(q), fields,
        "body", positional, k = 10, maxExpansions = 8)
      val txt = df0.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(out).getParent)
      java.nio.file.Files.writeString(java.nio.file.Paths.get(out), txt)
      println(s"[probe] plan written to $out (${txt.linesIterator.size} lines)")
    }
    (1 to 3).foreach { i =>
      val parsed = t(s"run$i parse")(QueryParser.parse(q))
      drainJobs("(jobs in parse)")
      val df = t(s"run$i clause prep (driver)") {
        LexicalStore.searchParsed(spark, parsed, fields, "body",
          positional, k = 10, maxExpansions = 8)
      }
      drainJobs("(jobs in clause prep)")
      t(s"run$i planning")(df.queryExecution.executedPlan)
      t(s"run$i execution (count)")(df.count())
      drainJobs("(jobs in execution)")
      t(s"run$i re-count same df")(df.count())
      drainJobs("(jobs in re-count)")
    }
    spark.stop()
  }
}
