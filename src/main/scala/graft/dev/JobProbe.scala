package graft.dev

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev probe: count the scheduler WAVES a query fires — jobs, stages,
  * tasks — alongside wall time, for a named set of declared queries.
  * The many-small-jobs lifecycles (q181, q206, the streaming gates)
  * are scheduling-overhead-bound at bench SF and degrade 10-25x under
  * ambient contention (r21 driver run), so the optimization target is
  * the WAVE COUNT itself, not bytes (guide §2.6). This probe is the
  * before/after evidence for that work.
  *
  * Run: `SPARK_GRAFT_ONLY=q181_colbert_takedown,q206_positional_maintenance \
  *       sbt "runMain graft.dev.JobProbe"`
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
  *      SPARK_GRAFT_RUNS (default 2 — run 1 cold, last run warm).
  * Prints one JSON line per (query, run) with jobs/stages/tasks/sec.
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false") // match graft.Bench's session
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/root/repo/target/spark-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicLong; val stages = new AtomicLong
    val tasks = new AtomicLong
    // SPARK_GRAFT_JOBDETAIL=1 additionally prints each job's call site
    // — the per-wave attribution that tells WHICH verb fires the jobs
    val detail = sys.env.get("SPARK_GRAFT_JOBDETAIL").contains("1")
    val sites = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val siteOf = new java.util.concurrent.ConcurrentHashMap[Integer, String]()
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Integer, java.lang.Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobStart.put(e.jobId, e.time)
          if (detail) siteOf.put(e.jobId,
            e.stageInfos.lastOption.map(_.name).getOrElse("?") +
              s" [${e.stageInfos.map(_.numTasks).sum}t]")
        }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          jobs.incrementAndGet()
          if (detail) {
            val d = Option(jobStart.get(e.jobId))
              .map(t => e.time - t.longValue).getOrElse(-1L)
            sites.add(
              Option(siteOf.get(e.jobId)).getOrElse("?") + s" ${d}ms")
          }
          ()
        }
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          stages.incrementAndGet()
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          tasks.incrementAndGet()
      })
    // same session warmup as graft.Bench so run 1 is comparable
    try {
      spark.range(1000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).collect()
      val tmp = java.nio.file.Files.createTempDirectory("graft_warm")
      spark.range(10).write.mode("overwrite").parquet(s"$tmp/in")
      spark.readStream
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType))))
        .parquet(s"$tmp/in")
        .groupBy().count()
        .writeStream.outputMode("complete").format("memory")
        .queryName("graft_warm_sink")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
    } catch { case _: Throwable => }
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val runs = sys.env.get("SPARK_GRAFT_RUNS")
      .flatMap(v => scala.util.Try(v.trim.toInt).toOption)
      .filter(_ > 0).getOrElse(2)
    def drain(): (Long, Long, Long) = {
      Thread.sleep(300) // let the listener bus flush
      (jobs.getAndSet(0), stages.getAndSet(0), tasks.getAndSet(0))
    }
    drain()
    (1 to runs).foreach { run =>
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (name, _) => only.forall(_.contains(name)) }
        .foreach { case (name, fn) =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          val sec = (System.nanoTime() - t0) / 1e9
          val (j, st, tk) = drain()
          println(f"""{"probe":"jobs","query":"$name","run":$run,"sec":$sec%.3f,"jobs":$j,"stages":$st,"tasks":$tk}""")
          if (detail) {
            Iterator.continually(sites.poll()).takeWhile(_ != null)
              .zipWithIndex
              .foreach { case (site, i) =>
                println(f"[jobprobe]   job ${i + 1}%3d  $site") }
          }
        }
    }
    spark.stop()
  }
}
