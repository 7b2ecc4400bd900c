package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Dev probe: isolate where q170-style pair generation spends time —
  * baskets distinct, the aggregation-form pair explode (and its
  * ObjectHashAggregate sort-fallback sensitivity), vs the old
  * self-join form. Run:
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.dev.PairProbe"`.
  */
object PairProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // the aggregation-side pair generator this probe REJECTED (kept
    // here so the A/B stays reproducible): all a<b pairs of a sorted
    // distinct array — interpreted higher-order expression
    def sortedPairs(ids: org.apache.spark.sql.Column) =
      flatten(transform(ids, (x, i) =>
        transform(slice(ids, i + lit(2), size(ids)),
          y => struct(x.as("a"), y.as("b")))))

    val maxBasketSize = 64
    // warm the io path
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).collect()

    for (round <- 1 to 3) {
      println(s"--- round $round ---")
      val items = Tables.lineitem(spark, sfDir)
      val baskets = time("distinct+checkpoint") {
        items.select(col("l_orderkey").as("basket"),
            col("l_partkey").as("item")).distinct()
          .localCheckpoint()
      }
      val big = baskets.groupBy(col("basket"))
        .agg(count(lit(1)).as("bsz"))
        .filter(col("bsz") > maxBasketSize).select(col("basket"))
      val truncated = baskets.join(big, Seq("basket"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("basket")).orderBy(col("item"))))
        .filter(col("rn") <= maxBasketSize)
        .drop("rn")
      val capped = baskets.join(big, Seq("basket"), "left_anti")
        .unionByName(truncated)

      time("agg-form pairs") {
        noop(capped.groupBy(col("basket"))
          .agg(sort_array(collect_list(col("item"))).as("items"))
          .select(explode(sortedPairs(col("items"))).as("p"))
          .select(col("p.a").as("item_a"), col("p.b").as("item_b"))
          .groupBy(col("item_a"), col("item_b"))
          .agg(count(lit(1)).as("support")))
      }
      time("agg-form collect only") {
        noop(capped.groupBy(col("basket"))
          .agg(sort_array(collect_list(col("item"))).as("items")))
      }
      time("join-form pairs") {
        noop(capped.as("x").join(capped.as("y"),
            col("x.basket") === col("y.basket") && col("x.item") < col("y.item"))
          .select(col("x.item").as("item_a"), col("y.item").as("item_b"))
          .groupBy(col("item_a"), col("item_b"))
          .agg(count(lit(1)).as("support")))
      }
      val ckpt = capped.localCheckpoint()
      time("join-form pairs, capped checkpointed") {
        noop(ckpt.as("x").join(ckpt.as("y"),
            col("x.basket") === col("y.basket") && col("x.item") < col("y.item"))
          .select(col("x.item").as("item_a"), col("y.item").as("item_b"))
          .groupBy(col("item_a"), col("item_b"))
          .agg(count(lit(1)).as("support")))
      }

      // ---- q53/q175 shape: shingle candidate pairs ------------------
      val docs = Tables.documents(spark, sfDir)
      val base = time("shingle sigs+checkpoint") {
        docs.select(col("doc_id"), col("source"),
            graft.functions.hashExprs.shingleHashes(col("text"), 3).as("sh"))
          .repartition(spark.sparkContext.defaultParallelism)
          .localCheckpoint()
      }
      val posting = time("posting explode+checkpoint") {
        base.select(col("doc_id"), col("source"), explode(col("sh")).as("h"))
          .localCheckpoint()
      }
      val maxDf = 500
      time("shingle cand: OLD rare-inner + self-join + distinct") {
        val rare = posting.groupBy(col("source"), col("h"))
          .agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxDf).select(col("source"), col("h"))
        val cappedP = posting.join(rare, Seq("source", "h"))
        noop(cappedP.as("a").join(cappedP.as("b"),
            col("a.h") === col("b.h") && col("a.source") === col("b.source") &&
            col("a.doc_id") < col("b.doc_id"))
          .select(col("a.source").as("source"),
            col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
          .distinct())
      }
      time("shingle cand: NEW hot-anti + collect + sortedPairs") {
        val hot = posting.groupBy(col("source"), col("h"))
          .agg(count(lit(1)).as("df"))
          .filter(col("df") > maxDf).select(col("source"), col("h"))
        val cappedP = posting.join(hot, Seq("source", "h"), "left_anti")
        noop(cappedP.groupBy(col("source"), col("h"))
          .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
          .select(col("source"),
            explode(sortedPairs(col("ids"))).as("p"))
          .select(col("source"), col("p.a").as("id_a"), col("p.b").as("id_b"))
          .distinct())
      }
      time("shingle cand: hot-anti + self-join + distinct") {
        val hot = posting.groupBy(col("source"), col("h"))
          .agg(count(lit(1)).as("df"))
          .filter(col("df") > maxDf).select(col("source"), col("h"))
        val cappedP = posting.join(hot, Seq("source", "h"), "left_anti")
          .localCheckpoint()
        noop(cappedP.as("a").join(cappedP.as("b"),
            col("a.h") === col("b.h") && col("a.source") === col("b.source") &&
            col("a.doc_id") < col("b.doc_id"))
          .select(col("a.source").as("source"),
            col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
          .distinct())
      }

      // ---- q54 shape: winnow fingerprint overlap --------------------
      val raw = time("winnow sigs+checkpoint") {
        docs.select(col("doc_id"),
            graft.functions.hashExprs.winnowFp(col("text"), 8, 4).as("wf"))
          .select(col("doc_id"), size(col("wf")).as("n_fp"),
            explode(col("wf")).as("fp"))
          .repartition(spark.sparkContext.defaultParallelism)
          .localCheckpoint()
      }
      val stopFps = raw.groupBy(col("fp")).agg(count(lit(1)).as("df"))
        .filter(col("df") > 64).select(col("fp"))
      val fps = raw.join(broadcast(stopFps), Seq("fp"), "left_anti")
        .select(col("doc_id"), col("fp"), col("n_fp"))
      time("winnow: OLD self-join + pair agg") {
        noop(fps.as("a").join(fps.as("b"),
            col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
          .agg(count(lit(1)).as("n_shared"),
            min(col("a.n_fp")).as("fp_a"), min(col("b.n_fp")).as("fp_b")))
      }
      time("winnow: NEW collect + sortedPairs + pair agg") {
        noop(fps.groupBy(col("fp"))
          .agg(sort_array(collect_list(struct(col("doc_id"), col("n_fp"))))
            .as("ds"))
          .select(explode(sortedPairs(col("ds"))).as("p"))
          .groupBy(col("p.a.doc_id").as("id_a"), col("p.b.doc_id").as("id_b"))
          .agg(count(lit(1)).as("n_shared"),
            min(col("p.a.n_fp")).as("fp_a"), min(col("p.b.n_fp")).as("fp_b")))
      }
    }
    spark.stop()
  }
}
