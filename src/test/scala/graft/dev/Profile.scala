package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev-only stage profiler (test scope — not part of the library). */
object Profile {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val li = graft.Tables.lineitem(spark, d)
    li.limit(1).collect()

    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"STAGE $name%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    t("scan_count")(li.count())
    t("scan_linenumber_agg")(
      li.select(col("l_linenumber").cast(StringType).as("v"))
        .groupBy("v").count().count())
    t("scan_returnflag_agg")(
      li.select(col("l_returnflag").as("v")).groupBy("v").count().count())
    t("date_format_agg")(
      li.select(date_format(col("l_shipdate"), "yyyy-MM-dd").as("v"))
        .groupBy("v").count().count())
    t("bool_agg")(
      li.select(when(col("l_linenumber") % 2 === 0, "true").otherwise("false").as("v"))
        .groupBy("v").count().count())
    t("concat_agg")(
      li.select(concat(col("l_linenumber"), lit("."), col("l_linenumber")).as("v"))
        .groupBy("v").count().count())
    t("date_format_agg_again")(
      li.select(date_format(col("l_shipdate"), "yyyy-MM-dd").as("v"))
        .groupBy("v").count().count())
    t("q42_full")(graft.SparkEntry.queries("q42_type_inference")(spark, d).count())
    t("q42_full_again")(graft.SparkEntry.queries("q42_type_inference")(spark, d).count())
    val narrow = li.select(col("l_linenumber"), col("l_returnflag"), col("l_shipdate"))
    t("narrow_repart_count")(narrow.repartition(32).count())
    val exploded = narrow.repartition(32)
      .select(explode(array(
        col("l_linenumber").cast(StringType),
        col("l_returnflag"),
        date_format(col("l_shipdate"), "yyyy-MM-dd"),
        when(col("l_linenumber") % 2 === 0, "true").otherwise("false"),
        concat(col("l_linenumber"), lit("."), col("l_linenumber")))).as("v"))
    t("explode_dict_agg")(exploded.groupBy("v").count().count())
    t("explode_dict_agg_again")(exploded.groupBy("v").count().count())
    val noRepart = narrow
      .select(explode(array(
        col("l_linenumber").cast(StringType),
        col("l_returnflag"),
        date_format(col("l_shipdate"), "yyyy-MM-dd"),
        when(col("l_linenumber") % 2 === 0, "true").otherwise("false"),
        concat(col("l_linenumber"), lit("."), col("l_linenumber")))).as("v"))
    t("norepart_dict_agg")(noRepart.groupBy("v").count().count())
    t("norepart_dict_agg_again")(noRepart.groupBy("v").count().count())
    for (q <- Seq("q54_winnow_overlap", "q20_window_topk", "q38_map_funcs",
        "q97_prepare_pipeline")) {
      t(s"$q cold")(graft.SparkEntry.queries(q)(spark, d).count())
      t(s"$q warm")(graft.SparkEntry.queries(q)(spark, d).count())
    }
    spark.stop()
  }
}
