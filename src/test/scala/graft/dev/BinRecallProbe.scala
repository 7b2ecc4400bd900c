package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.VectorSearch

/** Dev probe: binary-quantization recall@3 vs exact cosine per
  * overfetch, per sf, on both the isotropic fixture and the q67b
  * clustered corpus. Not a test; run via Test/runMain. */
object BinRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val d = s"/root/testdata/$sf"
      Seq("isotropic" -> Tables.embeddings(spark, d),
          "clustered" -> VectorSearch.clusteredEmb(spark, d)).foreach {
        case (kind, embRaw) =>
          val emb = embRaw.localCheckpoint()
          val qs = emb.filter(col("vec_id") < 5)
            .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
            .localCheckpoint()
          val exact = VectorSearch.knnCosine(emb, "vec_id", "embedding", qs, 3)
            .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
          Seq(64, 128, 256).foreach { of =>
            val bin = VectorSearch.knnBinary(emb, "vec_id", "embedding", qs, k = 3, overfetch = of)
              .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
            println(s"RECALL $sf $kind of=$of: ${(exact intersect bin).size}/${exact.size}")
          }
      }
    }
    spark.stop()
  }
}
