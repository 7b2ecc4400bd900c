package graft.functions

import org.apache.spark.sql.SparkSession

/** Registers graft's native expressions in the session function
  * registry so they are usable from SQL text as well as the Column
  * API (`exprs`). Idempotent.
  */
object Registry {
  def ensure(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("a1_col",
      es => A1Col(es.head), "built-in")
    reg.createOrReplaceTempFunction("a1_index",
      es => A1Index(es.head), "built-in")
    reg.createOrReplaceTempFunction("chunk_text",
      es => ChunkText(es(0), es(1), es(2)), "built-in")
    reg.createOrReplaceTempFunction("vec_dot",
      es => VecDot(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_norm_sq",
      es => VecNormSq(es.head), "built-in")
    reg.createOrReplaceTempFunction("vec_l2_sq",
      es => VecL2Sq(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("embed_text",
      es => EmbedText(es.head, Embed.DefaultDim), "built-in")
  }
}
