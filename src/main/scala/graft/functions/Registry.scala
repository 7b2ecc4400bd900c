package graft.functions

import org.apache.spark.sql.SparkSession

/** Registers graft's native expressions in the session function
  * registry so they are usable from SQL text as well as the Column
  * API (`exprs`). Idempotent.
  */
object Registry {

  /** Extract a plan-time integer constant from a SQL literal arg. */
  private[graft] def intArg(e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
    e.eval(null) match {
      case i: Int  => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"expected an integer literal, got $other")
    }

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
    // dedup hash kernels (int params must be literals — they bake into
    // the generated code)
    reg.createOrReplaceTempFunction("minhash_bands",
      es => MinHashBands(es(0), intArg(es(1)), intArg(es(2)), intArg(es(3))), "built-in")
    reg.createOrReplaceTempFunction("simhash64",
      es => SimHash64(es.head), "built-in")
    reg.createOrReplaceTempFunction("shingle_hashes",
      es => ShingleHashes(es(0), intArg(es(1))), "built-in")
    reg.createOrReplaceTempFunction("winnow_fp",
      es => WinnowFp(es(0), intArg(es(1)), intArg(es(2))), "built-in")
    reg.createOrReplaceTempFunction("lsh_buckets",
      es => LshBuckets(es(0), intArg(es(1)), intArg(es(2)), intArg(es(3))), "built-in")
    // SQ8 codec
    reg.createOrReplaceTempFunction("sq8_code",
      es => Sq8Code(es.head), "built-in")
    reg.createOrReplaceTempFunction("sq8_factor",
      es => Sq8Factor(es.head), "built-in")
    reg.createOrReplaceTempFunction("sq8_dot",
      es => Sq8Dot(es(0), es(1)), "built-in")
  }
}
