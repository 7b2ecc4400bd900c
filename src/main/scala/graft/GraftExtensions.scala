package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** SparkSessionExtensions entry point: makes graft's native
  * expressions available in ANY session created with
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (cluster-wide installation without code changes), equivalent to
  * calling `functions.Registry.ensure(spark)` programmatically.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    e.injectOptimizerRule(_ => SimplifyA1Roundtrips)
    e.injectFunction((FunctionIdentifier("a1_col"),
      info("a1_col", "a1_col(i) - bijective base-26 column letters"),
      (es: Seq[Expression]) => A1Col(es.head)))
    e.injectFunction((FunctionIdentifier("a1_index"),
      info("a1_index", "a1_index(s) - inverse of a1_col"),
      (es: Seq[Expression]) => A1Index(es.head)))
    e.injectFunction((FunctionIdentifier("chunk_text"),
      info("chunk_text", "chunk_text(text, size, overlap) - recursive chunker UDTF"),
      (es: Seq[Expression]) => ChunkText(es(0), es(1), es(2))))
    e.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - double dot product of float vectors"),
      (es: Seq[Expression]) => VecDot(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("vec_norm_sq"),
      info("vec_norm_sq", "vec_norm_sq(a) - squared L2 norm"),
      (es: Seq[Expression]) => VecNormSq(es.head)))
    e.injectFunction((FunctionIdentifier("vec_l2_sq"),
      info("vec_l2_sq", "vec_l2_sq(a, b) - squared L2 distance"),
      (es: Seq[Expression]) => VecL2Sq(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("embed_text"),
      info("embed_text", "embed_text(s) - deterministic unit-norm embedding"),
      (es: Seq[Expression]) => EmbedText(es.head, Embed.DefaultDim)))
    e.injectFunction((FunctionIdentifier("minhash_bands"),
      info("minhash_bands", "minhash_bands(text, k, shingle_n, bands) - LSH band keys"),
      (es: Seq[Expression]) => MinHashBands(es(0), Registry.intArg(es(1)),
        Registry.intArg(es(2)), Registry.intArg(es(3)))))
    e.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(text) - 64-bit tf-weighted SimHash"),
      (es: Seq[Expression]) => SimHash64(es.head)))
    e.injectFunction((FunctionIdentifier("shingle_hashes"),
      info("shingle_hashes", "shingle_hashes(text, n) - distinct word-shingle hashes"),
      (es: Seq[Expression]) => ShingleHashes(es(0), Registry.intArg(es(1)))))
    e.injectFunction((FunctionIdentifier("winnow_fp"),
      info("winnow_fp", "winnow_fp(text, k_gram, window) - winnowing fingerprint"),
      (es: Seq[Expression]) => WinnowFp(es(0), Registry.intArg(es(1)),
        Registry.intArg(es(2)))))
    e.injectFunction((FunctionIdentifier("lsh_buckets"),
      info("lsh_buckets", "lsh_buckets(vec, dim, bits, tables) - hyperplane LSH bucket keys"),
      (es: Seq[Expression]) => LshBuckets(es(0), Registry.intArg(es(1)),
        Registry.intArg(es(2)), Registry.intArg(es(3)))))
    e.injectFunction((FunctionIdentifier("sq8_code"),
      info("sq8_code", "sq8_code(vec) - 8-bit scalar-quantized code"),
      (es: Seq[Expression]) => Sq8Code(es.head)))
    e.injectFunction((FunctionIdentifier("sq8_factor"),
      info("sq8_factor", "sq8_factor(vec) - cosine rank factor for sq8 codes"),
      (es: Seq[Expression]) => Sq8Factor(es.head)))
    e.injectFunction((FunctionIdentifier("sq8_dot"),
      info("sq8_dot", "sq8_dot(a, b) - integer dot product of sq8 codes"),
      (es: Seq[Expression]) => Sq8Dot(es(0), es(1))))
  }
}
