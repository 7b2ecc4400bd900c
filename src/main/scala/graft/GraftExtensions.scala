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
  }
}
