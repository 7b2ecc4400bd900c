package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

import scala.util.hashing.MurmurHash3

/** Deterministic offline text embedding (SURVEY.md §2.5 V1).
  *
  * The reference embeds with ONNX all-MiniLM-L6-v2 (384-dim, unit
  * norm; /root/reference/app.py:35-36, indexer.py:11). That model is
  * unavailable offline, so this is a feature-hashing stand-in with the
  * same *contract*: pure function of the text, fixed dimension, unit
  * L2 norm, cosine/L2 comparable. Features are lowercased word
  * unigrams plus intra-word char trigrams, signed-hashed into `dim`
  * buckets (classic hashing trick), then L2-normalized. Swap-in point
  * for a real model: replace `Embed.embed` only.
  *
  * Determinism: MurmurHash3 with fixed seeds — stable across JVMs,
  * partitions and re-runs, so index builds and Verify re-runs
  * hash-match (SURVEY.md §7.3).
  */
object Embed {
  val DefaultDim = 64 // fixture dim (FIXTURES.md); 384 for MiniLM parity

  private val IdxSeed = 0x5ca1ab1e
  private val SignSeed = 0x7ee1f00d

  def embed(text: String, dim: Int): Array[Float] = {
    val v = new Array[Float](dim)
    if (text != null) {
      val toks = text.toLowerCase.split("[^\\p{L}\\p{N}]+")
      var i = 0
      while (i < toks.length) {
        val t = toks(i)
        if (t.nonEmpty) {
          addFeature(v, t, dim)
          var j = 0
          while (j + 3 <= t.length) { addFeature(v, t.substring(j, j + 3), dim); j += 1 }
        }
        i += 1
      }
    }
    normalize(v)
    v
  }

  private def addFeature(v: Array[Float], f: String, dim: Int): Unit = {
    val idx = math.floorMod(MurmurHash3.stringHash(f, IdxSeed), dim)
    val sign = if ((MurmurHash3.stringHash(f, SignSeed) & 1) == 0) 1f else -1f
    v(idx) += sign
  }

  private def normalize(v: Array[Float]): Unit = {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
    if (s > 0) {
      val inv = 1.0 / math.sqrt(s)
      i = 0
      while (i < v.length) { v(i) = (v(i) * inv).toFloat; i += 1 }
    }
  }

  /** Static entry for codegen (EmbedText expression). */
  def embedArray(s: org.apache.spark.unsafe.types.UTF8String,
                 dim: Int): org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      embed(if (s == null) "" else s.toString, dim))

  /** Native-expression column (codegen'd static call, no UDF
    * row-encoder round trip). */
  def embedCol(c: Column, dim: Int = DefaultDim): Column =
    org.apache.spark.sql.graft.shims.toColumn(
      EmbedText(org.apache.spark.sql.graft.shims.toExpression(c), dim))
}
