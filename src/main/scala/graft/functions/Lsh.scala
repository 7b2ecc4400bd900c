package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

import scala.util.hashing.MurmurHash3

/** Deterministic random-hyperplane LSH kernel, shared by the ANN
  * query operator (VectorSearch.annLsh) and the persistent index
  * layout (IndexStore): component j of plane p of table t is a +-1
  * from murmur-derived bits — stable across JVMs, partitions and
  * sessions, so buckets written at index time match buckets computed
  * at query time. One bucket key per table, table id packed in the
  * high 32 bits.
  */
object Lsh {

  def signMatrix(dim: Int, nBits: Int, nTables: Int): Array[Array[Array[Double]]] =
    Array.tabulate(nTables, nBits, dim) { (t, p, j) =>
      if ((MurmurHash3.stringHash(s"$t:$p:$j", 0x9e37) & 1) == 0) 1.0 else -1.0
    }

  /** Bucket keys of one vector (tight loop over the sign matrix). */
  def buckets(v: Seq[Float], signs: Array[Array[Array[Double]]],
              dim: Int, nBits: Int, nTables: Int): Array[Long] =
    Array.tabulate(nTables) { t =>
      var key = 0L
      var p = 0
      while (p < nBits) {
        var dot = 0.0
        var j = 0
        val s = signs(t)(p)
        while (j < dim && j < v.length) { dot += v(j) * s(j); j += 1 }
        if (dot >= 0) key |= (1L << p)
        p += 1
      }
      (t.toLong << 32) | key
    }

  /** Column form: array<long> of bucket keys per vector. (A UDF over
    * a precomputed sign matrix — the equivalent Column expression
    * tree, tables x bits x dim nodes, made Janino compile a
    * multi-second monster method.) */
  def bucketsUdf(dim: Int, nBits: Int, nTables: Int): Column => Column = {
    val signs = signMatrix(dim, nBits, nTables)
    val f = udf { (v: Seq[Float]) => buckets(v, signs, dim, nBits, nTables) }
    (c: Column) => f(c)
  }

  /** Codegen kernel: bucket keys straight off the unsafe array data
    * (static call from LshBuckets' generated code — same math as
    * [[buckets]], no encoder round trip). */
  def bucketsData(v: org.apache.spark.sql.catalyst.util.ArrayData,
                  signs: Array[Array[Array[Double]]],
                  dim: Int, nBits: Int, nTables: Int):
      org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = v.numElements()
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var key = 0L
      var p = 0
      while (p < nBits) {
        var dot = 0.0
        var j = 0
        val s = signs(t)(p)
        while (j < dim && j < n) { dot += v.getFloat(j) * s(j); j += 1 }
        if (dot >= 0) key |= (1L << p)
        p += 1
      }
      out(t) = (t.toLong << 32) | key
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Driver-side buckets of one query vector (same kernel). */
  def queryBuckets(v: Array[Float], dim: Int, nBits: Int, nTables: Int): Array[Long] =
    buckets(scala.collection.immutable.ArraySeq.unsafeWrapArray(v),
      signMatrix(dim, nBits, nTables), dim, nBits, nTables)

  /** Multiprobe expansion: each bucket key plus its Hamming-1
    * neighbors (each of the nBits sign bits flipped) — the standard
    * neighboring-bucket probe that recovers points whose single
    * nearest hyperplane fell on the other side. The table id rides the
    * high 32 bits and is never flipped. Probes nBits+1 buckets per
    * table instead of 1. */
  def expandProbes(keys: Array[Long], nBits: Int): Array[Long] =
    keys.flatMap(k => k +: Array.tabulate(nBits)(i => k ^ (1L << i)))

  /** Driver-side multiprobe query buckets. */
  def queryBucketsMultiprobe(v: Array[Float], dim: Int, nBits: Int,
                             nTables: Int): Array[Long] =
    expandProbes(queryBuckets(v, dim, nBits, nTables), nBits)
}
