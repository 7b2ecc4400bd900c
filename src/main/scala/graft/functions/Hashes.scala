package graft.functions

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

import scala.util.hashing.MurmurHash3

/** Deterministic hashing kernels for dedup (SURVEY.md §2.5 V5 and the
  * LLM-pipeline extensions): word shingles, MinHash signatures,
  * SimHash, and a winnowing rolling-hash document fingerprint.
  * All seeds fixed — stable across JVMs/partitions/re-runs.
  */
object Hashes {

  // ---- shingling ---------------------------------------------------

  def tokens(text: String): Array[String] =
    if (text == null) Array.empty
    else text.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty)

  /** Distinct word n-gram shingles. */
  def shingles(text: String, n: Int): Set[String] = {
    val ts = tokens(text)
    if (ts.length < n) if (ts.isEmpty) Set.empty else Set(ts.mkString(" "))
    else ts.sliding(n).map(_.mkString(" ")).toSet
  }

  /** Exact Jaccard similarity of word n-gram shingle sets. */
  def jaccardShingles(a: String, b: String, n: Int): Double = {
    val sa = shingles(a, n); val sb = shingles(b, n)
    if (sa.isEmpty && sb.isEmpty) 1.0
    else {
      val inter = sa.intersect(sb).size
      inter.toDouble / (sa.size + sb.size - inter)
    }
  }

  /** Distinct 64-bit hashes of the word n-gram shingles — the compact
    * form for inverted-index similarity joins (collision probability
    * ~ |shingles|^2 / 2^64, negligible). */
  def shingleHashes(text: String, n: Int): Array[Long] =
    shingles(text, n).map { s =>
      val h1 = MurmurHash3.stringHash(s, 0x5819)
      val h2 = MurmurHash3.stringHash(s, 0x77f3)
      (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
    }.toArray

  // ---- MinHash -----------------------------------------------------

  /** k-permutation MinHash over word n-gram shingles. Permutation i is
    * murmur3(shingle, seed=i) — universal enough for LSH banding and
    * fully deterministic. Empty docs get Int.MaxValue rows (never
    * collide with real signatures).
    */
  def minhash(text: String, k: Int, shingleN: Int): Array[Int] = {
    val sh = shingles(text, shingleN)
    val sig = Array.fill(k)(Int.MaxValue)
    sh.foreach { s =>
      var i = 0
      while (i < k) {
        val h = MurmurHash3.stringHash(s, i)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
    }
    sig
  }

  /** LSH band keys: signature sliced into `bands` rows-per-band
    * groups, each hashed to one long key. Docs sharing any band key
    * are candidate pairs. */
  def minhashBands(sig: Array[Int], bands: Int): Array[Long] = {
    require(sig.length % bands == 0, s"bands $bands must divide k ${sig.length}")
    val r = sig.length / bands
    Array.tabulate(bands) { b =>
      val h = MurmurHash3.arrayHash(sig.slice(b * r, (b + 1) * r), 0x1517)
      (b.toLong << 32) | (h.toLong & 0xffffffffL)
    }
  }

  // ---- SimHash -----------------------------------------------------

  /** 64-bit SimHash over tokens (term-frequency-weighted). Hamming
    * distance on the result approximates cosine distance on the
    * term-frequency vectors. */
  def simhash64(text: String): Long = {
    val acc = new Array[Int](64)
    tokens(text).foreach { t =>
      val h1 = MurmurHash3.stringHash(t, 0x51a7)
      val h2 = MurmurHash3.stringHash(t, 0xcafe)
      val h = (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  // ---- winnowing fingerprint ---------------------------------------

  /** Document fingerprint via winnowing (Schleimer et al. 2003):
    * rolling hashes of char k-grams, keep the min hash in each window
    * of w consecutive k-grams (rightmost on ties), dedup. A compact,
    * position-robust signature for near-dup detection.
    */
  def winnow(text: String, k: Int = 8, w: Int = 4): Array[Long] = {
    if (text == null || text.length < k) return Array.empty
    val n = text.length - k + 1
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      hs(i) = MurmurHash3.stringHash(text.substring(i, i + k), 0x77a9).toLong & 0xffffffffL
      i += 1
    }
    if (n <= w) return Array(hs.min)
    val picked = scala.collection.mutable.LinkedHashSet.empty[Long]
    i = 0
    while (i + w <= n) {
      var best = i
      var j = i
      while (j < i + w) { if (hs(j) <= hs(best)) best = j; j += 1 }
      picked += hs(best)
      i += 1
    }
    picked.toArray
  }

  // ---- codegen kernels (UTF8String -> Catalyst data) ----------------
  // Static forwarders for the native expressions in NativeHashExprs —
  // one generated-code call per row, no ScalaUDF encoder round trip on
  // the signature scans (the hottest stage of every dedup operator).

  def minhashBandsData(t: org.apache.spark.unsafe.types.UTF8String,
                       k: Int, shingleN: Int, bands: Int):
      org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      minhashBands(minhash(if (t == null) null else t.toString, k, shingleN), bands))

  def simhash64Utf8(t: org.apache.spark.unsafe.types.UTF8String): Long =
    simhash64(if (t == null) null else t.toString)

  def shingleHashesData(t: org.apache.spark.unsafe.types.UTF8String, n: Int):
      org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      shingleHashes(if (t == null) null else t.toString, n))

  def winnowData(t: org.apache.spark.unsafe.types.UTF8String, k: Int, w: Int):
      org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      winnow(if (t == null) null else t.toString, k, w))

  // ---- UDFs --------------------------------------------------------
  // The signature-scan UDFs survive only as the independent reference
  // baselines the ExpressionsSpec parity suite checks the native
  // codegen expressions against, bit-for-bit. Operators use the
  // native forms (graft.functions.hashExprs). jaccardUdf stays on the
  // hot path by design: it runs only on the tiny candidate-pair set,
  // where a per-row UDF is irrelevant.

  def minhashBandsUdf(k: Int, shingleN: Int, bands: Int): UserDefinedFunction =
    udf((s: String) => minhashBands(minhash(s, k, shingleN), bands))

  val simhashUdf: UserDefinedFunction = udf((s: String) => simhash64(s))

  def jaccardUdf(n: Int): UserDefinedFunction =
    udf((a: String, b: String) => jaccardShingles(a, b, n))

  def shingleHashesUdf(n: Int): UserDefinedFunction =
    udf((s: String) => shingleHashes(s, n))

  def winnowUdf(k: Int, w: Int): UserDefinedFunction =
    udf((s: String) => winnow(s, k, w))
}
