package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Recursive-separator text chunker — the reference's core transform
  * (RecursiveCharacterTextSplitter(chunk_size=1000, chunk_overlap=200),
  * /root/reference/indexer.py:62-66, :95-99), re-specified from its
  * documented contract (not translated): split on the coarsest
  * separator present, recurse into oversized pieces with finer
  * separators, then greedily merge pieces into chunks of at most
  * `size` chars, seeding each next chunk with up to `overlap` trailing
  * chars of the previous one. Separators stay attached to the piece
  * they terminate, so the concatenation-coverage property holds
  * exactly (ChunkerSpec).
  *
  * Pure, allocation-light, and driven per-row by the ChunkText
  * generator — at 100 TB this runs inside a narrow (no-shuffle)
  * whole-stage pipeline.
  */
object Chunker {

  val DefaultSeparators: List[String] = List("\n\n", "\n", " ", "")
  val DefaultSize = 1000
  val DefaultOverlap = 200

  def split(text: String,
            size: Int = DefaultSize,
            overlap: Int = DefaultOverlap,
            separators: List[String] = DefaultSeparators): Vector[String] =
    splitWithCarry(text, size, overlap, separators).map(_._1)

  /** Like split, but each chunk is paired with the number of leading
    * chars carried over from the previous chunk (its overlap). Exact
    * coverage invariant: chunks.head + tail.map(dropping carry) == text.
    */
  def splitWithCarry(text: String,
                     size: Int = DefaultSize,
                     overlap: Int = DefaultOverlap,
                     separators: List[String] = DefaultSeparators): Vector[(String, Int)] = {
    require(size > 0, s"chunk size must be positive, got $size")
    require(overlap >= 0 && overlap < size,
      s"overlap must be in [0, size), got $overlap for size $size")
    if (text == null || text.isEmpty) Vector.empty
    else merge(fragment(text, size, separators), size, overlap)
  }

  /** Phase 1: recursively cut `text` into fragments, each <= size. */
  private def fragment(text: String, size: Int,
                       seps: List[String]): Vector[String] =
    if (text.length <= size) Vector(text)
    else seps match {
      case Nil => grouped(text, size)
      case sep :: rest =>
        if (sep.isEmpty || !text.contains(sep)) fragment(text, size, rest)
        else splitKeep(text, sep).flatMap { p =>
          if (p.length <= size) Vector(p) else fragment(p, size, rest)
        }
    }

  /** Split keeping the separator attached to the preceding piece. */
  private def splitKeep(text: String, sep: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    var j = text.indexOf(sep, i)
    while (j >= 0) {
      out += text.substring(i, j + sep.length)
      i = j + sep.length
      j = text.indexOf(sep, i)
    }
    if (i < text.length) out += text.substring(i)
    out.result()
  }

  private def grouped(text: String, size: Int): Vector[String] =
    text.grouped(size).toVector

  /** Phase 2: greedy merge with overlap carry-over. Invariant: every
    * emitted chunk has length <= size (fragments are <= size and the
    * carried tail is trimmed to fit). */
  private def merge(frags: Vector[String], size: Int,
                    overlap: Int): Vector[(String, Int)] = {
    val out = Vector.newBuilder[(String, Int)]
    var cur = ArrayBuffer.empty[String]
    var curLen = 0
    var carry = 0 // chars at the head of `cur` repeated from the previous chunk
    frags.foreach { f =>
      if (curLen + f.length > size && curLen > 0) {
        out += ((cur.mkString, carry))
        // retain the longest contiguous tail of fragments that fits in
        // `overlap` chars AND leaves room for f within `size`.
        val keep = ArrayBuffer.empty[String]
        var kl = 0
        var idx = cur.length - 1
        var stop = false
        while (idx >= 0 && !stop) {
          val g = cur(idx)
          if (kl + g.length <= overlap && kl + g.length + f.length <= size) {
            g +=: keep; kl += g.length; idx -= 1
          } else stop = true
        }
        cur = keep
        curLen = kl
        carry = kl
      }
      cur += f
      curLen += f.length
    }
    if (curLen > 0) out += ((cur.mkString, carry))
    out.result()
  }
}
