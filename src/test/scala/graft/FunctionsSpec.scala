package graft

import graft.functions.{A1, Embed, Hashes}
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite {

  test("a1 column letters incl. beyond the reference's ZZ limit") {
    assert(A1.colLetter(0) == "A")
    assert(A1.colLetter(25) == "Z")
    assert(A1.colLetter(26) == "AA")
    assert(A1.colLetter(51) == "AZ")
    assert(A1.colLetter(701) == "ZZ")
    assert(A1.colLetter(702) == "AAA") // reference breaks here (indexer.py:42)
    assert(A1.colLetter(18277) == "ZZZ")
  }

  test("a1 roundtrip for all indices < 18278") {
    (0 until 18278).foreach { i =>
      assert(A1.toIndex(A1.colLetter(i)) == i, s"roundtrip failed at $i")
    }
  }

  test("a1_index rejects garbage") {
    intercept[IllegalArgumentException](A1.toIndex(""))
    intercept[IllegalArgumentException](A1.toIndex("a1"))
  }

  test("embed: deterministic, unit norm, fixed dim") {
    val a = Embed.embed("the quick brown fox", 64)
    val b = Embed.embed("the quick brown fox", 64)
    assert(a.toSeq == b.toSeq)
    assert(a.length == 64)
    val norm = math.sqrt(a.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    // different text => different vector (with overwhelming probability)
    val c = Embed.embed("completely different words here", 64)
    assert(c.toSeq != a.toSeq)
    // empty text => zero vector (norm 0), not NaN
    val z = Embed.embed("", 64)
    assert(z.forall(_ == 0.0f))
  }

  test("embed similarity sanity: shared words => higher cosine") {
    def cos(x: Array[Float], y: Array[Float]): Double = {
      val dot = x.zip(y).map { case (a, b) => a.toDouble * b }.sum
      dot // inputs are unit-norm
    }
    val q = Embed.embed("spark query engine", 64)
    val near = Embed.embed("spark query engine tuning", 64)
    val far = Embed.embed("banana smoothie recipe", 64)
    assert(cos(q, near) > cos(q, far))
  }

  test("minhash: deterministic, jaccard-correlated") {
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val b = "the quick brown fox jumps over the lazy cat again and again"
    val c = "entirely unrelated content about databases and queries"
    val sa = Hashes.minhash(a, 64, 3)
    val sb = Hashes.minhash(b, 64, 3)
    val sc = Hashes.minhash(c, 64, 3)
    assert(sa.toSeq == Hashes.minhash(a, 64, 3).toSeq)
    def agree(x: Array[Int], y: Array[Int]) =
      x.zip(y).count { case (p, q) => p == q }
    assert(agree(sa, sb) > agree(sa, sc))
    // signature agreement approximates jaccard
    val jab = Hashes.jaccardShingles(a, b, 3)
    assert(math.abs(agree(sa, sb).toDouble / 64 - jab) < 0.25)
  }

  test("minhash bands: identical docs collide on all bands") {
    val s1 = Hashes.minhashBands(Hashes.minhash("aaa bbb ccc ddd", 64, 3), 16)
    val s2 = Hashes.minhashBands(Hashes.minhash("aaa bbb ccc ddd", 64, 3), 16)
    assert(s1.toSeq == s2.toSeq)
    assert(s1.length == 16)
  }

  test("simhash: near-dup texts have small hamming distance") {
    val a = Hashes.simhash64("the quick brown fox jumps over the lazy dog " * 5)
    val b = Hashes.simhash64("the quick brown fox jumps over the lazy dog " * 5 + "extra")
    val c = Hashes.simhash64("totally different subject matter entirely unrelated")
    assert(Hashes.hamming64(a, a) == 0)
    assert(Hashes.hamming64(a, b) < Hashes.hamming64(a, c))
  }

  test("winnow fingerprint: deterministic, shift-robust") {
    val doc = "some reasonably long document text for fingerprinting purposes"
    val f1 = Hashes.winnow(doc, 8, 4)
    val f2 = Hashes.winnow("PREFIX " + doc, 8, 4)
    assert(f1.toSeq == Hashes.winnow(doc, 8, 4).toSeq)
    // winnowing keeps most fingerprints under content shift
    val shared = f1.toSet.intersect(f2.toSet).size.toDouble
    assert(shared / f1.length > 0.5)
    assert(Hashes.winnow("short", 8, 4).isEmpty)
  }

  test("jaccard shingles edge cases") {
    assert(Hashes.jaccardShingles("", "", 3) == 1.0)
    assert(Hashes.jaccardShingles("a b c d", "a b c d", 3) == 1.0)
    assert(Hashes.jaccardShingles("a b c d", "x y z w", 3) == 0.0)
  }
}
