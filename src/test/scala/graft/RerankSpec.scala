package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Rerank, RerankBackend}

/** Loader fixture: a plain no-arg class the reflective resolver must
  * accept (the object shape is covered by the default backend). */
class RerankClassFixture extends RerankBackend {
  def scoreMicros(query: String, doc: String): Long = 42L
}

/** The cross-encoder rerank seam: the default stand-in's integer
  * overlap math (what the q161 oracle mirrors), its contract edges,
  * and the property-gated swap-in path.
  */
class RerankSpec extends AnyFunSuite {

  private val B = Rerank.TokenOverlapBackend

  test("hand-computed overlap: unigram and bigram parts quantize separately") {
    // qu={a,b,c} du={a,c,d}: 2/3 unigrams -> 666666; no shared bigrams
    assert(B.scoreMicros("a b c", "a c d") == 666666L)
    // identical strings: both parts full -> exactly 2_000_000
    assert(B.scoreMicros("a b c", "a b c") == 2000000L)
    // shared bigram "b c" (1 of 2), unigrams 3/3
    assert(B.scoreMicros("a b c", "c a x b c") == 1000000L + 500000L)
  }

  test("degenerate inputs score 0, never throw") {
    assert(B.scoreMicros("", "a b") == 0L)
    assert(B.scoreMicros(null, "a b") == 0L)
    assert(B.scoreMicros("a b", null) == 0L)
    // single-token query: no bigrams -> bigram part contributes 0
    assert(B.scoreMicros("a", "a") == 1000000L)
    // duplicated tokens collapse: sets, not bags
    assert(B.scoreMicros("a a a", "a") == 1000000L)
  }

  test("token order matters only through bigrams") {
    val fwd = B.scoreMicros("a b", "a b")
    val rev = B.scoreMicros("a b", "b a")
    assert(fwd == 2000000L)
    assert(rev == 1000000L, "same unigrams, reversed bigram does not match")
  }

  test("unset property resolves to the default; a class swaps in; a typo fails fast") {
    assert(Rerank.resolveBackend(None) eq Rerank.TokenOverlapBackend)
    assert(Rerank.resolveBackend(Some(" ")) eq Rerank.TokenOverlapBackend)
    val swapped = Rerank.resolveBackend(Some(classOf[RerankClassFixture].getName))
    assert(swapped.scoreMicros("q", "d") == 42L)
    intercept[IllegalArgumentException] {
      Rerank.loadBackend("no.such.CrossEncoder")
    }
    // a resolvable class of the wrong type is rejected, not cast
    intercept[IllegalArgumentException] {
      Rerank.loadBackend("java.lang.String")
    }
  }
}
