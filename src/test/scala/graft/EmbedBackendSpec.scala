package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Embed, EmbedBackend}

/** Test fixtures for the reflective backend loader: a plain class
  * with a no-arg constructor and a Scala object — the two shapes
  * [[Embed.loadBackend]] must resolve. */
class ClassBackendFixture extends EmbedBackend {
  def embed(text: String, dim: Int): Array[Float] =
    Array.tabulate(dim)(i => if (i == 0) 1f else 0f)
}

object ObjectBackendFixture extends EmbedBackend {
  def embed(text: String, dim: Int): Array[Float] =
    Array.tabulate(dim)(i => if (i == dim - 1) 1f else 0f)
}

/** The config-gated embedding-backend seam (V1 swap-in dry run): the
  * default stays the bit-stable hashed-n-gram function, and a real
  * model (ONNX MiniLM when weights are available) swaps in via the
  * `graft.embed.backend` property without touching call sites.
  */
class EmbedBackendSpec extends AnyFunSuite {

  test("unset/blank property resolves to the hashed-n-gram default") {
    assert(Embed.resolveBackend(None) eq Embed.HashedNgramBackend)
    assert(Embed.resolveBackend(Some("")) eq Embed.HashedNgramBackend)
    assert(Embed.resolveBackend(Some("   ")) eq Embed.HashedNgramBackend)
  }

  test("Embed.embed delegates to the active backend bit-for-bit") {
    val viaFacade = Embed.embed("the quick brown fox", 64)
    val viaDefault = Embed.HashedNgramBackend.embed("the quick brown fox", 64)
    assert(viaFacade.toSeq == viaDefault.toSeq)
  }

  test("loadBackend resolves a no-arg class") {
    val b = Embed.loadBackend(classOf[ClassBackendFixture].getName)
    assert(b.embed("x", 4).toSeq == Seq(1f, 0f, 0f, 0f))
  }

  test("loadBackend resolves a Scala object via MODULE$") {
    val b = Embed.loadBackend(ObjectBackendFixture.getClass.getName)
    assert(b.embed("x", 4).toSeq == Seq(0f, 0f, 0f, 1f))
  }

  test("loadBackend resolves a Scala object by its natural (forwarder) name") {
    val natural = ObjectBackendFixture.getClass.getName.stripSuffix("$")
    val b = Embed.loadBackend(natural)
    assert(b.embed("x", 4).toSeq == Seq(0f, 0f, 0f, 1f))
  }

  test("resolveBackend dispatches a named backend end-to-end") {
    val b = Embed.resolveBackend(Some(classOf[ClassBackendFixture].getName))
    assert(b.embed("anything", 3).toSeq == Seq(1f, 0f, 0f))
  }

  test("the split-brain canary rejects a mismatched executor backend") {
    Embed.resetBackendCheckForTests()
    val e = intercept[IllegalStateException] {
      Embed.assertBackend("com.example.SomeOtherBackend")
    }
    assert(e.getMessage.contains("split-brain"))
    Embed.resetBackendCheckForTests()
    Embed.assertBackend(Embed.backend.getClass.getName) // must not throw
    Embed.resetBackendCheckForTests()
  }

  test("the canary never disarms: a later plan with a different backend still trips") {
    Embed.resetBackendCheckForTests()
    Embed.assertBackend(Embed.backend.getClass.getName) // arms the cache
    // a second plan (e.g. serialized by another driver) carrying a
    // different expected backend must STILL be rejected
    val e = intercept[IllegalStateException] {
      Embed.assertBackend("com.example.AnotherDriversBackend")
    }
    assert(e.getMessage.contains("split-brain"))
    Embed.assertBackend(Embed.backend.getClass.getName) // and matching still passes
    Embed.resetBackendCheckForTests()
  }

  test("a non-backend class fails fast with the property and class name") {
    val e = intercept[IllegalArgumentException] {
      Embed.loadBackend("java.lang.StringBuilder")
    }
    assert(e.getMessage.contains("StringBuilder"))
    assert(e.getMessage.contains(Embed.BackendProp))
    val missing = intercept[IllegalArgumentException] {
      Embed.loadBackend("com.example.DoesNotExist")
    }
    assert(missing.getMessage.contains("com.example.DoesNotExist"))
    assert(missing.getCause.isInstanceOf[ClassNotFoundException])
  }
}
