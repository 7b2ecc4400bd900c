package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal.{FakeCodec, Media}

/** Contract of the stub codec that a real decoder must also satisfy —
  * these properties are what the Spark-side plumbing (q90/q91)
  * depends on, independent of the decode implementation.
  */
class MultimodalSpec extends AnyFunSuite {

  private def blob(n: Int): Array[Byte] = Array.tabulate(n)(i => ((i * 37 + 11) % 251).toByte)

  test("features: histogram mass equals byte count, mean in [0, 255]") {
    val m = Media(1L, "png", 16, 12, blob(1000))
    val f = FakeCodec.features(m)
    assert(f.n_bytes == 1000)
    assert(f.histogram.sum == 1000L, "every byte lands in exactly one bin")
    assert(f.mean_byte >= 0.0 && f.mean_byte <= 255.0)
    // deterministic: same blob -> identical features
    assert(FakeCodec.features(m).histogram.toSeq == f.histogram.toSeq)
  }

  test("resize: exact output length, deterministic, endpoints preserved") {
    val b = blob(1000)
    val r = FakeCodec.resize(b, 128)
    assert(r.length == 128)
    assert(r.head == b.head, "first sample anchors the plane")
    assert(FakeCodec.resize(b, 128).toSeq == r.toSeq)
    assert(FakeCodec.resize(Array.emptyByteArray, 64).length == 64)
    // upsampling also yields the requested length
    assert(FakeCodec.resize(blob(10), 40).length == 40)
  }

  test("frame sampling: count follows the stride formula, frames are windows") {
    val b = blob(128)
    val frames = FakeCodec.sampleFrames(b, frameLen = 32, stride = 24)
    val expected = (0 until math.max(0, b.length - 32 + 1) by 24).size
    assert(frames.length == expected)
    assert(frames.forall(_.length == 32))
    assert(frames.head.toSeq == b.slice(0, 32).toSeq)
    // blob shorter than a frame -> no frames, not an exception
    assert(FakeCodec.sampleFrames(blob(10), 32, 24).isEmpty)
  }
}
