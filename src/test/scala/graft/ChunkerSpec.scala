package graft

import graft.functions.Chunker
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class ChunkerSpec extends AnyFunSuite {

  test("short text is a single chunk") {
    assert(Chunker.split("hello world", 100, 20) == Vector("hello world"))
  }

  test("empty and null-ish inputs") {
    assert(Chunker.split("", 100, 20).isEmpty)
    assert(Chunker.split(null, 100, 20).isEmpty)
  }

  test("chunks never exceed size") {
    val text = ("word " * 500).trim
    val chunks = Chunker.split(text, 100, 20)
    assert(chunks.nonEmpty)
    chunks.foreach(c => assert(c.length <= 100, s"chunk too long: ${c.length}"))
  }

  test("paragraph separator is preferred over word splits") {
    val para1 = "a" * 60
    val para2 = "b" * 60
    val chunks = Chunker.split(s"$para1\n\n$para2", 80, 10)
    assert(chunks == Vector(para1 + "\n\n", para2))
  }

  test("overlap carries trailing fragments into the next chunk") {
    // 10 words of 6 chars (with space) => size 30, overlap 12
    val words = (0 until 10).map(i => f"w$i%04d").mkString(" ")
    val chunks = Chunker.split(words, 30, 12)
    assert(chunks.length > 1)
    // consecutive chunks share the overlap region
    chunks.sliding(2).foreach {
      case Vector(a, b) =>
        val tail = a.takeRight(12)
        // some suffix of a must be a prefix of b (separator-aligned)
        assert((1 to tail.length).exists(k => b.startsWith(a.takeRight(k))),
          s"no overlap between '$a' and '$b'")
      case _ =>
    }
  }

  test("concatenation coverage: chunks with overlaps removed rebuild the text") {
    // unique tokens make the suffix/prefix overlap detection below
    // unambiguous (repeated content would defeat the rebuild heuristic
    // even for a correct chunker)
    val rnd = new Random(42)
    var uid = 0
    (1 to 50).foreach { _ =>
      val parts = (1 to 200).map { _ =>
        rnd.nextInt(4) match {
          case 0 => " "
          case 1 => "\n"
          case 2 => "\n\n"
          case _ => { uid += 1; s"w$uid" }
        }
      }
      val text = parts.mkString
      val chunks = Chunker.splitWithCarry(text, 50, 10)
      // the carry tells exactly how many leading chars repeat the
      // previous chunk; dropping them must rebuild the text verbatim
      val rebuilt = chunks.map { case (c, carry) => c.drop(carry) }.mkString
      assert(rebuilt == text)
      // and each declared carry really is a suffix of the previous chunk
      chunks.sliding(2).foreach {
        case Vector((a, _), (b, carry)) =>
          assert(carry <= 10 && a.endsWith(b.take(carry)))
        case _ =>
      }
    }
  }

  test("deterministic: same input => same output") {
    val text = ("lorem ipsum dolor sit amet " * 100).trim
    assert(Chunker.split(text) == Chunker.split(text))
  }

  test("reference config: 1000/200 on a long doc") {
    val text = (1 to 400).map(i => s"token$i").mkString(" ")
    val chunks = Chunker.split(text) // defaults 1000/200
    assert(chunks.forall(_.length <= 1000))
    assert(chunks.length >= 3)
  }
}
