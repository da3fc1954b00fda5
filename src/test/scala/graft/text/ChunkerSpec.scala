package graft.text

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** C1 chunker semantics (SURVEY.md §2.3): separator hierarchy, greedy
  * merge, recursion into over-long fragments, overlap carry. Property
  * checks use seeded random corpora (the scalatest/scalacheck bridge
  * artifact is not in the offline cache, so properties are driven
  * manually and deterministically).
  */
class ChunkerSpec extends AnyFunSuite {

  private def randomText(rnd: Random, maxWords: Int = 120): String = {
    val n = rnd.nextInt(maxWords + 1)
    Seq.fill(n)(Seq.fill(1 + rnd.nextInt(12))(
      ('a' + rnd.nextInt(26)).toChar).mkString).mkString(" ")
  }

  test("empty and null-ish inputs") {
    assert(Chunker.split("") === Seq.empty)
    assert(Chunker.split(null) === Seq.empty)
    assert(Chunker.split("   ", 10) === Seq.empty) // strips to empty
  }

  test("short text is a single chunk") {
    assert(Chunker.split("hello world", 100) === Seq("hello world"))
  }

  test("greedy word packing at size boundary") {
    // "aa bb" is exactly 5 chars → fits at size 5
    assert(Chunker.split("aa bb cc dd", 5) === Seq("aa bb", "cc dd"))
    // size 4: no pair fits (2+1+2=5 > 4) → singles
    assert(Chunker.split("aa bb cc dd", 4) === Seq("aa", "bb", "cc", "dd"))
  }

  test("paragraph separator preferred over newline and space") {
    val text = "para one line a\nline b\n\npara two words here"
    val out = Chunker.split(text, 25)
    assert(out.nonEmpty)
    assert(out.forall(_.length <= 25))
    assert(out.head.startsWith("para one"))
  }

  test("character-level recursion splits unbreakable tokens") {
    val out = Chunker.split("aaaa bbbbbbbbbbbb cc", 6, separators = List(" ", ""))
    assert(out.forall(_.length <= 6))
    assert(out.mkString === "aaaabbbbbbbbbbbbcc")
  }

  test("default separators split a giant run via the '' fallback") {
    assert(Chunker.split("x" * 25, 10) === Seq("x" * 10, "x" * 10, "x" * 5))
  }

  test("overlap carries a suffix of the previous chunk") {
    val out = Chunker.split("aa bb cc dd ee", 8, chunkOverlap = 3)
    assert(out.head === "aa bb cc")
    assert(out(1).startsWith("cc"))
  }

  test("reference defaults: 1000-char chunks, zero overlap, lossless") {
    val words = (1 to 600).map(i => s"w$i").mkString(" ")
    val out = Chunker.split(words) // chunkSize=1000
    assert(out.forall(_.length <= 1000))
    assert(out.mkString(" ") === words)
  }

  test("property: overlap=0 reassembly is lossless on single-space text") {
    val rnd = new Random(42)
    (1 to 200).foreach { _ =>
      val text = randomText(rnd)
      // size > max word length: no unbreakable-token recursion, so the
      // space-joined reassembly is exact
      val size = 13 + rnd.nextInt(68)
      val chunks = Chunker.split(text, size, 0, List(" ", ""))
      assert(chunks.mkString(" ") === text.strip(),
        s"size=$size text='$text'")
    }
  }

  test("property: every chunk fits when all words fit") {
    val rnd = new Random(43)
    (1 to 200).foreach { _ =>
      val text = randomText(rnd)
      val size = 13 + rnd.nextInt(68) // max word len 12 < size
      val chunks = Chunker.split(text, size, 0)
      assert(chunks.forall(_.length <= size), s"size=$size text='$text'")
    }
  }

  test("property: greedy merge — no two adjacent chunks fit merged") {
    val rnd = new Random(44)
    (1 to 200).foreach { _ =>
      val text = randomText(rnd)
      val size = 13 + rnd.nextInt(48)
      val chunks = Chunker.split(text, size, 0, List(" ", ""))
      chunks.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a.length + 1 + b.length > size, s"size=$size '$a'|'$b'")
        case _ =>
      }
    }
  }
}
