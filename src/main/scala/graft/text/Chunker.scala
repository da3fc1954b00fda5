package graft.text

import scala.collection.mutable.ArrayBuffer

/** Recursive character text splitter — faithful re-implementation of the
  * splitting semantics the reference relies on (operator C1 in SURVEY.md §2.3;
  * reference constructs it at `/root/reference/AI.py:84` with
  * `chunk_size=1000, chunk_overlap=0` bound at `AI.py:209`, separator
  * hierarchy `["\n\n", "\n", " ", ""]` — the documented library default).
  *
  * Semantics (as documented for the public LangChain splitter):
  *  1. Pick the FIRST separator in the hierarchy that occurs in the text
  *     (the empty-string separator always matches and splits into single
  *     characters).
  *  2. Split the text on that separator, dropping empty fragments.
  *  3. Greedily merge adjacent fragments (joined by the separator) while the
  *     joined length stays <= chunkSize; each emitted chunk is stripped of
  *     leading/trailing whitespace and dropped if empty.
  *  4. Any single fragment with length >= chunkSize recurses with the
  *     remaining (finer) separators; if none remain it is emitted as-is.
  *  5. With chunkOverlap > 0, a suffix of the previous chunk's fragments
  *     (up to chunkOverlap chars) seeds the next chunk.
  *
  * This is a pure function: used from `Dataset.flatMap` in the pipeline and
  * unit/property-tested in isolation. The merge loop is O(n) in text length.
  */
object Chunker {

  val DefaultSeparators: List[String] = List("\n\n", "\n", " ", "")

  /** One produced chunk: `index` is the 0-based chunk ordinal within the
    * source document.
    */
  final case class Chunk(index: Int, text: String)

  def split(
      text: String,
      chunkSize: Int = 1000,
      chunkOverlap: Int = 0,
      separators: List[String] = DefaultSeparators): Seq[String] = {
    require(chunkSize > 0, "chunkSize must be positive")
    require(chunkOverlap >= 0 && chunkOverlap < chunkSize,
      "chunkOverlap must be in [0, chunkSize)")
    if (text == null || text.isEmpty) Seq.empty
    else splitRec(text, separators, chunkSize, chunkOverlap)
  }

  def chunks(
      text: String,
      chunkSize: Int = 1000,
      chunkOverlap: Int = 0,
      separators: List[String] = DefaultSeparators): Seq[Chunk] =
    split(text, chunkSize, chunkOverlap, separators).zipWithIndex
      .map { case (t, i) => Chunk(i, t) }

  private def splitRec(
      text: String,
      separators: List[String],
      chunkSize: Int,
      chunkOverlap: Int): Seq[String] = {
    // 1. first separator present in the text ("" always matches)
    var separator = if (separators.nonEmpty) separators.last else ""
    var remaining: List[String] = Nil
    var i = 0
    var found = false
    val seps = separators
    while (i < seps.length && !found) {
      val s = seps(i)
      if (s.isEmpty) { separator = s; remaining = Nil; found = true }
      else if (text.contains(s)) {
        separator = s; remaining = seps.drop(i + 1); found = true
      }
      i += 1
    }

    // 2. split, dropping empty fragments
    val splits: Seq[String] =
      if (separator.isEmpty) text.map(_.toString)
      else splitKeepAll(text, separator).filter(_.nonEmpty)

    // 3/4. merge good (short) fragments; recurse into over-long ones
    val out = ArrayBuffer.empty[String]
    val good = ArrayBuffer.empty[String]
    for (s <- splits) {
      if (s.length < chunkSize) good += s
      else {
        if (good.nonEmpty) {
          out ++= mergeSplits(good.toSeq, separator, chunkSize, chunkOverlap)
          good.clear()
        }
        if (remaining.isEmpty) out += s
        else out ++= splitRec(s, remaining, chunkSize, chunkOverlap)
      }
    }
    if (good.nonEmpty)
      out ++= mergeSplits(good.toSeq, separator, chunkSize, chunkOverlap)
    out.toSeq
  }

  /** `text.split(sep)` with Java semantics drops trailing empties and treats
    * the pattern as regex; we need literal, all-fragments splitting.
    */
  private def splitKeepAll(text: String, sep: String): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    var from = 0
    var idx = text.indexOf(sep, from)
    while (idx >= 0) {
      out += text.substring(from, idx)
      from = idx + sep.length
      idx = text.indexOf(sep, from)
    }
    out += text.substring(from)
    out.toSeq
  }

  private def joinDocs(docs: Seq[String], sep: String): Option[String] = {
    val joined = docs.mkString(sep).strip()
    if (joined.isEmpty) None else Some(joined)
  }

  /** Greedy merge with overlap carry-over; mirrors the documented
    * merge behavior: a fragment is flushed-before-appended when adding it
    * (plus one separator) would exceed chunkSize; after a flush, leading
    * fragments are dropped until the carried total is <= chunkOverlap and
    * the new fragment fits.
    */
  private def mergeSplits(
      splits: Seq[String],
      separator: String,
      chunkSize: Int,
      chunkOverlap: Int): Seq[String] = {
    val sepLen = separator.length
    val docs = ArrayBuffer.empty[String]
    var current = ArrayBuffer.empty[String]
    var total = 0
    for (d <- splits) {
      val len = d.length
      if (total + len + (if (current.nonEmpty) sepLen else 0) > chunkSize) {
        if (current.nonEmpty) {
          joinDocs(current.toSeq, separator).foreach(docs += _)
          while (total > chunkOverlap ||
            (total + len + (if (current.nonEmpty) sepLen else 0) > chunkSize
              && total > 0)) {
            total -= current.head.length +
              (if (current.length > 1) sepLen else 0)
            current = current.drop(1)
          }
        }
      }
      current += d
      total += len + (if (current.length > 1) sepLen else 0)
    }
    joinDocs(current.toSeq, separator).foreach(docs += _)
    docs.toSeq
  }
}
