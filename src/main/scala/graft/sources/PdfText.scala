package graft.sources

import java.io.ByteArrayOutputStream
import java.util.zip.Inflater

/** Native text extraction for the plain-PDF subset — no external codec
  * (nothing resolves offline), just the PDF 1.x file syntax from the
  * public ISO 32000 spec: content streams stored raw or FlateDecode
  * (JDK Inflater), text via the `Tj` / `TJ` / `'` / `"` show operators
  * inside `BT..ET` blocks, literal `(..)` and hex `<..>` strings with
  * the standard escapes.
  *
  * Replaces the round-1 stub for S2 (reference behavior: PyMuPDF
  * page-concat loop, `/root/reference/AI.py:61-71`). Semantics kept:
  *  - page texts concatenated with "\n" (reference joins page.get_text()
  *    results);
  *  - ANY parse/decode failure yields "" — never an error row
  *    (`AI.py:69-71`).
  *
  * Coverage contract (documented subset): streams using filters other
  * than FlateDecode (DCT/JBIG2/crypt) are skipped. Compressed-xref
  * layouts (PDF 1.5+ `/Type/ObjStm` object streams hiding the page and
  * font dictionaries — the post-2005 producer default) ARE supported:
  * each object stream is inflated and its packed objects are expanded
  * back into classic `N 0 obj` syntax before the scan
  * ([[expandObjectStreams]]); the `/Type/XRef` cross-reference stream
  * itself needs no parsing because this extractor locates objects by
  * scanning, never by xref offset lookup. Subset/CID fonts
  * carrying a `/ToUnicode` CMap (bfchar/bfrange, 1- or 2-byte codes) are
  * decoded through it — the current font is tracked via `Tf` per content
  * stream, and font NAMES resolve through the owning page's /Resources
  * dict, INHERITED up the /Parent chain when the page has none (ISO
  * 32000 §7.7.3.4), with the file-global map as the last per-page
  * fallback. Fonts WITHOUT a ToUnicode map fall back to their simple
  * /Encoding (WinAnsiEncoding / StandardEncoding / Differences dict —
  * Annex D public tables); only fonts with neither come out as raw
  * Latin-1 bytes. Line assembly is baseline-aware: the scanner tracks
  * the CTM (`q`/`Q`/`cm`) and text line matrix (`Tm`/`Td`/`TD`/`TL`)
  * and emits a newline only when a show's device-space baseline moves
  * or an explicit next-line operator (`T*` `'` `"`) fires — so the
  * many same-line `BT..ET` runs real producers emit concatenate
  * instead of shredding one visual line into many (verified against
  * the reference's own 1.1 MB producer-generated PDF).
  */
object PdfText {

  def isPdf(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 5 &&
      bytes(0) == '%' && bytes(1) == 'P' && bytes(2) == 'D' &&
      bytes(3) == 'F' && bytes(4) == '-'

  /** Extract all text from a PDF byte array; "" on any failure.
    *
    * Font resources are scoped PER PAGE (ISO 32000 §7.8.3: resource
    * names resolve through the page's /Resources dict) — two pages that
    * both name different fonts /F1 each decode through their own
    * ToUnicode CMap. When no page structure parses (stream-only or
    * damaged files), falls back to scanning every decodable content
    * stream with a file-global font map, last-wins on name collisions.
    */
  def extract(bytes: Array[Byte]): String =
    try {
      if (!isPdf(bytes)) ""
      else {
        val s0 = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
        val spans0 = objectSpans(s0)
        // Compressed-xref files (PDF 1.5+, the post-2005 default) hide
        // their page/font dictionaries inside Flate'd /Type/ObjStm
        // object streams, invisible to the span scan. Expand each into
        // synthesized classic `N 0 obj … endobj` text appended past the
        // file end (objects inside an ObjStm are dict-only by spec —
        // §7.5.7 forbids nested streams — so none of the appended spans
        // is ever asked for a stream payload), then rescan. The xref
        // stream itself (/Type/XRef) needs no parsing at all: this
        // extractor locates objects by scanning, not by offset lookup.
        val expansion =
          try expandObjectStreams(bytes, s0, spans0)
          catch { case _: Throwable => "" }
        val (bs, s, spans) =
          if (expansion.isEmpty) (bytes, s0, spans0)
          else {
            val es = s0 + expansion
            (es.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1),
              es, objectSpans(es))
          }
        extractFrom(bs, s, spans)
      }
    } catch { case _: Throwable => "" }

  /** [[extract]]'s body over an (possibly ObjStm-expanded) byte/string/
    * span universe.
    */
  private def extractFrom(bytes: Array[Byte], s: String,
      spans: Map[Int, (Int, Int)]): String =
    try {
      {
        val structured =
          try pageStructures(s, spans)
          catch { case _: Throwable => Seq.empty }
        // shared font objects parse once even when many pages name them
        val cmapCache = scala.collection.mutable.Map.empty[Int, Option[CMap]]
        def fontsFor(refs: Map[String, Int]): Map[String, CMap] =
          try refs.flatMap { case (name, objN) =>
            cmapCache.getOrElseUpdate(objN,
              resolveFontCMap(bytes, s, spans, objN)).map(name -> _)
          } catch { case _: Throwable => Map.empty }
        // last-resort per-page fallback when neither the page nor its
        // /Parent chain yields font resources: the file-global map
        lazy val globalFonts: Map[String, CMap] =
          try fontCMaps(bytes) catch { case _: Throwable => Map.empty }
        val structuredPages = structured.flatMap { case (contents, fontRefs) =>
          val data = contents.flatMap(o =>
            spans.get(o).flatMap(sp => objectStreamPayload(bytes, s, sp)))
          if (data.isEmpty) None
          else {
            // multiple /Contents streams of one page form ONE logical
            // stream (§7.8.2); the subset joins them on a token boundary
            val text = data.map(d => new String(d,
              java.nio.charset.StandardCharsets.ISO_8859_1)).mkString("\n")
            if (text.contains("BT") && text.contains("ET")) {
              val pageFonts = fontsFor(fontRefs)
              val t = extractTextOps(text,
                if (pageFonts.nonEmpty) pageFonts else globalFonts)
              if (t.nonEmpty) Some(t) else None
            } else None
          }
        }
        if (structuredPages.nonEmpty) structuredPages.mkString("\n")
        else {
          val fonts = try fontCMaps(bytes) catch { case _: Throwable =>
            Map.empty[String, CMap] } // broken font program never loses the page
          val pages = contentStreams(bytes).flatMap { data =>
            val cs = new String(data,
              java.nio.charset.StandardCharsets.ISO_8859_1)
            if (cs.contains("BT") && cs.contains("ET")) {
              val t = extractTextOps(cs, fonts)
              if (t.nonEmpty) Some(t) else None
            } else None
          }
          pages.mkString("\n")
        }
      }
    } catch { case _: Throwable => "" }

  /** Synthesized classic-syntax text for every object packed inside a
    * `/Type /ObjStm` object stream (ISO 32000 §7.5.7): the stream
    * payload opens with `/N` pairs of `objnum offset` integers, object
    * bodies start at `/First + offset`. Each becomes
    * `\nN 0 obj\n<body>\nendobj\n` for appending to the scan universe.
    * Malformed headers/offsets skip that stream (or object) — the
    * error→"" contract never rides on an ObjStm parsing.
    */
  private[sources] def expandObjectStreams(bytes: Array[Byte], s: String,
      spans: Map[Int, (Int, Int)]): String = {
    val objStmRe = "/Type\\s*/ObjStm\\b".r
    val pieces = spans.toSeq.sortBy(_._2._1).flatMap { case (_, (a, b)) =>
      // the stream dictionary sits between the object header and the
      // `stream` keyword
      val sk = s.indexOf("stream", a)
      if (sk < 0 || sk >= b) None
      else {
        val dict = s.substring(a, sk)
        if (objStmRe.findFirstIn(dict).isEmpty) None
        else for {
          payload <- objectStreamPayload(bytes, s, (a, b))
          n <- "/N\\s+(\\d+)".r.findFirstMatchIn(dict)
            .flatMap(_.group(1).toIntOption)
          first <- "/First\\s+(\\d+)".r.findFirstMatchIn(dict)
            .flatMap(_.group(1).toIntOption)
          if first >= 0 && first <= payload.length
        } yield {
          val ps = new String(payload,
            java.nio.charset.StandardCharsets.ISO_8859_1)
          val pairs = "\\d+".r.findAllMatchIn(ps.substring(0, first))
            .flatMap(_.matched.toIntOption)
            .grouped(2).collect { case Seq(objN, off) => (objN, off) }
            .take(n).toSeq
          pairs.zipWithIndex.map { case ((objN, off), idx) =>
            val start = first.toLong + off
            val end = pairs.lift(idx + 1)
              .map(p => first.toLong + p._2).getOrElse(ps.length.toLong)
            if (start >= 0 && start <= end && end <= ps.length)
              s"\n$objN 0 obj\n${ps.substring(start.toInt, end.toInt)}\nendobj\n"
            else ""
          }.mkString
        }
      }
    }
    pieces.mkString
  }

  /** Object number → body span, for every `N G obj … endobj` in the file. */
  private def objectSpans(s: String): Map[Int, (Int, Int)] =
    "(\\d+)\\s+\\d+\\s+obj\\b".r.findAllMatchIn(s).flatMap { m =>
      val end = s.indexOf("endobj", m.end)
      if (end < 0) None else Some(m.group(1).toInt -> ((m.end, end)))
    }.toMap

  /** The balanced `<< … >>` starting at (or after whitespace from)
    * `from`, or None when none opens there. Forward twin of
    * [[dictBefore]] — tolerates nested dictionaries.
    */
  private def balancedDictAt(s: String, from: Int): Option[String] = {
    var i = from
    while (i < s.length && s.charAt(i).isWhitespace) i += 1
    if (i + 1 >= s.length || s.charAt(i) != '<' || s.charAt(i + 1) != '<')
      return None
    val start = i
    var depth = 0
    while (i + 1 < s.length) {
      if (s.charAt(i) == '<' && s.charAt(i + 1) == '<') { depth += 1; i += 2 }
      else if (s.charAt(i) == '>' && s.charAt(i + 1) == '>') {
        depth -= 1; i += 2
        if (depth == 0) return Some(s.substring(start, i))
      } else i += 1
    }
    None
  }

  /** Dictionary text of a value that may be inline (`<<…>>`) or an
    * indirect reference (`N 0 R`), read at `from` within `body`.
    */
  private def dictValueAt(body: String, from: Int, s: String,
      spans: Map[Int, (Int, Int)]): Option[String] =
    balancedDictAt(body, from).orElse {
      "^\\s*(\\d+)\\s+\\d+\\s+R".r.findFirstMatchIn(body.substring(from))
        .flatMap(m => spans.get(m.group(1).toInt)
          .map { case (a, b) => s.substring(a, b) })
    }

  /** Page objects (`/Type /Page`) in file order, each as (content-stream
    * object numbers, font-resource-name → font object number). Pages
    * whose /Contents cannot be resolved are dropped (the caller falls
    * back to the stream scan when nothing resolves).
    */
  private[sources] def pageStructures(s: String,
      spans: Map[Int, (Int, Int)]): Seq[(Seq[Int], Map[String, Int])] = {
    val refRe = "/(\\w+)\\s+(\\d+)\\s+\\d+\\s+R".r
    val pageRe = "/Type\\s*/Page\\b".r
    spans.toSeq.sortBy(_._2._1).flatMap { case (_, (a, b)) =>
      val body = s.substring(a, b)
      if (pageRe.findFirstIn(body).isEmpty) None
      else {
        val contents: Seq[Int] =
          "/Contents\\s+(\\d+)\\s+\\d+\\s+R".r.findFirstMatchIn(body)
            .map(m => Seq(m.group(1).toInt))
            .orElse("(?s)/Contents\\s*\\[(.*?)\\]".r.findFirstMatchIn(body)
              .map(m => "(\\d+)\\s+\\d+\\s+R".r.findAllMatchIn(m.group(1))
                .map(_.group(1).toInt).toSeq))
            .getOrElse(Seq.empty)
        val fontRefs: Map[String, Int] = resolveFontRefs(body, s, spans, 0)
        if (contents.isEmpty) None else Some((contents, fontRefs))
      }
    }
  }

  /** Font resources of a page, honoring INHERITANCE: /Resources is an
    * inheritable page-tree attribute (ISO 32000 §7.7.3.4), so a page
    * without its own /Resources — or whose /Resources carries no /Font —
    * takes the nearest ancestor's, found by walking `/Parent N 0 R`
    * links up the /Pages tree. Depth-capped so a cyclic parent chain in
    * a corrupt file terminates.
    */
  private def resolveFontRefs(body: String, s: String,
      spans: Map[Int, (Int, Int)], depth: Int): Map[String, Int] = {
    val refRe = "/(\\w+)\\s+(\\d+)\\s+\\d+\\s+R".r
    val own = for {
      resIdx <- Some(body.indexOf("/Resources")).filter(_ >= 0)
      res <- dictValueAt(body, resIdx + "/Resources".length, s, spans)
      fontIdx <- Some(res.indexOf("/Font")).filter(_ >= 0)
      fd <- dictValueAt(res, fontIdx + "/Font".length, s, spans)
      m = refRe.findAllMatchIn(fd)
        .map(nm => nm.group(1) -> nm.group(2).toInt).toMap
      if m.nonEmpty
    } yield m
    own.getOrElse {
      if (depth >= 16) Map.empty
      else "/Parent\\s+(\\d+)\\s+\\d+\\s+R".r.findFirstMatchIn(body)
        .flatMap(m => spans.get(m.group(1).toInt))
        .map { case (a, b) =>
          resolveFontRefs(s.substring(a, b), s, spans, depth + 1) }
        .getOrElse(Map.empty)
    }
  }

  /** Follow one font object's `/ToUnicode N 0 R` to its parsed CMap. */
  private def resolveToUnicode(bytes: Array[Byte], s: String,
      spans: Map[Int, (Int, Int)], fontObj: Int): Option[CMap] =
    for {
      span <- spans.get(fontObj)
      tou <- "/ToUnicode\\s+(\\d+)\\s+\\d+\\s+R".r
        .findFirstMatchIn(s.substring(span._1, span._2)).map(_.group(1).toInt)
      tspan <- spans.get(tou)
      payload <- objectStreamPayload(bytes, s, tspan)
      cmap <- parseCMap(new String(payload,
        java.nio.charset.StandardCharsets.ISO_8859_1))
    } yield cmap

  /** Full per-font decode resolution: a /ToUnicode CMap when the font
    * carries one, else a simple-font /Encoding fallback (WinAnsi /
    * Standard / encoding dict with /Differences — ISO 32000 §9.6.5 +
    * Annex D, public tables). Fonts with neither stay unmapped (raw
    * Latin-1 bytes), the spec-only floor.
    */
  private def resolveFontCMap(bytes: Array[Byte], s: String,
      spans: Map[Int, (Int, Int)], fontObj: Int): Option[CMap] =
    resolveToUnicode(bytes, s, spans, fontObj).orElse {
      spans.get(fontObj).flatMap { case (a, b) =>
        encodingCMap(s.substring(a, b), s, spans)
      }
    }

  /** WinAnsiEncoding's departures from Latin-1 (cp1252's 0x80–0x9F
    * block, ISO 32000 Annex D.2): every other code is Latin-1 identity,
    * which the raw-byte fallback already yields.
    */
  private[sources] val winAnsiDiffs: Map[Int, String] = Map(
    0x80 -> "€", 0x82 -> "‚", 0x83 -> "ƒ", 0x84 -> "„",
    0x85 -> "…", 0x86 -> "†", 0x87 -> "‡", 0x88 -> "ˆ",
    0x89 -> "‰", 0x8A -> "Š", 0x8B -> "‹", 0x8C -> "Œ",
    0x8E -> "Ž", 0x91 -> "‘", 0x92 -> "’", 0x93 -> "“",
    0x94 -> "”", 0x95 -> "•", 0x96 -> "–", 0x97 -> "—",
    0x98 -> "˜", 0x99 -> "™", 0x9A -> "š", 0x9B -> "›",
    0x9C -> "œ", 0x9E -> "ž", 0x9F -> "Ÿ")

  /** Adobe StandardEncoding's departures from Latin-1 (ISO 32000 Annex
    * D.2, octal column): quotes at 0x27/0x60 plus the 0xA1–0xFB block.
    */
  private[sources] val standardDiffs: Map[Int, String] = Map(
    0x27 -> "’", 0x60 -> "‘",
    0xA4 -> "⁄", 0xA6 -> "ƒ", 0xA8 -> "¤", 0xA9 -> "’",
    0xAA -> "“", 0xAC -> "‹", 0xAD -> "›", 0xAE -> "ﬁ",
    0xAF -> "ﬂ", 0xB1 -> "–", 0xB2 -> "†", 0xB3 -> "‡",
    0xB4 -> "·", 0xB7 -> "•", 0xB8 -> "‚", 0xB9 -> "„",
    0xBA -> "”", 0xBC -> "…", 0xBD -> "‰",
    0xC1 -> "`", 0xC2 -> "´", 0xC3 -> "ˆ", 0xC4 -> "˜",
    0xC5 -> "¯", 0xC6 -> "˘", 0xC7 -> "˙", 0xC8 -> "¨",
    0xCA -> "˚", 0xCB -> "¸", 0xCD -> "˝", 0xCE -> "˛",
    0xCF -> "ˇ", 0xD0 -> "—",
    0xE1 -> "Æ", 0xE3 -> "ª", 0xE8 -> "Ł", 0xE9 -> "Ø",
    0xEA -> "Œ", 0xEB -> "º", 0xF1 -> "æ", 0xF5 -> "ı",
    0xF8 -> "ł", 0xF9 -> "ø", 0xFA -> "œ", 0xFB -> "ß")

  /** Glyph-name → Unicode for /Differences arrays: the Adobe Glyph List
    * subset covering ASCII names, the Annex D specials, and common
    * Latin-1 accents. Unknown names are skipped (raw fallback).
    */
  private[sources] val glyphNames: Map[String, String] = Map(
    "space" -> " ", "exclam" -> "!", "quotedbl" -> "\"",
    "numbersign" -> "#", "dollar" -> "$", "percent" -> "%",
    "ampersand" -> "&", "quotesingle" -> "'", "parenleft" -> "(",
    "parenright" -> ")", "asterisk" -> "*", "plus" -> "+", "comma" -> ",",
    "hyphen" -> "-", "period" -> ".", "slash" -> "/", "colon" -> ":",
    "semicolon" -> ";", "less" -> "<", "equal" -> "=", "greater" -> ">",
    "question" -> "?", "at" -> "@", "bracketleft" -> "[",
    "backslash" -> "\\", "bracketright" -> "]", "asciicircum" -> "^",
    "underscore" -> "_", "grave" -> "`", "braceleft" -> "{", "bar" -> "|",
    "braceright" -> "}", "asciitilde" -> "~",
    "quoteright" -> "’", "quoteleft" -> "‘",
    "quotedblleft" -> "“", "quotedblright" -> "”",
    "quotesinglbase" -> "‚", "quotedblbase" -> "„",
    "endash" -> "–", "emdash" -> "—", "bullet" -> "•",
    "dagger" -> "†", "daggerdbl" -> "‡", "ellipsis" -> "…",
    "perthousand" -> "‰", "fi" -> "ﬁ", "fl" -> "ﬂ",
    "fraction" -> "⁄", "florin" -> "ƒ",
    "exclamdown" -> "¡", "questiondown" -> "¿",
    "cent" -> "¢", "sterling" -> "£", "yen" -> "¥",
    "currency" -> "¤", "section" -> "§", "paragraph" -> "¶",
    "periodcentered" -> "·", "guillemotleft" -> "«",
    "guillemotright" -> "»", "guilsinglleft" -> "‹",
    "guilsinglright" -> "›", "trademark" -> "™",
    "copyright" -> "©", "registered" -> "®",
    "degree" -> "°", "plusminus" -> "±", "mu" -> "µ",
    "AE" -> "Æ", "ae" -> "æ", "OE" -> "Œ", "oe" -> "œ",
    "Oslash" -> "Ø", "oslash" -> "ø", "Lslash" -> "Ł",
    "lslash" -> "ł", "germandbls" -> "ß", "dotlessi" -> "ı",
    "ordfeminine" -> "ª", "ordmasculine" -> "º",
    "circumflex" -> "ˆ", "tilde" -> "˜", "macron" -> "¯",
    "breve" -> "˘", "dotaccent" -> "˙", "dieresis" -> "¨",
    "ring" -> "˚", "cedilla" -> "¸", "hungarumlaut" -> "˝",
    "ogonek" -> "˛", "caron" -> "ˇ", "acute" -> "´",
    "Euro" -> "€", "Scaron" -> "Š", "scaron" -> "š",
    "Zcaron" -> "Ž", "zcaron" -> "ž", "Ydieresis" -> "Ÿ",
    "Agrave" -> "À", "Aacute" -> "Á", "Adieresis" -> "Ä",
    "Ccedilla" -> "Ç", "Eacute" -> "É", "Egrave" -> "È",
    "Ntilde" -> "Ñ", "Odieresis" -> "Ö", "Udieresis" -> "Ü",
    "agrave" -> "à", "aacute" -> "á", "acircumflex" -> "â",
    "adieresis" -> "ä", "aring" -> "å", "ccedilla" -> "ç",
    "eacute" -> "é", "egrave" -> "è", "ecircumflex" -> "ê",
    "edieresis" -> "ë", "iacute" -> "í", "igrave" -> "ì",
    "ntilde" -> "ñ", "oacute" -> "ó", "ograve" -> "ò",
    "ocircumflex" -> "ô", "odieresis" -> "ö", "uacute" -> "ú",
    "ugrave" -> "ù", "udieresis" -> "ü", "yacute" -> "ý") ++
    (('A' to 'Z') ++ ('a' to 'z')).map(c => c.toString -> c.toString).toMap ++
    Seq("zero", "one", "two", "three", "four", "five", "six", "seven",
      "eight", "nine").zipWithIndex.map { case (n, i) => n -> i.toString }

  private def baseEncodingTable(name: String): Option[Map[Int, String]] =
    name match {
      case "WinAnsiEncoding" => Some(winAnsiDiffs)
      case "StandardEncoding" => Some(standardDiffs)
      // MacRomanEncoding: outside the subset (rare in modern producers) —
      // its Differences-dict form still resolves through glyphNames
      case _ => None
    }

  /** `[ 128 /Adieresis /quotesinglbase 245 /dotlessi … ]`: a number
    * sets the next code, each following name consumes one code.
    */
  private[sources] def parseDifferences(enc: String): Map[Int, String] = {
    "(?s)/Differences\\s*\\[(.*?)\\]".r.findFirstMatchIn(enc).map { dm =>
      val out = Map.newBuilder[Int, String]
      var code = -1
      "(\\d+)|/([\\w.]+)".r.findAllMatchIn(dm.group(1)).foreach { t =>
        if (t.group(1) != null) code = t.group(1).toInt
        else if (code >= 0 && code <= 0xFF) {
          glyphNames.get(t.group(2)).foreach(u => out += code -> u)
          code += 1
        }
      }
      out.result()
    }.getOrElse(Map.empty)
  }

  /** Simple-font /Encoding → 1-byte CMap: a bare name
    * (`/Encoding /WinAnsiEncoding`) selects a base table; a dict form
    * (inline or indirect) layers /Differences over its /BaseEncoding.
    * Only the departures from Latin-1 are materialized — unmapped codes
    * fall back to the raw byte, which IS the Latin-1 glyph.
    */
  private[sources] def encodingCMap(fontBody: String, s: String,
      spans: Map[Int, (Int, Int)]): Option[CMap] = {
    val encIdx = fontBody.indexOf("/Encoding")
    if (encIdx < 0) return None
    val after = encIdx + "/Encoding".length
    "^\\s*/(\\w+)".r.findFirstMatchIn(fontBody.substring(after)) match {
      case Some(m) => baseEncodingTable(m.group(1)).map(CMap(1, _))
      case None =>
        dictValueAt(fontBody, after, s, spans).flatMap { enc =>
          val base = "/BaseEncoding\\s*/(\\w+)".r.findFirstMatchIn(enc)
            .flatMap(m => baseEncodingTable(m.group(1)))
            .getOrElse(Map.empty[Int, String])
          val merged = base ++ parseDifferences(enc)
          if (merged.isEmpty) None else Some(CMap(1, merged))
        }
    }
  }

  /** A font's ToUnicode mapping: `codeBytes` (1 for simple fonts, 2 for
    * CID-keyed) string-byte codes → Unicode text (UTF-16BE in the CMap,
    * possibly multi-unit, e.g. ligatures).
    */
  private[sources] final case class CMap(codeBytes: Int, map: Map[Int, String])

  /** FILE-GLOBAL resource-name → ToUnicode CMap — the fallback for
    * files without a parseable page tree: scan every `/Font << /F1 5 0 R
    * … >>` resource dict in the file (last-wins on resource-name
    * collisions), follow each font object's `/ToUnicode N 0 R` to its
    * (possibly Flate'd) CMap stream, parse bfchar/bfrange. Fonts without
    * ToUnicode are simply absent (raw-byte fallback). Files WITH a page
    * tree get per-page resource scoping in [[extract]] instead.
    */
  private[sources] def fontCMaps(bytes: Array[Byte]): Map[String, CMap] = {
    val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val spans = objectSpans(s)
    val nameRe = "/(\\w+)\\s+(\\d+)\\s+\\d+\\s+R".r
    val fontNameToObj = "(?s)/Font\\s*<<(.*?)>>".r.findAllMatchIn(s)
      .flatMap(fd => nameRe.findAllMatchIn(fd.group(1))
        .map(nm => nm.group(1) -> nm.group(2).toInt))
      .toMap
    fontNameToObj.flatMap { case (name, objN) =>
      resolveFontCMap(bytes, s, spans, objN).map(name -> _)
    }
  }

  /** Decoded stream payload of the object at `span`, honoring a direct
    * /Length and FlateDecode exactly like `contentStreams`.
    */
  private def objectStreamPayload(
      bytes: Array[Byte], s: String, span: (Int, Int)): Option[Array[Byte]] = {
    val sk = s.indexOf("stream", span._1)
    if (sk < 0 || sk >= span._2) return None
    val dict = s.substring(span._1, sk)
    var dataStart = sk + "stream".length
    if (dataStart < bytes.length && bytes(dataStart) == '\r') dataStart += 1
    if (dataStart < bytes.length && bytes(dataStart) == '\n') dataStart += 1
    val end = directLength(dict)
      .map(n => dataStart + n)
      .filter(e => e <= span._2 && startsWithSkippingEol(bytes, "endstream", e))
      .orElse {
        val e = indexOf(bytes, "endstream", dataStart)
        if (e < 0 || e > span._2) None
        else {
          var de = e
          if (de > dataStart && bytes(de - 1) == '\n') de -= 1
          if (de > dataStart && bytes(de - 1) == '\r') de -= 1
          Some(de)
        }
      }
    end.flatMap { de =>
      val raw = java.util.Arrays.copyOfRange(bytes, dataStart, de)
      if (dict.contains("/FlateDecode")) inflate(raw)
      else if (!dict.contains("/Filter")) Some(raw)
      else None
    }
  }

  private def startsWithSkippingEol(
      hay: Array[Byte], needle: String, at: Int): Boolean = {
    var p = at
    while (p < hay.length && (hay(p) == '\r' || hay(p) == '\n' ||
      hay(p) == ' ' || hay(p) == '\t')) p += 1
    startsWith(hay, needle, p)
  }

  /** Parse bfchar/bfrange sections of a ToUnicode CMap. Destinations are
    * UTF-16BE hex; bfrange supports both the incrementing `<lo> <hi>
    * <dst>` and the array `<lo> <hi> [<d0> <d1> …]` forms.
    */
  private[sources] def parseCMap(cm: String): Option[CMap] = {
    val map = scala.collection.mutable.Map.empty[Int, String]
    var codeBytes = 1
    def noteSrc(hex: String): Unit =
      codeBytes = math.max(codeBytes, hex.length / 2)
    for (block <- "(?s)beginbfchar(.*?)endbfchar".r.findAllMatchIn(cm))
      "<([0-9A-Fa-f]+)>\\s*<([0-9A-Fa-f]+)>".r
        .findAllMatchIn(block.group(1)).foreach { m =>
          noteSrc(m.group(1))
          map(Integer.parseInt(m.group(1), 16)) = utf16be(m.group(2))
        }
    for (block <- "(?s)beginbfrange(.*?)endbfrange".r.findAllMatchIn(cm)) {
      // incrementing form
      "<([0-9A-Fa-f]+)>\\s*<([0-9A-Fa-f]+)>\\s*<([0-9A-Fa-f]+)>".r
        .findAllMatchIn(block.group(1)).foreach { m =>
          noteSrc(m.group(1))
          val lo = Integer.parseInt(m.group(1), 16)
          val hi = Integer.parseInt(m.group(2), 16)
          val d0 = Integer.parseInt(m.group(3), 16)
          var c = lo
          while (c <= hi && c - lo <= 0xFFFF) { // bound a corrupt range
            map(c) = new String(Character.toChars(d0 + (c - lo)))
            c += 1
          }
        }
      // array form
      "<([0-9A-Fa-f]+)>\\s*<([0-9A-Fa-f]+)>\\s*\\[([^\\]]*)\\]".r
        .findAllMatchIn(block.group(1)).foreach { m =>
          noteSrc(m.group(1))
          val lo = Integer.parseInt(m.group(1), 16)
          "<([0-9A-Fa-f]+)>".r.findAllMatchIn(m.group(3)).zipWithIndex
            .foreach { case (d, i) => map(lo + i) = utf16be(d.group(1)) }
        }
    }
    if (map.isEmpty) None else Some(CMap(codeBytes, map.toMap))
  }

  /** Hex → UTF-16BE string (4 hex digits per code unit; odd-length
    * prefixes from sloppy writers are left-padded).
    */
  private def utf16be(hex: String): String = {
    val h = if (hex.length % 4 == 0) hex
      else ("0" * (4 - hex.length % 4)) + hex
    val sb = new StringBuilder
    var i = 0
    while (i + 4 <= h.length) {
      sb.append(Integer.parseInt(h.substring(i, i + 4), 16).toChar)
      i += 4
    }
    sb.result()
  }

  /** All decodable stream payloads, in file order (= page order for the
    * linearly-written PDFs this subset targets).
    */
  private def contentStreams(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val out = Seq.newBuilder[Array[Byte]]
    var pos = 0
    while (pos >= 0 && pos < bytes.length) {
      val sk = indexOf(bytes, "stream", pos)
      if (sk < 0) pos = -1
      else {
        // a REAL stream keyword sits right after its dictionary's ">>"
        // and is followed by an EOL (ISO 32000 §7.3.8); the bare word
        // "stream" inside a string/name (or the tail of "endstream")
        // fails one of the checks and is skipped without consuming
        // anything downstream
        val dict = dictBefore(bytes, sk)
        val afterKw = sk + "stream".length
        val eolAfter = afterKw < bytes.length &&
          (bytes(afterKw) == '\r' || bytes(afterKw) == '\n')
        if (dict.isEmpty || !eolAfter) {
          pos = afterKw
        } else {
          var dataStart = afterKw
          if (dataStart < bytes.length && bytes(dataStart) == '\r') dataStart += 1
          if (dataStart < bytes.length && bytes(dataStart) == '\n') dataStart += 1
          // stream extent: trust a DIRECT /Length when the bytes at
          // dataStart + length are followed by `endstream` (so a payload
          // that happens to contain the literal bytes "endstream" is not
          // truncated); an indirect (`N 0 R`) or inconsistent /Length
          // falls back to the scan, as before
          val byLength = directLength(dict).flatMap { n =>
            val e = dataStart.toLong + n
            if (e > bytes.length) None
            else {
              var p = e.toInt
              while (p < bytes.length && (bytes(p) == '\r' || bytes(p) == '\n' ||
                bytes(p) == ' ' || bytes(p) == '\t')) p += 1
              if (startsWith(bytes, "endstream", p)) Some((e.toInt, p)) else None
            }
          }
          val bounds = byLength.orElse {
            val end = indexOf(bytes, "endstream", dataStart)
            if (end < 0) None
            else {
              var dataEnd = end
              if (dataEnd > dataStart && bytes(dataEnd - 1) == '\n') dataEnd -= 1
              if (dataEnd > dataStart && bytes(dataEnd - 1) == '\r') dataEnd -= 1
              Some((dataEnd, end))
            }
          }
          bounds match {
            case None => pos = -1
            case Some((dataEnd, kwPos)) =>
              val raw = java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd)
              if (dict.contains("/FlateDecode")) inflate(raw).foreach(out += _)
              else if (!dict.contains("/Filter")) out += raw
              // other filters: outside the subset — skip the stream
              pos = kwPos + "endstream".length
          }
        }
      }
    }
    out.result()
  }

  private def dictBefore(bytes: Array[Byte], streamKw: Int): String = {
    // walk back to the matching "<<" of the ">>" immediately before
    // `stream`, tolerating nested dictionaries
    var i = streamKw - 1
    while (i > 0 && (bytes(i) == ' ' || bytes(i) == '\r' || bytes(i) == '\n' ||
      bytes(i) == '\t')) i -= 1
    if (i < 1 || bytes(i) != '>' || bytes(i - 1) != '>') return ""
    var depth = 1
    var j = i - 2
    while (j > 0 && depth > 0) {
      if (bytes(j) == '>' && bytes(j - 1) == '>') { depth += 1; j -= 2 }
      else if (bytes(j) == '<' && bytes(j - 1) == '<') { depth -= 1; j -= 2 }
      else j -= 1
    }
    new String(bytes, j + 1, i + 1 - (j + 1),
      java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  private def inflate(data: Array[Byte]): Option[Array[Byte]] =
    try {
      val inf = new Inflater()
      inf.setInput(data)
      val out = new ByteArrayOutputStream(math.max(64, data.length * 4))
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (n == 0 && !inf.finished()) return None // stalled: corrupt
      }
      val complete = inf.finished()
      inf.end()
      // truncated input (needsInput before the final block) is corrupt,
      // not a shorter page — all-or-skip
      if (complete) Some(out.toByteArray) else None
    } catch { case _: Throwable => None }

  /** A direct (inline-integer) /Length from a stream dictionary; None for
    * indirect references (`/Length 5 0 R`) or when absent.
    */
  private def directLength(dict: String): Option[Int] =
    "/Length\\s+(\\d+)(\\s+\\d+\\s+R)?".r.findFirstMatchIn(dict)
      .filter(_.group(2) == null)
      .flatMap(m => m.group(1).toIntOption)

  private def startsWith(hay: Array[Byte], needle: String, at: Int): Boolean = {
    if (at < 0 || at + needle.length > hay.length) return false
    var j = 0
    while (j < needle.length) {
      if (hay(at + j) != needle.charAt(j)) return false
      j += 1
    }
    true
  }

  private def indexOf(hay: Array[Byte], needle: String, from: Int): Int = {
    val n = needle.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    var i = math.max(from, 0)
    val last = hay.length - n.length
    while (i <= last) {
      var j = 0
      while (j < n.length && hay(i + j) == n(j)) j += 1
      if (j == n.length) return i
      i += 1
    }
    -1
  }

  /** Text-op scan of one decoded content stream. `fonts` maps resource
    * names (the `/F1` of `/F1 12 Tf`) to ToUnicode CMaps; shows under a
    * mapped font are decoded through it, others fall back to raw bytes.
    *
    * Line assembly is BASELINE-AWARE (ISO 32000 §9.4.2): the scanner
    * tracks the CTM (`q`/`Q`/`cm`) and the text line matrix
    * (`BT`/`Tm`/`Td`/`TD`/`TL`), and a line break is emitted only when a
    * show's device-space baseline y moves (or on the explicit next-line
    * operators `T*` `'` `"`). Real producers emit many `BT..ET` blocks —
    * one per positioned run — on a single visual line; op-boundary
    * breaking would shred "AI-Powered" into three lines. Same-baseline
    * runs concatenate byte-adjacent (word gaps are expected to be glyph
    * spaces, which subset-font producers do emit); no inter-run spacing
    * is synthesized from x advances because font widths are not parsed.
    */
  private[sources] def extractTextOps(
      s: String, fonts: Map[String, CMap] = Map.empty): String = {
    val sb = new StringBuilder
    var lineHasText = false
    var curFont: Option[CMap] = None

    // Graphics + text state for baseline tracking. Matrices are the PDF
    // row-vector form [a b c d e f]: (x,y) -> (a*x+c*y+e, b*x+d*y+f).
    var ctm = Array(1.0, 0.0, 0.0, 1.0, 0.0, 0.0)
    val gsStack = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    var lmA = 1.0; var lmB = 0.0; var lmC = 0.0
    var lmD = 1.0; var lmE = 0.0; var lmF = 0.0 // text line matrix (Tlm)
    var leading = 0.0
    var lastY = Double.NaN // device baseline of the previous show
    var forcedBreak = false // T* / ' / " demand a break even at same y
    def resetTlm(): Unit = {
      lmA = 1.0; lmB = 0.0; lmC = 0.0; lmD = 1.0; lmE = 0.0; lmF = 0.0
    }
    // Tlm = translate(tx,ty) x Tlm — the Td next-line step
    def translateTlm(tx: Double, ty: Double): Unit = {
      lmE = tx * lmA + ty * lmC + lmE
      lmF = tx * lmB + ty * lmD + lmF
    }
    // device y of the text-space origin: Tlm then CTM
    def deviceY: Double = lmE * ctm(1) + lmF * ctm(3) + ctm(5)

    def mapped(t: String): String = curFont match {
      case Some(cm) if cm.codeBytes == 2 =>
        val out = new StringBuilder
        var j = 0
        while (j + 1 < t.length) {
          val code = (t.charAt(j) << 8) | t.charAt(j + 1)
          // unmapped CID: keep the raw code unit (spec-only fallback)
          out.append(cm.map.getOrElse(code, code.toChar.toString))
          j += 2
        }
        out.result()
      case Some(cm) =>
        t.flatMap(ch => cm.map.getOrElse(ch.toInt, ch.toString))
      case None => t
    }
    def show(t: String): Unit = {
      val m = mapped(t)
      if (m.nonEmpty) {
        val y = deviceY
        val moved = !lastY.isNaN && math.abs(y - lastY) > 1e-2
        if (lineHasText && (forcedBreak || moved)) {
          sb.append('\n'); lineHasText = false
        }
        forcedBreak = false
        lastY = y
        sb.append(m); lineHasText = true
      }
    }

    var i = 0
    var inText = false
    var pendingName = "" // last /Name operand (for Tf)
    var pendingStrings = List.empty[String] // strings seen since last op
    val pendingNums = scala.collection.mutable.ArrayBuffer.empty[Double]
    def num(idxFromEnd: Int): Double = // operand position from the right
      if (pendingNums.length >= idxFromEnd)
        pendingNums(pendingNums.length - idxFromEnd)
      else 0.0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '/') {
        i += 1
        val start = i
        while (i < s.length && { val ch = s.charAt(i)
          ch.isLetterOrDigit || ch == '_' || ch == '.' || ch == '-' }) i += 1
        pendingName = s.substring(start, i)
      } else if (c == '(') {
        val (str, next) = literalString(s, i)
        pendingStrings = str :: pendingStrings
        i = next
      } else if (c == '<' && i + 1 < s.length && s.charAt(i + 1) == '<') {
        i += 2 // inline dictionary open (e.g. BDC property lists)
      } else if (c == '>' && i + 1 < s.length && s.charAt(i + 1) == '>') {
        i += 2 // inline dictionary close
      } else if (c == '<') {
        hexString(s, i) match {
          case Some((str, next)) =>
            pendingStrings = str :: pendingStrings
            i = next
          case None => i += 1 // not a hex string — skip the bracket only
        }
      } else if (c == '%') { // comment to EOL
        while (i < s.length && s.charAt(i) != '\n' && s.charAt(i) != '\r') i += 1
      } else if (c.isDigit || c == '-' || c == '+' || c == '.') {
        val start = i
        i += 1
        while (i < s.length && { val ch = s.charAt(i)
          ch.isDigit || ch == '.' }) i += 1
        // malformed runs (e.g. "1.2.3") simply fail to parse and are dropped
        s.substring(start, i).toDoubleOption.foreach(pendingNums += _)
      } else if (c.isLetter || c == '\'' || c == '"' || c == '*') {
        val start = i
        while (i < s.length && { val ch = s.charAt(i)
          ch.isLetterOrDigit || ch == '\'' || ch == '"' || ch == '*' }) i += 1
        def clear(): Unit = { pendingStrings = Nil; pendingNums.clear() }
        s.substring(start, i) match {
          case "q" => gsStack += ctm.clone(); clear()
          case "Q" =>
            if (gsStack.nonEmpty) ctm = gsStack.remove(gsStack.length - 1)
            clear()
          case "cm" =>
            if (pendingNums.length >= 6) {
              val a = num(6); val b = num(5); val cc = num(4)
              val d = num(3); val e = num(2); val f = num(1)
              ctm = Array( // new = operand matrix x CTM
                a * ctm(0) + b * ctm(2), a * ctm(1) + b * ctm(3),
                cc * ctm(0) + d * ctm(2), cc * ctm(1) + d * ctm(3),
                e * ctm(0) + f * ctm(2) + ctm(4),
                e * ctm(1) + f * ctm(3) + ctm(5))
            }
            clear()
          case "BT" => inText = true; resetTlm(); clear()
          case "ET" => inText = false; clear()
          case "Tm" if inText =>
            if (pendingNums.length >= 6) {
              lmA = num(6); lmB = num(5); lmC = num(4)
              lmD = num(3); lmE = num(2); lmF = num(1)
            }
            clear()
          case "Td" if inText =>
            translateTlm(num(2), num(1)); clear()
          case "TD" if inText =>
            leading = -num(1); translateTlm(num(2), num(1)); clear()
          case "TL" => leading = num(1); clear()
          case "T*" if inText =>
            translateTlm(0.0, -leading); forcedBreak = true; clear()
          case "Tj" if inText =>
            pendingStrings.headOption.foreach(show)
            clear()
          case "TJ" if inText =>
            pendingStrings.reverse.foreach(show) // array shows, in order
            clear()
          case "'" | "\"" if inText => // move-to-next-line + show
            translateTlm(0.0, -leading); forcedBreak = true
            pendingStrings.headOption.foreach(show)
            clear()
          case "Tf" => // select font: the /Name operand picks the CMap
            curFont = fonts.get(pendingName)
            clear()
          case _ =>
            clear() // other operators consume their operands
        }
      } else i += 1
    }
    sb.result().stripTrailing()
  }

  /** `(..)` literal with nesting + escapes; returns (text, indexAfter). */
  private def literalString(s: String, open: Int): (String, Int) = {
    val sb = new StringBuilder
    var depth = 1
    var i = open + 1
    while (i < s.length && depth > 0) {
      s.charAt(i) match {
        case '\\' if i + 1 < s.length =>
          s.charAt(i + 1) match {
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'b' => sb.append('\b'); i += 2
            case 'f' => sb.append('\f'); i += 2
            case '(' => sb.append('('); i += 2
            case ')' => sb.append(')'); i += 2
            case '\\' => sb.append('\\'); i += 2
            case '\r' => i += 2; if (i < s.length && s.charAt(i) == '\n') i += 1
            case '\n' => i += 2 // line continuation
            case d if d >= '0' && d <= '7' =>
              var code = 0; var n = 0; i += 1
              while (n < 3 && i < s.length && s.charAt(i) >= '0' &&
                s.charAt(i) <= '7') { code = code * 8 + (s.charAt(i) - '0'); i += 1; n += 1 }
              sb.append(code.toChar)
            case other => sb.append(other); i += 2
          }
        case '(' => depth += 1; sb.append('('); i += 1
        case ')' =>
          depth -= 1
          if (depth > 0) sb.append(')')
          i += 1
        case ch => sb.append(ch); i += 1
      }
    }
    (sb.result(), i)
  }

  /** `<48656c6c6f>` hex string; None when the bracketed run contains
    * anything but hex digits/whitespace (then it wasn't a string at all
    * — e.g. a malformed construct — and the caller resumes scanning).
    */
  private def hexString(s: String, open: Int): Option[(String, Int)] = {
    var i = open + 1
    val hex = new StringBuilder
    while (i < s.length && s.charAt(i) != '>') {
      val c = s.charAt(i)
      if (!c.isWhitespace) {
        val isHex = (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') ||
          (c >= 'A' && c <= 'F')
        if (!isHex) return None
        hex.append(c)
      }
      i += 1
    }
    if (i >= s.length) return None // unterminated
    if (hex.length % 2 == 1) hex.append('0')
    val sb = new StringBuilder
    var j = 0
    while (j + 2 <= hex.length) {
      sb.append(Integer.parseInt(hex.substring(j, j + 2), 16).toChar)
      j += 2
    }
    Some((sb.result(), i + 1))
  }
}
