package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.ISO_8859_1
import java.util.zip.Deflater

/** S2: native PDF text extraction — a real (valid, xref'd) generated PDF
  * with one raw and one FlateDecode page, plus the error→"" contract.
  */
class PdfTextSpec extends AnyFunSuite {

  /** Minimal but spec-valid single-font PDF writer (test fixture only):
    * catalog → pages → N page objects each with its own content stream.
    */
  private def makePdf(pageStreams: Seq[(Array[Byte], Boolean)]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    def beginObj(n: Int): Unit = { offsets += out.size(); w(s"$n 0 obj\n") }

    w("%PDF-1.4\n")
    val nPages = pageStreams.size
    val kids = (0 until nPages).map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    beginObj(1); w("<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    beginObj(2)
    w(s"<< /Type /Pages /Kids [$kids] /Count $nPages >>\nendobj\n")
    pageStreams.zipWithIndex.foreach { case ((data, compress), i) =>
      val pageNum = 3 + 2 * i
      val contentNum = pageNum + 1
      beginObj(pageNum)
      w(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Resources << /Font << /F1 ${3 + 2 * nPages} 0 R >> >> " +
        s"/Contents $contentNum 0 R >>\nendobj\n")
      val payload = if (compress) deflate(data) else data
      beginObj(contentNum)
      val filter = if (compress) " /Filter /FlateDecode" else ""
      w(s"<< /Length ${payload.length}$filter >>\nstream\n")
      out.write(payload)
      w("\nendstream\nendobj\n")
    }
    val fontNum = 3 + 2 * nPages
    beginObj(fontNum)
    w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")
    val xrefPos = out.size()
    w(s"xref\n0 ${fontNum + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${fontNum + 1} /Root 1 0 R >>\n" +
      s"startxref\n$xrefPos\n%%EOF\n")
    out.toByteArray
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def content(ops: String): Array[Byte] = ops.getBytes(ISO_8859_1)

  test("extracts text from a generated two-page PDF (raw + FlateDecode)") {
    val page1 = content(
      "BT /F1 12 Tf 72 720 Td (Hello spark world) Tj ET")
    val page2 = content(
      "BT /F1 12 Tf 72 720 Td (Second page) Tj 0 -14 Td (line two) Tj ET")
    val pdf = makePdf(Seq(page1 -> false, page2 -> true))
    assert(PdfText.isPdf(pdf))
    val text = PdfText.extract(pdf)
    assert(text === "Hello spark world\nSecond page\nline two")
  }

  test("TJ arrays, hex strings, escapes and quote operators") {
    val ops = content(
      """BT [(Kerned ) -120 (pair)] TJ T* <48692068657821> Tj """ +
      """T* (esc \(paren\) \\ done) Tj ET""")
    val pdf = makePdf(Seq(ops -> true))
    assert(PdfText.extract(pdf) ===
      "Kerned pair\nHi hex!\nesc (paren) \\ done")
  }

  test("corrupt PDFs and non-PDF bytes keep the error-to-empty contract") {
    // valid header, garbage body
    val garbage = ("%PDF-1.4\n" + "x" * 200).getBytes(ISO_8859_1)
    assert(PdfText.extract(garbage) === "")
    // corrupt flate payload: declared FlateDecode but random bytes
    val bad = ("%PDF-1.4\n1 0 obj\n<< /Length 8 /Filter /FlateDecode >>\n" +
      "stream\nNOTFLATE\nendstream\nendobj\n").getBytes(ISO_8859_1)
    assert(PdfText.extract(bad) === "")
    assert(PdfText.extract(null) === "")
    assert(!PdfText.isPdf("plain text".getBytes(ISO_8859_1)))
    // DocumentSource routes PDFs through the parser, others through UTF-8
    assert(DocumentSource.extractText("plain text".getBytes(ISO_8859_1))
      === "plain text")
    val pdf = makePdf(Seq(content("BT (via source) Tj ET") -> false))
    assert(DocumentSource.extractText(pdf) === "via source")
  }

  test("bare 'stream' inside metadata strings does not derail the scan") {
    val pdf = ("%PDF-1.4\n" +
      "1 0 obj << /Title (All about streams and data) >> endobj\n" +
      "2 0 obj << /Length 21 >>\nstream\n" +
      "BT (Real text) Tj ET\nendstream\nendobj\n").getBytes(ISO_8859_1)
    assert(PdfText.extract(pdf) === "Real text")
  }

  test("marked-content inline dictionaries do not blank the document") {
    val ops = content(
      "BT /P << /MCID 0 >> BDC (Visible text) Tj EMC ET")
    val pdf = makePdf(Seq(ops -> false))
    assert(PdfText.extract(pdf) === "Visible text")
  }

  test("truncated FlateDecode stream is skipped, not partially emitted") {
    val good = content("BT (intact page) Tj ET")
    val full = deflate(content("BT (should be skipped entirely) Tj ET"))
    val truncated = full.dropRight(4)
    val pdf = ("%PDF-1.4\n" +
      s"1 0 obj << /Length ${truncated.length} /Filter /FlateDecode >>\n" +
      "stream\n").getBytes(ISO_8859_1) ++ truncated ++
      "\nendstream\nendobj\n2 0 obj << /Length 22 >>\nstream\n".getBytes(ISO_8859_1) ++
      good ++ "\nendstream\nendobj\n".getBytes(ISO_8859_1)
    assert(PdfText.extract(pdf) === "intact page")
  }

  test("property: literal-string escaping round-trips through the extractor") {
    val rnd = new scala.util.Random(7)
    def esc(s: String) = s.flatMap {
      case '('  => "\\("
      case ')'  => "\\)"
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c    => c.toString
    }
    for (round <- 1 to 20) {
      val raw = (1 to 40).map(_ => rnd.nextPrintableChar()).mkString +
        "(nested) \\ tail\tend"
      val ops = s"BT (${esc(raw)}) Tj ET"
      val pdf = makePdf(Seq(content(ops) -> (round % 2 == 0)))
      assert(PdfText.extract(pdf) === raw, s"round $round")
    }
  }

  /** PDF with one page whose font carries a ToUnicode CMap (the
    * subset-font shape: string bytes are glyph codes, not characters).
    */
  private def makeSubsetFontPdf(
      contentOps: String, cmap: String, compressCmap: Boolean): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R " +
      "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >> endobj\n")
    val content = contentOps.getBytes(ISO_8859_1)
    w(s"4 0 obj << /Length ${content.length} >>\nstream\n")
    out.write(content)
    w("\nendstream\nendobj\n")
    w("5 0 obj << /Type /Font /Subtype /TrueType " +
      "/BaseFont /ABCDEF+Subset /ToUnicode 6 0 R >> endobj\n")
    val cmapPayload =
      if (compressCmap) deflate(cmap.getBytes(ISO_8859_1))
      else cmap.getBytes(ISO_8859_1)
    val filter = if (compressCmap) " /Filter /FlateDecode" else ""
    w(s"6 0 obj << /Length ${cmapPayload.length}$filter >>\nstream\n")
    out.write(cmapPayload)
    w("\nendstream\nendobj\n")
    out.toByteArray
  }

  test("subset font with 1-byte ToUnicode CMap (bfchar + array bfrange) decodes") {
    val cmap =
      """/CIDInit /ProcSet findresource begin
        |12 dict begin
        |begincmap
        |1 begincodespacerange
        |<00> <FF>
        |endcodespacerange
        |2 beginbfchar
        |<01> <0048>
        |<02> <0065>
        |endbfchar
        |1 beginbfrange
        |<03> <04> [<006C> <006F>]
        |endbfrange
        |endcmap
        |end
        |end""".stripMargin
    // glyph codes 01 02 03 03 04 — raw bytes would be garbage control
    // chars; through the CMap they spell Hello
    val pdf = makeSubsetFontPdf(
      "BT /F1 12 Tf <0102030304> Tj ET", cmap, compressCmap = true)
    assert(PdfText.extract(pdf) === "Hello")
  }

  test("CID font with 2-byte codes, incrementing bfrange and ligature dst") {
    val cmap =
      """begincmap
        |1 begincodespacerange
        |<0000> <FFFF>
        |endcodespacerange
        |2 beginbfchar
        |<0001> <0057>
        |<0003> <00660066>
        |endbfchar
        |1 beginbfrange
        |<0010> <0012> <006F>
        |endbfrange
        |endcmap""".stripMargin
    // 2-byte codes 0001 0010 0003 -> W, o, ff (multi-unit ligature)
    val pdf = makeSubsetFontPdf(
      "BT /F1 10 Tf <000100100003> Tj ET", cmap, compressCmap = false)
    assert(PdfText.extract(pdf) === "Woff")
  }

  test("font without ToUnicode keeps the raw-byte fallback") {
    // same shape but the content uses plain ASCII via the unmapped /F1 of
    // makePdf (no /ToUnicode anywhere): bytes pass through untouched
    val pdf = makePdf(Seq(content("BT /F1 12 Tf (Raw bytes) Tj ET") -> false))
    assert(PdfText.extract(pdf) === "Raw bytes")
  }

  test("font resources are page-scoped: two pages both naming /F1 decode " +
      "through their own ToUnicode CMaps") {
    def cmap(m: Seq[(Int, Char)]): String =
      "begincmap\n1 begincodespacerange\n<00> <FF>\nendcodespacerange\n" +
        s"${m.size} beginbfchar\n" +
        m.map { case (c, u) => f"<$c%02X> <${u.toInt}%04X>" }.mkString("\n") +
        "\nendbfchar\nendcmap"
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    def stream(n: Int, payload: String): Unit = {
      w(s"$n 0 obj << /Length ${payload.length} >>\nstream\n")
      w(payload); w("\nendstream\nendobj\n")
    }
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R 7 0 R] /Count 2 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R " +
      "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >> endobj\n")
    stream(4, "BT /F1 12 Tf <0102> Tj ET")
    w("5 0 obj << /Type /Font /Subtype /TrueType /BaseFont /AAAAAA+One " +
      "/ToUnicode 6 0 R >> endobj\n")
    stream(6, cmap(Seq(0x01 -> 'A', 0x02 -> 'B')))
    w("7 0 obj << /Type /Page /Parent 2 0 R " +
      "/Resources << /Font << /F1 9 0 R >> >> /Contents 8 0 R >> endobj\n")
    stream(8, "BT /F1 12 Tf <0102> Tj ET")
    w("9 0 obj << /Type /Font /Subtype /TrueType /BaseFont /BBBBBB+Two " +
      "/ToUnicode 10 0 R >> endobj\n")
    stream(10, cmap(Seq(0x01 -> 'X', 0x02 -> 'Y')))
    // a file-global last-wins map would decode BOTH pages through the
    // second CMap ("XY\nXY"); page scoping keeps them distinct
    assert(PdfText.extract(out.toByteArray) === "AB\nXY")
  }

  test("pages inherit /Resources from the /Pages parent (ISO 32000 " +
      "§7.7.3.4): ToUnicode still applies when the page has no own dict") {
    val cmap = "begincmap\n1 begincodespacerange\n<00> <FF>\n" +
      "endcodespacerange\n2 beginbfchar\n<01> <0048>\n<02> <0069>\n" +
      "endbfchar\nendcmap"
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    def stream(n: Int, payload: String): Unit = {
      w(s"$n 0 obj << /Length ${payload.length} >>\nstream\n")
      w(payload); w("\nendstream\nendobj\n")
    }
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    // the /Resources live on the PAGES node; the page itself has none
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 " +
      "/Resources << /Font << /F1 5 0 R >> >> >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    stream(4, "BT /F1 12 Tf <0102> Tj ET")
    w("5 0 obj << /Type /Font /Subtype /TrueType /BaseFont /AAAAAA+Inh " +
      "/ToUnicode 6 0 R >> endobj\n")
    stream(6, cmap)
    // without inheritance the glyph codes 01 02 come out as raw control
    // bytes; through the inherited CMap they spell Hi
    assert(PdfText.extract(out.toByteArray) === "Hi")
  }

  /** One-page PDF whose /F1 has an /Encoding entry instead of ToUnicode. */
  private def makeEncodedFontPdf(contentOps: String,
      encoding: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R " +
      "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >> endobj\n")
    val content = contentOps.getBytes(ISO_8859_1)
    w(s"4 0 obj << /Length ${content.length} >>\nstream\n")
    out.write(content)
    w("\nendstream\nendobj\n")
    w("5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
      s"/Encoding $encoding >> endobj\n")
    out.toByteArray
  }

  test("WinAnsiEncoding fallback: cp1252 high bytes decode without a " +
      "ToUnicode map") {
    // 0x93/0x94 curly quotes, 0x85 ellipsis, 0x80 euro — all cp1252-only
    val pdf = makeEncodedFontPdf(
      "BT /F1 12 Tf <93> Tj (ok) Tj <9485> Tj ( ) Tj <80> Tj ET",
      "/WinAnsiEncoding")
    assert(PdfText.extract(pdf) === "“ok”… €")
  }

  test("StandardEncoding fallback: Annex D high-range glyphs decode") {
    // 0xB7 bullet, 0xAE fi ligature, 0xD0 emdash in StandardEncoding
    val pdf = makeEncodedFontPdf(
      "BT /F1 12 Tf <B7> Tj (x) Tj <AE> Tj <D0> Tj ET", "/StandardEncoding")
    assert(PdfText.extract(pdf) === "•xﬁ—")
  }

  test("/Differences dict layers over /BaseEncoding; ASCII stays intact") {
    val pdf = makeEncodedFontPdf(
      "BT /F1 12 Tf (Ab) Tj <C88095> Tj ET",
      "<< /BaseEncoding /WinAnsiEncoding /Differences [ 200 /eacute ] >>")
    // code 200 (0xC8) is remapped to eacute by Differences; 0x80/0x95
    // still come from the WinAnsi base; ASCII (Ab) passes through raw
    assert(PdfText.extract(pdf) === "Abé€•")
  }

  test("no-page-tree files still decode through the file-global font map") {
    val cmap = "begincmap\n1 beginbfchar\n<01> <0051>\nendbfchar\nendcmap"
    val content = "BT /F1 12 Tf <01> Tj ET"
    val pdf = ("%PDF-1.4\n" +
      "1 0 obj << /Font << /F1 2 0 R >> >> endobj\n" +
      "2 0 obj << /Type /Font /ToUnicode 3 0 R >> endobj\n" +
      s"3 0 obj << /Length ${cmap.length} >>\nstream\n$cmap\nendstream\nendobj\n" +
      s"4 0 obj << /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n")
      .getBytes(ISO_8859_1)
    assert(PdfText.extract(pdf) === "Q")
  }

  /** A spec-valid COMPRESSED-XREF (PDF 1.5) file: catalog, pages, page,
    * and font dictionaries packed in a Flate'd /Type/ObjStm; a binary
    * /Type/XRef cross-reference stream (W [1 2 1], type-2 rows pointing
    * into the ObjStm); no classic xref table or trailer at all.
    */
  private def makeObjStmPdf(contentOps: Array[Byte]): Array[Byte] = {
    val packed = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      3 -> ("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        "/Resources << /Font << /F1 6 0 R >> >> /Contents 4 0 R >>"),
      6 -> ("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
        "/Encoding /WinAnsiEncoding >>"))
    val bodies = packed.map(_._2)
    val offs = bodies.scanLeft(0)((acc, b) => acc + b.length + 1).init
    val header = packed.map(_._1).zip(offs)
      .map { case (n, o) => s"$n $o" }.mkString(" ") + "\n"
    val objStmRaw = (header + bodies.mkString("\n") + "\n").getBytes(ISO_8859_1)
    val objStmFlate = deflate(objStmRaw)
    val contentFlate = deflate(contentOps)

    val out = new ByteArrayOutputStream()
    def w(str: String): Unit = out.write(str.getBytes(ISO_8859_1))
    w("%PDF-1.5\n")
    val off5 = out.size()
    w(s"5 0 obj\n<< /Type /ObjStm /N ${packed.size} /First ${header.length} " +
      s"/Length ${objStmFlate.length} /Filter /FlateDecode >>\nstream\n")
    out.write(objStmFlate); w("\nendstream\nendobj\n")
    val off4 = out.size()
    w(s"4 0 obj\n<< /Length ${contentFlate.length} /Filter /FlateDecode >>" +
      "\nstream\n")
    out.write(contentFlate); w("\nendstream\nendobj\n")
    val xrefPos = out.size()
    def row(t: Int, f2: Int, f3: Int): Array[Byte] =
      Array(t.toByte, ((f2 >> 8) & 0xff).toByte, (f2 & 0xff).toByte,
        f3.toByte)
    val rows = Array.concat(
      row(0, 0, 255), // obj 0: free
      row(2, 5, 0), row(2, 5, 1), row(2, 5, 2), // 1-3: in ObjStm 5
      row(1, off4, 0), // 4: content stream
      row(1, off5, 0), // 5: the ObjStm
      row(2, 5, 3), // 6: font, in ObjStm 5
      row(1, xrefPos, 0)) // 7: this xref stream
    val xr = deflate(rows)
    w(s"7 0 obj\n<< /Type /XRef /Size 8 /Root 1 0 R /W [1 2 1] " +
      s"/Length ${xr.length} /Filter /FlateDecode >>\nstream\n")
    out.write(xr); w("\nendstream\nendobj\n")
    w(s"startxref\n$xrefPos\n%%EOF\n")
    out.toByteArray
  }

  test("compressed-xref PDF: page + font dicts inside a /Type/ObjStm " +
      "extract like classic syntax, WinAnsi resolving through the " +
      "expanded page's resources") {
    // 0x93/0x94 are cp1252 curly quotes — only a font map resolved
    // through the ObjStm-packed page/font dicts can decode them
    val pdf = makeObjStmPdf(
      content("BT /F1 12 Tf (Hello \u0093quoted\u0094 text) Tj ET"))
    assert(PdfText.extract(pdf) === "Hello “quoted” text")
  }

  test("corrupt ObjStm payload keeps the error contract: raw-fallback " +
      "text, never an exception") {
    val pdf = makeObjStmPdf(content("BT (Hello fallback) Tj ET"))
    // truncate the ObjStm's flate payload in place: find its stream data
    // and zero a chunk — expansion fails, the content-stream fallback
    // still serves the page text raw
    val s = new String(pdf, ISO_8859_1)
    val stm = s.indexOf("stream", s.indexOf("/ObjStm"))
    val corrupted = pdf.clone()
    var i = stm + 8
    var n = 0
    while (n < 10 && i < corrupted.length) {
      corrupted(i) = 0; i += 1; n += 1
    }
    assert(PdfText.extract(corrupted) === "Hello fallback")
  }

  test("extracts the reference's real producer-generated PDF " +
      "(TrueType subset fonts + ToUnicode bfranges, classic xref)") {
    // [REF] AI.py:61-71 — extract_text_from_pdf is the reference's front
    // door, and its shipped corpus is this 1.1 MB producer-generated file
    // (PDF 1.3, FlateDecode content, 4 subsetted TrueType fonts whose
    // code points only resolve through ToUnicode bfranges).
    val path = java.nio.file.Paths.get(
      "/root/reference/Adaptive Recommendation Chatbot.pdf")
    assume(java.nio.file.Files.exists(path), "reference PDF not present")
    val text = PdfText.extract(java.nio.file.Files.readAllBytes(path))
    assert(text.length > 2000, s"expected substantial text, got ${text.length}")
    // Phrases the document's write-up is known to contain (SURVEY.md §0),
    // chosen not to span the document's own line wraps:
    assert(text.contains("AI-Powered PDF Recommendation System"))
    assert(text.contains("language processing (NLP)"))
    assert(text.contains("Dynamic Learning"))
    assert(text.contains("knowledge sharing among employees"))
    assert(text.contains("cosine similarity"))
    // Baseline-aware assembly: a same-line run split across BT blocks
    // must NOT be shredded into its own lines ("AI\n-\nPowered")
    assert(!text.contains("\n-\n"))
  }

  test("binaryFile ingestion extracts PDF text end-to-end") {
    val spark = graft.TestSpark.spark
    val dir = java.nio.file.Files.createTempDirectory("graft_pdf")
    dir.toFile.deleteOnExit()
    val pdf = makePdf(Seq(
      content("BT (doc one text) Tj ET") -> false,
      content("BT (doc one page two) Tj ET") -> true))
    java.nio.file.Files.write(dir.resolve("a.pdf"), pdf)
    java.nio.file.Files.write(dir.resolve("broken.pdf"),
      ("%PDF-1.4\ngarbage").getBytes(ISO_8859_1))
    val rows = DocumentSource.readBinaryDir(spark, dir.toString, "*.pdf")
      .select("path", "text").collect()
      .map(r => (r.getString(0).split('/').last, r.getString(1))).toMap
    assert(rows("a.pdf") === "doc one text\ndoc one page two")
    assert(rows("broken.pdf") === "")
  }
}
