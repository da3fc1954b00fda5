package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document ingestion sources (SURVEY.md §2.1 S1–S3).
  *
  * The reference spools uploaded PDFs to disk (`/root/reference/AI.py:196-201`),
  * extracts per-page text with PyMuPDF returning "" on ANY error
  * (`AI.py:61-71`), and fans extraction across a thread pool
  * (`AI.py:74-86`). Spark-native shape:
  *
  *  - the upload spool (S1) is unnecessary — `binaryFile` reads the raw
  *    bytes distributed, one task per file group;
  *  - extraction (S2) is a per-row projection; the PDF codec itself is
  *    STUBBED (no pdf library ships offline) behind `extractText`, which
  *    preserves the reference's load-bearing error semantics: any decode
  *    failure yields "" rather than an error row;
  *  - the thread-pool fan-out (S3) is Spark task parallelism — free.
  */
object DocumentSource {

  /** S1+S2: read a directory of raw document blobs.
    * Returns (path, length, modificationTime, text).
    */
  def readBinaryDir(spark: SparkSession, dir: String, glob: String = "*"): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(col("path"), col("length"), col("modificationTime"), col("content"))
      .withColumn("text", extractTextUdf(col("content")))
      .drop("content")
  }

  /** S2 extraction: PDFs go through the native plain-PDF parser
    * (`PdfText` — raw or FlateDecode content streams, Tj/TJ text ops);
    * anything else decodes as UTF-8 text. The load-bearing contract is
    * error → "" (`AI.py:69-71` returns "" on any exception).
    */
  def extractText(content: Array[Byte]): String =
    try {
      if (content == null) ""
      else if (PdfText.isPdf(content)) PdfText.extract(content)
      else new String(content, java.nio.charset.StandardCharsets.UTF_8)
    } catch {
      case _: Throwable => "" // reference semantics: failed extraction = empty doc
    }

  private val extractTextUdf = udf(extractText _)
}
