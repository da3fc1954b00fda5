package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for large-scale training-data pipelines
  * (the BASELINE.json north star, beyond the reference's RAG surface):
  * benchmark decontamination, PII redaction, deterministic stratified
  * sampling, and fixed-budget sequence packing.
  *
  * Scale design, per operator:
  *   - [[contamination]]: the benchmark side (an eval suite) is tiny next
  *     to a 100 TB corpus — its distinct shingles broadcast, so the only
  *     corpus-wide exchange is the final per-doc count (map-side
  *     combined). No corpus self-join ever happens.
  *   - [[redactPii]]: pure per-row regex projections — zero shuffle,
  *     whole-stage codegen, linear in corpus size.
  *   - [[sampleStratified]]: the classic deterministic-hash sample. The
  *     rate table broadcasts; the keep decision is a per-row md5-prefix
  *     threshold compare — zero shuffle, reproducible across reruns and
  *     cluster sizes (no RNG, no partition sensitivity), and the SAME
  *     decision function an auditor can re-run in any SQL engine.
  *   - [[packSequences]]: GPT-style packing (concatenate the token
  *     stream, split every `budget` tokens, documents may straddle
  *     boundaries). The running offset is a window cumsum PER SHARD, so
  *     shards pack independently and in parallel — exactly how a 100 TB
  *     corpus is packed in practice (per input shard / per worker), with
  *     one shuffle keyed by the shard column.
  */
object CorpusOps {

  /** Word n-gram shingles of a space-separated text column: positions
    * 1..len−n+1, words joined by a single space. Empty array when the
    * text has fewer than n tokens (the sequence(1, 0) descending trap is
    * guarded explicitly).
    */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    val cnt = size(toks) - (n - 1)
    when(cnt <= 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), cnt),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  /** Benchmark decontamination: flags corpus documents sharing at least
    * one n-token shingle with any benchmark document, with the number of
    * distinct overlapping shingles as evidence. The benchmark's distinct
    * shingle set is broadcast (eval suites are MBs; the corpus is TBs),
    * so the corpus side streams through a broadcast hash join and a
    * partially-aggregated per-doc count — no corpus shuffle on raw text.
    *
    * Returns (doc_id, n_hit) for contaminated corpus docs only.
    */
  def contamination(corpus: DataFrame, benchmark: DataFrame, n: Int = 8,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val corpusSh = corpus.select(col(idCol),
      explode(wordShingles(col(textCol), n)).as("shingle"))
    val benchSh = benchmark
      .select(explode(wordShingles(col(textCol), n)).as("shingle"))
      .distinct()
    corpusSh.join(broadcast(benchSh), Seq("shingle"))
      .groupBy(idCol)
      .agg(countDistinct("shingle").as("n_hit"))
  }

  /** Email + NANP-test-prefix phone patterns — deliberately in the
    * regex subset Java and RE2 interpret identically (char classes,
    * bounded quantifiers, \b, \d), so the redaction is re-checkable
    * verbatim in any engine.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\b555-\\d{4}\\b"

  /** PII redaction: replaces emails and phone numbers with typed
    * placeholder tags and counts what was removed. Pure per-row regex —
    * no shuffle, codegen'd, linear.
    */
  def redactPii(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("n_emails", regexp_count(col(textCol), lit(EmailPattern)))
      .withColumn("n_phones", regexp_count(col(textCol), lit(PhonePattern)))
      .withColumn("redacted",
        regexp_replace(
          regexp_replace(col(textCol), EmailPattern, "<EMAIL>"),
          PhonePattern, "<PHONE>"))

  /** 4-hex-digit md5-prefix threshold for a sampling fraction: a row is
    * kept iff `substr(md5(key), 1, 4) < threshold`. Fractions ≥ 1 map to
    * "zzzz" (above every hex digit) so they keep everything; the 1/65536
    * granularity is the price of an engine-portable decision function.
    */
  def hexThreshold(frac: Double): String =
    if (frac >= 1.0) "zzzz"
    else f"${math.max(0L, math.round(frac * 65536.0))}%04x"

  /** Deterministic stratified sampling: per-stratum fractions applied
    * via an md5-prefix threshold on a caller-chosen key column.
    * Reproducible (no RNG), cluster-size-independent, and auditable —
    * the keep decision re-runs in any SQL engine with an md5 function.
    * The rate table broadcasts; the filter is per-row.
    */
  def sampleStratified(df: DataFrame, strataCol: String, key: Column,
      rates: Map[String, Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ratesDf = rates.toSeq
      .map { case (s, f) => (s, hexThreshold(f)) }
      .toDF(strataCol, "__thresh")
    df.join(broadcast(ratesDf), Seq(strataCol))
      .filter(substring(md5(key.cast("string")), 1, 4) < col("__thresh"))
      .drop("__thresh")
  }

  /** Fixed-budget sequence packing (GPT-style): concatenate each shard's
    * token stream in `orderCol` order, split every `budget` tokens;
    * documents may straddle sequence boundaries. Emits per document its
    * token count, start offset in the shard's stream, and the first/last
    * sequence ids it lands in. Shards pack independently — the window
    * cumsum is partitioned by `shardCol`, so the one shuffle is by shard
    * and each shard's packing is a single in-partition pass.
    */
  def packSequences(df: DataFrame, shardCol: String, orderCol: String,
      budget: Int, textCol: String = "text"): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val w = Window.partitionBy(shardCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("n_tok", size(split(col(textCol), " ")).cast("long"))
      .withColumn("start_off", coalesce(sum("n_tok").over(w), lit(0L)))
      .withColumn("first_seq", floor(col("start_off") / budget))
      .withColumn("last_seq",
        floor((col("start_off") + col("n_tok") - 1) / budget))
  }
}
