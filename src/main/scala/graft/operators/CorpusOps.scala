package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    // native one-pass shingling (per-doc distinct — the aggregate below
    // is countDistinct, so set semantics are what's consumed anyway);
    // the composed wordShingles form pays an interpreted lambda tree
    // per window, the measured cost of the whole operator
    def sh(c: Column) = graft.functions.expressions.HashExpressions
      .shingles_k_strict(split(c, " "), n)
    val corpusSh = corpus.select(col(idCol),
      explode(sh(col(textCol))).as("shingle"))
    val benchSh = benchmark
      .select(explode(sh(col(textCol))).as("shingle"))
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
    * Sub-1 fractions clamp to "ffff" (keep-all-but-one-bucket): without
    * the clamp, frac in [1 - 2⁻¹⁷, 1) rounds to 65536 and formats as the
    * 5-char "10000", which compares BELOW most 4-char prefixes and would
    * silently keep only ~6% of a stratum meant to keep ~100%.
    */
  def hexThreshold(frac: Double): String =
    if (frac >= 1.0) "zzzz"
    else f"${math.min(65535L, math.max(0L, math.round(frac * 65536.0)))}%04x"

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

  /** LEAKAGE-FREE train/val/test split — the split an LLM data
    * pipeline needs but per-row hashing gets wrong: near-duplicate
    * documents must land in the SAME split, or the held-out sets leak
    * training content (the contamination that silently inflates eval;
    * public art: dedup-aware splits in The Pile / Gopher / RefinedWeb
    * data work). Split assignment keys on the near-dup CLUSTER's
    * min-id representative, not the row: `pairs(doc_id_a, doc_id_b)`
    * (any match stage — blocked, banded, semantic; NEVER all-pairs)
    * collapse via the alternating-CC closure, every member inherits
    * its rep, and the rep's engine-portable md5-52-bit uniform
    * (`rep ":" seed`, the [[sampleWeighted]] parse) buckets mod
    * `buckets` into train (< trainBuckets) / val (< trainBuckets +
    * valBuckets) / test (rest) — integer arithmetic end-to-end, so any
    * SQL engine replays the decision exactly.
    *
    * Output: (idCol, rep_id, split). Scale shape: the closure is
    * O(log n) rounds over id-only edges; assignment is one hash join
    * (ids × rep map) + a per-row projection — no shuffle carries text.
    */
  def leakageFreeSplit(
      ids: DataFrame,
      idCol: String,
      pairs: DataFrame,
      buckets: Int = 10,
      trainBuckets: Int = 8,
      valBuckets: Int = 1,
      seed: Long = 77L): DataFrame = {
    require(buckets >= 2 && trainBuckets >= 1 && valBuckets >= 0 &&
      trainBuckets + valBuckets < buckets,
      s"leakageFreeSplit: need 1 <= trainBuckets, 0 <= valBuckets, " +
        s"trainBuckets + valBuckets < buckets; got " +
        s"($trainBuckets, $valBuckets, $buckets)")
    val reps = Dedup.clustersAlternating(pairs)
      .select(col("doc_id").as(idCol), col("cluster_id"))
    ids.select(col(idCol))
      .join(reps, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("cluster_id"), col(idCol)).as("rep_id"))
      .withColumn("split",
        splitExpr(col("rep_id"), seed, buckets, trainBuckets, valBuckets))
  }

  /** The split-assignment expression shared by [[leakageFreeSplit]]
    * and [[graft.sources.SplitStore]]: the rep's md5-52bit integer
    * uniform mod `buckets`, thresholded train/val/test — pure integer
    * arithmetic, engine-replayable.
    */
  private[graft] def splitExpr(rep: Column, seed: Long, buckets: Int,
      trainBuckets: Int, valBuckets: Int): Column = {
    val hv = conv(substring(md5(concat(rep.cast("string"),
      lit(":" + seed))), 1, 13), 16, 10).cast("long")
    val b = pmod(hv, lit(buckets.toLong))
    when(b < trainBuckets, "train")
      .when(b < trainBuckets + valBuckets, "val")
      .otherwise("test")
  }

  /** Per-document duplicated-shingle fraction — the exact-substring
    * duplication signal (what fraction of a document's distinct n-token
    * windows also appear in OTHER documents' text, the cross-doc
    * boilerplate measure driving substring-level dedup decisions).
    * Documents shorter than n tokens have no shingles and are absent
    * from the output.
    *
    * Scale shape: the corpus-wide exchanges carry ONLY (doc_id, 8-byte
    * xxhash64 of the shingle) — the raw shingle text never shuffles.
    * Three hash-keyed exchanges total (distinct pairs, the
    * document-frequency aggregate, the join back), each linear in
    * corpus token count; the per-doc result is a map-side-combinable
    * aggregate. Hash collisions conflate two shingles with probability
    * ≈ 2⁻⁶⁴ per pair — the same accepted trade as exact dedup's
    * hash-first phase.
    */
  def dupShingleStats(df: DataFrame, n: Int = 8,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // the native shingler emits each doc's DISTINCT shingles, so with a
    // unique idCol the (id, h) stream is already duplicate-free; the
    // distinct() below only defends against duplicate input ids
    val pairs = df
      .select(col(idCol), explode(graft.functions.expressions
        .HashExpressions.shingles_k_strict(split(col(textCol), " "), n))
        .as("sh"))
      .select(col(idCol), xxhash64(col("sh")).as("h"))
      .distinct()
    val dfreq = pairs.groupBy("h").agg(count(lit(1)).as("df"))
    pairs.join(dfreq, Seq("h"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shingles"),
        round(avg(when(col("df") >= 2, 1.0).otherwise(0.0)), 6)
          .as("dup_frac"))
  }

  /** Exact-substring duplicate-span REMOVAL — the step a production
    * pipeline runs after [[dupShingleStats]] says a corpus is
    * boilerplate-heavy (the dedup-training-data discipline: cut repeated
    * spans, keep the documents). A token span is cut when it is covered
    * by a maximal run of consecutive cross-doc-duplicated n-shingles at
    * least `minSpanTokens` tokens long: runs of duplicated shingle
    * starts are grouped gaps-and-islands style (start − row_number is
    * constant within a run), each island covers tokens [min(start),
    * max(start)+n−1], and shorter islands survive (a lone shared
    * 8-shingle is quotation, not boilerplate). Returns every input doc:
    * (id, cleaned_text, n_tok, n_removed_tok, n_removed_chars), with
    * cleaned_text = "" when everything was cut and the original text
    * (single-space normalized) when nothing was.
    *
    * Scale shape: shingle text is hashed in the same projection stage
    * that explodes it — corpus-wide exchanges carry (id, pos, 8-byte
    * hash) or (id, pos) only. The only window runs per doc over the
    * DUPLICATED starts (a small fraction of tokens; doc-keyed, never
    * unpartitioned), the rebuild is one doc-keyed ordered aggregate,
    * and the final id-keyed join ships each text exactly once — the
    * operator's output itself. Everything is linear in corpus tokens.
    */
  def removeDuplicateSpans(df: DataFrame, n: Int = 8,
      minSpanTokens: Int = 16, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    removeSpansImpl(df, n, minSpanTokens, textCol, idCol, None)

  /** Benchmark decontamination by REMOVAL — the step after
    * [[contamination]] flags overlap: instead of dropping whole
    * documents, cut the spans that match the benchmark (n-shingle runs
    * ≥ `minSpanTokens` long, the [[removeDuplicateSpans]] machinery
    * with "duplicated" redefined as "present in the benchmark").
    * The benchmark's distinct shingle-hash set is broadcast (eval
    * suites are MBs against a TB corpus — the [[contamination]] scale
    * argument), so the only corpus-wide exchanges are the doc-keyed
    * window over matching starts and the ordered rebuild.
    */
  def removeContaminatedSpans(df: DataFrame, benchmark: DataFrame,
      n: Int = 8, minSpanTokens: Int = 8, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    removeSpansImpl(df, n, minSpanTokens, textCol, idCol, Some(benchmark))

  private def removeSpansImpl(df: DataFrame, n: Int,
      minSpanTokens: Int, textCol: String, idCol: String,
      benchmark: Option[DataFrame]): DataFrame = {
    require(n >= 1, s"shingle size must be positive: $n")
    require(minSpanTokens >= n,
      s"minSpanTokens ($minSpanTokens) must be >= shingle size ($n)")
    val toksArr = split(col(textCol), " ")
    val starts = df.select(col(idCol),
        posexplode(graft.functions.expressions.HashExpressions
          .shingles_k_positional(toksArr, n)).as(Seq("pos", "sh")))
      .select(col(idCol), col("pos"), xxhash64(col("sh")).as("h"))
    val dupHashes = benchmark match {
      case Some(bench) =>
        // benchmark shingle hashes, distinct, broadcast
        broadcast(bench
          .select(explode(graft.functions.expressions.HashExpressions
            .shingles_k_strict(split(col(textCol), " "), n)).as("sh"))
          .select(xxhash64(col("sh")).as("h"))
          .distinct())
      case None =>
        // duplicated = the shingle occurs in >= 2 DISTINCT docs
        // (within-doc repetition alone is repetition, not cross-doc
        // boilerplate — the dupShingleStats convention)
        starts.select(col(idCol), col("h")).distinct()
          .groupBy("h").agg(count(lit(1)).as("n_docs_with"))
          .filter(col("n_docs_with") >= 2)
          .select("h")
    }
    val dupStarts = starts.join(dupHashes, Seq("h"))
      .select(col(idCol), col("pos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy("pos")
    val spans = dupStarts
      .withColumn("g", col("pos") - row_number().over(w))
      .groupBy(col(idCol), col("g"))
      .agg(min("pos").as("a"), (max("pos") + lit(n - 1)).as("e"))
      .filter(col("e") - col("a") + 1 >= minSpanTokens)
    val covered = spans
      .select(col(idCol), explode(sequence(col("a"), col("e"))).as("pos"))
      .distinct() // nearby islands may overlap in coverage for n > 2
    val toks = df.select(col(idCol),
      posexplode(toksArr).as(Seq("pos", "tok")))
    val rebuilt = toks.join(covered, Seq(idCol, "pos"), "left_anti")
      .groupBy(idCol)
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok"))).as("cleaned_text"),
        count(lit(1)).as("n_kept"))
    df.select(col(idCol), col(textCol), size(toksArr).as("n_in"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("cleaned_text"), lit("")).as("cleaned_text"),
        col("n_in").cast("long").as("n_tok"),
        (col("n_in") - coalesce(col("n_kept"), lit(0L))).cast("long")
          .as("n_removed_tok"),
        (length(col(textCol)) -
          length(coalesce(col("cleaned_text"), lit("")))).cast("long")
          .as("n_removed_chars"))
  }

  /** BPE merge induction — actual byte-pair-encoding training, not the
    * [[graft.operators.TextAnalysis]] token-count estimate: iteratively
    * count adjacent symbol pairs over the corpus vocabulary, merge the
    * argmax pair, repeat. Deterministic end-to-end: ties break on
    * (count desc, lhs asc, rhs asc), and the merge itself is greedy
    * left-to-right non-overlapping (a run of four identical symbols
    * becomes two merged pairs). Returns one row per learned merge:
    * (step, lhs, rhs, merged, pair_count, avg_symbols_per_word), the
    * last column being the corpus-frequency-weighted mean symbols per
    * word occurrence AFTER all merges — the coverage the learned vocab
    * buys. Stops early (fewer rows) if the vocabulary fully merges.
    *
    * Representation: each word is a string of DELIMITED symbols —
    * every symbol wrapped as S+sym+T with S = U+0001, T = U+0002
    * ("<S>l<T><S>o<T><S>w<T>") — so applying a merge is exactly
    * `replace(rep, S+lhs+T+S+rhs+T, S+lhs+rhs+T)`: scan-left
    * replace-all gives precisely the greedy left-to-right merge, and
    * BOTH symbol boundaries are anchored. The closing T is what makes
    * the replace sound: with prefix-only sentinels (a previous
    * revision), the pattern S+lhs+S+rhs could match where `rhs` is a
    * strict PREFIX of the actual symbol — e.g. after (s,t)→st, the
    * pair (a,s) would corrupt "f·a·st" into "f·ast", silently gluing
    * partial symbols (caught by the [[bpeMergesLocal]] cross-check).
    * Adjacent matches share no characters, so replace-all equals the
    * per-symbol scan exactly. Pair counting strips T and splits on S —
    * the counting path was always boundary-exact. Tokens must not
    * contain U+0001 or U+0002. An ANSI-SQL oracle replays the
    * identical training run with the same two-sentinel replace.
    *
    * Scale shape (the BPE-on-counts formulation): the corpus is
    * touched ONCE (the wordcount aggregate); every round thereafter
    * runs over the distinct-word vocabulary — orders of magnitude
    * smaller. Per round: one map-side-combinable pair-count aggregate
    * plus a batch-bounded collect (the k-bounded driver collect
    * discipline of kMeansCentroids), and a localCheckpoint keeps the
    * replace-chain lineage flat (the alternating-CC loop discipline).
    *
    * `batchSize` — the wall-clock lever for production vocabularies: a
    * 32k-merge training run at B=1 is 32k sequential Spark rounds (a
    * driver-side ceiling no executor count fixes); at B merges per
    * round it collapses to ~32k/B rounds. Each round selects the top-B
    * candidates that are pairwise SYMBOL-disjoint (no symbol of one
    * selected pair appears in another), so the in-batch merges cannot
    * interfere: each selected pair's occurrences and round-start count
    * are untouched by the others, and the chained replace is
    * order-independent. The residual approximation vs B=1 is only that
    * a merge can CREATE a new pair (neighbor, merged) whose count
    * outranks a LATER in-batch selection — true greedy would take the
    * new pair first. Measured (`graft.tools.BpeTune`, BASELINE.md) on
    * the fixture corpus; certify a corpus the same way before relying
    * on sequence-exactness at B > 1. B=1 is the exact greedy reference
    * path (the q101/q106 oracles replay it verbatim).
    */
  def bpeMerges(df: DataFrame, numMerges: Int,
      textCol: String = "text", batchSize: Int = 1): DataFrame = {
    require(numMerges >= 1, s"numMerges must be positive: $numMerges")
    require(batchSize >= 1, s"batchSize must be positive: $batchSize")
    val spark = df.sparkSession
    import spark.implicits._
    val S = "\u0001"
    val T = "\u0002"
    var vocab = df
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(regexp_replace(col("word"), "(.)", S + "$1" + T).as("rep"),
        col("freq"))
      .localCheckpoint(false)
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String,
        String, Long)]
    var step = 1
    var exhausted = false
    while (step <= numMerges && !exhausted) {
      val want = math.min(batchSize, numMerges - step + 1)
      // 4x headroom so disjoint selection rarely starves; the collect
      // stays bounded by the batch size, never by the vocabulary
      val cands = vocab
        .select(col("freq"),
          split(replace(col("rep"), lit(T), lit("")), S).as("arr"))
        .filter(size(col("arr")) >= 3) // >= 2 symbols (leading empty)
        .select(col("freq"), explode(arrays_zip(
          slice(col("arr"), lit(2), size(col("arr")) - 2),
          slice(col("arr"), lit(3), size(col("arr")) - 2))).as("pr"))
        .select(col("freq"), col("pr.0").as("lhs"), col("pr.1").as("rhs"))
        .groupBy("lhs", "rhs").agg(sum("freq").as("cnt"))
        .orderBy(desc("cnt"), asc("lhs"), asc("rhs"))
        .limit(4 * want).collect()
      if (cands.isEmpty) exhausted = true
      else {
        // greedy disjoint selection in (cnt desc, lhs, rhs) order: the
        // top-1 is always taken, so progress is guaranteed; a symbol
        // conflict just defers that pair to the next round's recount.
        // Disjointness covers the MERGED outputs too, not only the
        // pairs' own symbols: a selected pair's replace creates l+r
        // symbols mid-batch, and a later in-batch pair touching l+r
        // (as a side OR as its own merged output) would consume
        // adjacencies that did not exist at round start — breaking the
        // order-independence and round-start-count contracts the
        // docstring states (reachable via multi-round chains where a
        // merged symbol's pair re-forms).
        val used = scala.collection.mutable.Set.empty[String]
        val sel = scala.collection.mutable.ArrayBuffer
          .empty[(String, String, Long)]
        for (r <- cands if sel.size < want) {
          val (l, rr, cnt) =
            (r.getString(0), r.getString(1), r.getLong(2))
          if (!used(l) && !used(rr) && !used(l + rr)) {
            sel += ((l, rr, cnt)); used += l; used += rr; used += l + rr
          }
        }
        // one chained projection + ONE checkpoint for the whole batch
        // (disjointness makes the replace order immaterial)
        val rep = sel.foldLeft(col("rep")) { case (c, (l, r2, _)) =>
          replace(c, lit(S + l + T + S + r2 + T), lit(S + l + r2 + T))
        }
        vocab = vocab.select(rep.as("rep"), col("freq"))
          .localCheckpoint(false)
        sel.foreach { case (l, r2, cnt) =>
          merges += ((step, l, r2, l + r2, cnt)); step += 1
        }
      }
    }
    val cov = vocab.agg(
      round(sum(col("freq") *
          (size(split(replace(col("rep"), lit(T), lit("")), S)) - 1))
        .cast("double") / sum(col("freq")), 6)).head().getDouble(0)
    merges.toSeq.toDF("step", "lhs", "rhs", "merged", "pair_count")
      .withColumn("avg_symbols_per_word", lit(cov))
  }

  /** BPE ENCODING — apply a learned merge list ([[bpeMerges]] output
    * order) to tokenize the corpus, closing the train→encode loop.
    * Greedy application is the same sentinel-replace as training, so a
    * word's final symbol count is exactly what the training run left it
    * with when the merges came from this corpus. Returns per doc
    * (n_words, n_tokens, chars_per_token) — the realized compression
    * the learned vocabulary buys.
    *
    * Scale shape: the merges list is the trained model (driver-held,
    * tiny — it IS the artifact BPE training produces). Encoding runs
    * the replace chain over the DISTINCT-word vocabulary only (one
    * hash-keyed distinct, orders of magnitude smaller than the corpus),
    * then one hash join of the token stream back against it and a
    * doc-keyed map-side-combinable sum — repeated words are encoded
    * once, not once per occurrence.
    */
  def bpeEncode(df: DataFrame, merges: Seq[(String, String)],
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val words = df
      .select(col(idCol), explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
    words.join(bpeEncodeVocab(words.select("word").distinct(), merges),
        Seq("word"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"),
        sum("n_sym").as("n_tokens"),
        round(sum("n_chars").cast("double") / sum("n_sym"), 6)
          .as("chars_per_token"))
  }

  /** The encode core [[bpeEncode]] and [[tokenizerFertility]] share:
    * apply `merges` over the DISTINCT-WORD vocabulary (never the token
    * stream — the vocabulary is the small relation) and return per
    * word its encoded symbol count and char length.
    */
  private def bpeEncodeVocab(vocab: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    require(merges.nonEmpty, "merges must be non-empty (bpeMerges output)")
    val S = "\u0001"
    val T = "\u0002"
    val vocab0 = vocab
      .withColumn("rep", regexp_replace(col("word"), "(.)", S + "$1" + T))
    merges.foldLeft(vocab0) { case (v, (l, r)) =>
      v.withColumn("rep",
        replace(col("rep"), lit(S + l + T + S + r + T), lit(S + l + r + T)))
    }.select(col("word"),
      (size(split(replace(col("rep"), lit(T), lit("")), S)) - 1).as("n_sym"),
      length(col("word")).as("n_chars"))
  }

  /** ACTUAL token sequences (not just counts — what sequence packing,
    * training-data export and decode all consume): per document, the
    * BPE symbols of its words in order, joined with `sep`, plus the
    * DECODE round trip. Decode for this tokenizer is concatenation by
    * construction — a word's symbols concatenate back to exactly the
    * word (the merge fold only ever fuses adjacent symbols), so
    * `rt_text` (words reassembled from their symbols, joined by one
    * space) must equal the space-normalized input, and `rt_ok` says
    * so per row — the tokenizer round-trip certification, verified
    * corpus-wide by the q169 oracle which replays training, encoding,
    * sequence assembly AND the round trip in SQL.
    *
    * Output: (idCol, n_words, n_tokens, tokens_str, rt_ok).
    *
    * Scale shape: the merges fold runs over the DISTINCT vocabulary
    * (the [[bpeEncode]] discipline); the corpus-wide work is one word
    * explode + one hash join + one id-keyed ordered re-assembly (the
    * only stage where text rides an exchange — same class as any
    * tokenize-and-export job's output shuffle).
    */
  def bpeEncodeTokens(df: DataFrame, merges: Seq[(String, String)],
      textCol: String = "text", idCol: String = "doc_id",
      sep: String = "|"): DataFrame = {
    val words = df
      .select(col(idCol), posexplode(split(col(textCol), " "))
        .as(Seq("pos", "word")))
      .filter(col("word") =!= "")
    val enc = bpeEncodeVocabSyms(words.select("word").distinct(), merges)
    val rebuilt = words.join(enc, Seq("word"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"),
        sum(size(col("syms"))).as("n_tokens"),
        array_join(flatten(transform(
          array_sort(collect_list(struct(col("pos"), col("syms")))),
          s => s.getField("syms"))), sep).as("tokens_str"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("word")))),
          s => s.getField("word")), " ").as("rt_text"))
    rebuilt.join(df.select(col(idCol), col(textCol)), Seq(idCol))
      .withColumn("rt_ok", col("rt_text") ===
        array_join(filter(split(col(textCol), " "), w => w =!= ""), " "))
      .select(col(idCol), col("n_words"), col("n_tokens"),
        col("tokens_str"), col("rt_ok"))
  }

  /** [[bpeEncodeVocab]] keeping the SYMBOL SEQUENCES (the `syms`
    * array) alongside the counts — per word, its encoded symbols in
    * order; concatenating them reproduces the word exactly.
    */
  private def bpeEncodeVocabSyms(vocab: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    require(merges.nonEmpty, "merges must be non-empty (bpeMerges output)")
    val S = "\u0001"
    val T = "\u0002"
    val vocab0 = vocab
      .withColumn("rep", regexp_replace(col("word"), "(.)", S + "$1" + T))
    merges.foldLeft(vocab0) { case (v, (l, r)) =>
      v.withColumn("rep",
        replace(col("rep"), lit(S + l + T + S + r + T), lit(S + l + r + T)))
    }.select(col("word"),
      filter(split(replace(col("rep"), lit(T), lit("")), S),
        s => s =!= "").as("syms"))
  }

  /** Tokenizer FERTILITY per stratum (tokens emitted per word — the
    * standard tokenizer-evaluation metric; high fertility on a
    * language means the vocabulary underserves it and its documents
    * pay more sequence length per content): encode the distinct-word
    * vocabulary once with the learned merges, then one stratum-keyed
    * aggregate over the token stream. Output per stratum: (byCol,
    * n_words, n_tokens, fertility = tokens/word, chars_per_token).
    *
    * Scale shape: the merges fold runs over the DISTINCT vocabulary
    * (the [[bpeEncode]] discipline — never the corpus stream); the
    * corpus-wide work is one word explode + one hash join against the
    * encoded vocab + one map-side-combinable aggregate keyed by the
    * tiny stratum set.
    */
  def tokenizerFertility(df: DataFrame, merges: Seq[(String, String)],
      byCol: String = "lang", textCol: String = "text"): DataFrame = {
    val words = df
      .select(col(byCol), explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
    words.join(bpeEncodeVocab(words.select("word").distinct(), merges),
        Seq("word"))
      .groupBy(byCol)
      .agg(count(lit(1)).as("n_words"),
        sum("n_sym").as("n_tokens"),
        round(sum("n_sym").cast("double") / count(lit(1)), 6)
          .as("fertility"),
        round(sum("n_chars").cast("double") / sum("n_sym"), 6)
          .as("chars_per_token"))
  }

  /** EXACT BPE merge induction at production merge counts — the
    * 100 TB-shaped trainer. [[bpeMerges]] pays one Spark round per
    * merge (or per batch, approximately): a 32k–100k-merge vocabulary
    * means that many sequential driver-coordinated jobs, a wall-clock
    * ceiling no executor count fixes. But BPE training never needed
    * the corpus after the first pass — it trains on WORD-FREQUENCY
    * COUNTS (the classic counts formulation, the public
    * SentencePiece / HuggingFace-tokenizers discipline): this variant
    * runs the one distributed wordcount aggregate (the only
    * corpus-touching, scale-critical stage — map-side combinable,
    * linear), collects the distinct-word vocab to the driver (guarded:
    * fails loudly past `maxVocab` rows — real corpora hold ~10⁶–10⁷
    * distinct words, megabytes, not corpus-sized), and learns all
    * merges in memory with incremental pair-count updates + a lazy-
    * deletion priority queue — zero further Spark jobs, exact greedy
    * by construction. Output is ROW-IDENTICAL to `bpeMerges(B = 1)`
    * (same tie-break (count desc, lhs asc, rhs asc), same greedy
    * left-to-right non-overlapping merge, same overlap-counting pair
    * statistics; spec-pinned), so the q101/q106 oracles certify this
    * path transitively. Use [[bpeMerges]] with `batchSize` only when
    * the vocab genuinely cannot fit a driver — and accept its measured
    * sequence divergence (BASELINE.md).
    */
  def bpeMergesLocal(df: DataFrame, numMerges: Int,
      textCol: String = "text", maxVocab: Long = 20000000L): DataFrame = {
    require(numMerges >= 1, s"numMerges must be positive: $numMerges")
    val spark = df.sparkSession
    import spark.implicits._
    val wc = df
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))
    val nVocab = wc.count()
    require(nVocab <= maxVocab,
      s"bpeMergesLocal: $nVocab distinct words exceeds maxVocab=$maxVocab " +
        "— the driver-side trainer needs the vocab in memory; use " +
        "bpeMerges(batchSize = B) for the distributed (approximate at " +
        "B > 1) path, or raise maxVocab deliberately")
    // deterministic order makes the whole run order-independent of the
    // shuffle: words is sorted, and every update below iterates it in
    // this fixed order
    val words: Array[(Array[String], Long)] = wc
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
      // code points, not chars: the distributed path's regex "(.)"
      // prefixes per code point, so a surrogate pair is ONE symbol
      .map { case (w, f) =>
        (w.codePoints().toArray
          .map(cp => new String(Character.toChars(cp))), f)
      }
    // pair -> total corpus count (overlap-counting: every adjacent
    // position, exactly the distributed aggregate's arrays_zip count)
    val cnt = scala.collection.mutable.Map.empty[(String, String), Long]
    // pair -> word ids containing it (occurrence index; entries go
    // stale when a word mutates — the merge loop re-checks, and the
    // `hit` guard makes stale ids no-ops)
    val where = scala.collection.mutable
      .Map.empty[(String, String), scala.collection.mutable.Set[Int]]
    // pairs whose count changed since their last enqueue — keeps the
    // per-merge re-enqueue O(touched adjacencies), not O(all pairs)
    val dirty = scala.collection.mutable.Set.empty[(String, String)]
    def addWord(i: Int, sign: Long): Unit = {
      val (syms, f) = words(i)
      var j = 0
      while (j + 1 < syms.length) {
        val p = (syms(j), syms(j + 1))
        val c = cnt.getOrElse(p, 0L) + sign * f
        if (c == 0L) cnt.remove(p) else cnt(p) = c
        dirty += p
        if (sign > 0)
          where.getOrElseUpdate(p,
            scala.collection.mutable.Set.empty[Int]) += i
        j += 1
      }
    }
    words.indices.foreach(addWord(_, 1L))
    // lazy-deletion priority queue on (count desc, lhs asc, rhs asc):
    // stale entries are dropped when popped by re-checking `cnt`.
    // String comparison must be UTF-8 BYTE order, not Scala's UTF-16
    // code-unit order — Spark's orderBy(asc("lhs")) compares UTF8String
    // bytes, and the two orders disagree for supplementary-plane
    // symbols (a surrogate pair's UTF-16 units sort below U+E000..FFFF
    // while its UTF-8 bytes sort above), which would silently break the
    // row-identity contract with bpeMerges(B=1) on emoji-bearing text.
    val utf8Order: Ordering[String] = (a: String, b: String) => {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      java.util.Arrays.compareUnsigned(x, y)
    }
    implicit val ord: Ordering[(Long, String, String)] =
      Ordering.Tuple3(Ordering.Long, utf8Order.reverse, utf8Order.reverse)
    val pq = scala.collection.mutable.PriorityQueue.empty[(Long, String, String)]
    cnt.foreach { case ((l, r), c) => pq.enqueue((c, l, r)) }
    dirty.clear() // the initial enqueue above covered every pair
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String,
        String, Long)]
    var step = 1
    while (step <= numMerges && pq.nonEmpty) {
      val (c, l, r) = pq.dequeue()
      if (cnt.get((l, r)).contains(c)) { // fresh entry — the true argmax
        merges += ((step, l, r, l + r, c))
        val touched = where.getOrElse((l, r), scala.collection.mutable.Set
          .empty[Int]).toArray.sorted
        touched.foreach { i =>
          val (syms, f) = words(i)
          // greedy left-to-right non-overlapping merge (the sentinel-
          // replace semantics of the distributed path)
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var j = 0
          var hit = false
          while (j < syms.length) {
            if (j + 1 < syms.length && syms(j) == l && syms(j + 1) == r) {
              out += l + r; hit = true; j += 2
            } else { out += syms(j); j += 1 }
          }
          if (hit) {
            addWord(i, -1L) // retract old adjacencies
            words(i) = (out.toArray, f)
            addWord(i, 1L) // add new adjacencies (and index entries)
          }
        }
        where.remove((l, r))
        // re-enqueue only the pairs whose count changed (lazy deletion
        // filters any entry that goes stale again before it surfaces)
        dirty.foreach(p =>
          cnt.get(p).foreach(cc => pq.enqueue((cc, p._1, p._2))))
        dirty.clear()
        step += 1
      }
    }
    val totalF = words.map(_._2).sum.toDouble
    val cov = BigDecimal(
      words.map { case (s, f) => s.length.toLong * f }.sum / totalF)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    merges.toSeq.toDF("step", "lhs", "rhs", "merged", "pair_count")
      .withColumn("avg_symbols_per_word", lit(cov))
  }

  /** Domain-mixture reweighting: per-stratum sampling rates that hit a
    * target token mixture. Sources can only be DOWNsampled (rate ≤ 1),
    * so the largest feasible mixed corpus is `T* = min_s(tokens_s /
    * share_s)` and each stratum's rate is `share_s · T* / tokens_s` —
    * the stratum realizing the min keeps everything, every other is
    * thinned to match the target proportions. Returns per stratum
    * (n_docs, n_tok, target_share, rate, exp_tok); feed `rate` into
    * [[sampleStratified]] to materialize the mix.
    *
    * Scale shape: ONE map-side-combinable aggregate over the corpus
    * (stratum cardinality is tiny — languages/domains, not documents);
    * T* and the rate arithmetic run on that tiny frame with the 1-row
    * min broadcast back. No corpus self-join, no second corpus pass.
    */
  def mixturePlan(df: DataFrame, strataCol: String,
      targetShares: Map[String, Double],
      textCol: String = "text"): DataFrame = {
    require(targetShares.values.forall(_ > 0.0),
      "target shares must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    mixturePlanFromShares(df, strataCol,
      targetShares.toSeq.toDF(strataCol, "target_share"), textCol)
  }

  /** [[mixturePlan]] with the target shares as a RELATION instead of a
    * driver-side map — the composition shape when the shares are
    * themselves computed in-plan (e.g. [[temperatureShares]]); nothing
    * ever leaves the cluster. `shares` must be `(strataCol,
    * target_share)` with positive shares.
    */
  def mixturePlanFromShares(df: DataFrame, strataCol: String,
      shares: DataFrame,
      textCol: String = "text"): DataFrame = {
    val stats = df.groupBy(strataCol).agg(
      count(lit(1)).as("n_docs"),
      sum(size(split(col(textCol), " "))).cast("long").as("n_tok"))
    // Left join FROM the target table, broadcasting the post-aggregate
    // per-stratum stats (the NON-preserved side — the only side a
    // left-outer broadcast hash join can build; a hint on the preserved
    // side is ignored with a HintErrorLogger warning and falls back to
    // a shuffled join). Preserving the target rows means a stratum
    // named in targetShares but absent from the corpus is NOT silently
    // dropped (which would realize a mixture deviating from the
    // requested shares with no signal): the null stats row raises at
    // materialization instead.
    val joined = shares.join(broadcast(stats), Seq(strataCol), "left")
      .withColumn("n_tok", when(col("n_tok").isNull,
        raise_error(concat(lit("mixturePlan: stratum '"), col(strataCol),
          lit("' in targetShares is absent from the corpus"))))
        .otherwise(col("n_tok")))
    val tStar = joined.agg(
      min(col("n_tok") / col("target_share")).as("t_star"))
    joined.crossJoin(broadcast(tStar))
      .withColumn("rate", round(least(lit(1.0),
        col("target_share") * col("t_star") / col("n_tok")), 6))
      .withColumn("exp_tok",
        round(col("rate") * col("n_tok"), 0).cast("long"))
      .select(strataCol, "n_docs", "n_tok", "target_share", "rate",
        "exp_tok")
  }

  /** Robust per-stratum outlier flags via median/MAD (the classic
    * robust z-score — median and median-absolute-deviation resist the
    * very outliers a mean/stddev rule lets poison its own threshold;
    * Iglewicz & Hoaglin's 3.5 default, public): a row is an outlier
    * when |x − median| > k·MAD within its stratum. A zero-MAD stratum
    * (over half its mass at one value) flags anything off the median —
    * the honest degenerate reading. Adds (med, mad, is_outlier).
    *
    * Scale shape: two stratum-keyed exact-percentile aggregates with
    * the tiny boundary frames broadcast back (the [[trimOutliers]]
    * discipline; `percentile_approx` is the q107-certified 100 TB
    * drop-in) — no per-stratum sort window over the corpus.
    */
  def robustOutliers(df: DataFrame, metricCol: String, byCol: String,
      k: Double = 3.5): DataFrame = {
    require(k > 0.0, s"k must be positive: $k")
    val med = df.groupBy(byCol)
      .agg(percentile(col(metricCol), lit(0.5)).as("med"))
    val withMed = df.join(broadcast(med), Seq(byCol))
    val mad = withMed.groupBy(byCol)
      .agg(percentile(abs(col(metricCol) - col("med")), lit(0.5))
        .as("mad"))
    withMed.join(broadcast(mad), Seq(byCol))
      .withColumn("is_outlier",
        when(col("mad") === 0.0, abs(col(metricCol) - col("med")) > 0.0)
          .otherwise(
            abs(col(metricCol) - col("med")) > lit(k) * col("mad")))
  }

  /** Deterministic EXACT-k sample per group ("give me k documents per
    * domain"): the k smallest md5-derived 52-bit uniforms win — a pure
    * function of (key, seed), reproducible across engines and cluster
    * sizes (the [[sampleWeighted]] uniform), equivalent to a uniform
    * without-replacement draw of k per group. Output: (groupCol, rank,
    * key) with rank 1..k by (uniform asc, key asc); a group smaller
    * than k returns all its rows.
    *
    * Scale shape: ONE group-keyed bounded [[graft.functions.expressions
    * .TopKAgg]] — each map task ships at most k rows per group, no
    * per-group sort window, no corpus shuffle beyond the aggregate.
    */
  def samplePerGroup(df: DataFrame, groupCol: String, k: Int,
      key: Column, seed: Long): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    import graft.functions.expressions.TopKAgg
    val hv = conv(substring(
      md5(concat(key.cast("string"), lit(":" + seed))), 1, 13), 16, 10)
      .cast("long")
    df.select(col(groupCol), (-hv.cast("double")).as("__score"),
        key.cast("long").as("__key"))
      .groupBy(groupCol)
      .agg(TopKAgg.top_k(col("__score"), col("__key"), k).as("topk"))
      .select(col(groupCol), posexplode(col("topk")).as(Seq("pos", "hit")))
      .select(col(groupCol), (col("pos") + 1).cast("int").as("rank"),
        col("hit.id").as("key"))
  }

  /** Per-stratum TOKEN-BUDGET admission (quota ingest): in `orderCol`
    * order within each stratum, a document is admitted iff the running
    * token total THROUGH it stays ≤ `budget` — the maximal admissible
    * prefix (the running total advances over rejected documents too, so
    * once a stratum crosses its budget it is CLOSED; a later small
    * document does not reopen it). That prefix rule is exactly what a
    * streaming quota does — [[graft.streaming.StreamOps
    * .streamingBudgetAdmit]] is the trigger-by-trigger twin and the
    * parity is spec-pinned. `orderCol` must be a total order within
    * each stratum (ties would make the cumulative sum nondeterministic).
    * Output: the input plus (n_tok, cum_tok, admitted).
    *
    * Scale shape: one exchange keyed by stratum + an in-partition
    * cumulative-sum window over (orderCol, n_tok) pairs — the window
    * carries 16-byte rows, never text. A single dominant stratum
    * serializes its own scan (the window is per-stratum sequential by
    * semantics); shard the stratum key upstream if that ever binds.
    */
  def budgetAdmit(df: DataFrame, strataCol: String, orderCol: String,
      budget: Long, textCol: String = "text"): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val w = Window.partitionBy(strataCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tok",
        size(filter(split(col(textCol), " "), t => t =!= "")).cast("long"))
      .withColumn("cum_tok", sum("n_tok").over(w))
      .withColumn("admitted", col("cum_tok") <= budget)
  }

  /** Temperature-scaled mixture shares (the multilingual alpha-sampling
    * rule of XLM / mBERT, public: sample stratum s with probability
    * ∝ p_s^(1/T) where p_s is its natural token share) — T = 1 keeps
    * the corpus's own mixture, T → ∞ approaches uniform, the standard
    * knob for upweighting low-resource languages/domains without
    * hand-written shares. Output per stratum: (strataCol, n_tok,
    * nat_share, target_share rounded to 6) — feed into
    * [[mixturePlanFromShares]] → [[sampleStratified]] to materialize.
    *
    * Scale shape: ONE map-side-combinable token-count aggregate over
    * the corpus; the share arithmetic (two normalizations) runs on the
    * tiny per-stratum frame with 1-row broadcasts.
    */
  def temperatureShares(df: DataFrame, strataCol: String,
      temperature: Double, textCol: String = "text"): DataFrame = {
    require(temperature > 0.0,
      s"temperature must be positive: $temperature")
    val stats = df.groupBy(strataCol).agg(
      sum(size(split(col(textCol), " "))).cast("long").as("n_tok"))
    val tot = stats.agg(sum("n_tok").as("total_tok"))
    val nat = stats.crossJoin(broadcast(tot))
      .withColumn("nat_share",
        col("n_tok") / col("total_tok"))
      .withColumn("pw", pow(col("nat_share"), lit(1.0 / temperature)))
    val z = nat.agg(sum("pw").as("z"))
    nat.crossJoin(broadcast(z))
      .withColumn("target_share", round(col("pw") / col("z"), 6))
      .select(strataCol, "n_tok", "nat_share", "target_share")
  }

  /** Vocabulary induction with coverage: the top-V corpus words by
    * frequency (ties broken ascending by word — a total order, so the
    * vocab is deterministic at every scale) with each word's rank and
    * the cumulative fraction of total token mass the vocab covers
    * through it (1 − cum_frac at rank V = the OOV rate a V-word
    * closed vocabulary would pay).
    *
    * Scale shape: the corpus-wide work is ONE word-count aggregate
    * (map-side combined — the canonical wordcount exchange carries
    * (word, partial count), never text) and a TakeOrdered top-V — no
    * global sort. Rank and cumulative sum over the V-row result come
    * from a broadcast self-join (rank = how many rows sort ≤ me; V² ≤
    * 10⁴ comparisons for V = 100) instead of an unpartitioned window —
    * no single-partition stage anywhere in the plan.
    */
  def vocabulary(df: DataFrame, topV: Int,
      textCol: String = "text"): DataFrame = {
    require(topV > 0, s"topV must be positive: $topV")
    val counts = df
      .select(explode(split(col(textCol), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum("cnt").as("total_tok"))
    val top = counts
      .orderBy(col("cnt").desc, col("word").asc).limit(topV)
    val other = top.select(col("word").as("w2"), col("cnt").as("c2"))
    top.crossJoin(broadcast(total))
      .join(broadcast(other),
        col("c2") > col("cnt") ||
          (col("c2") === col("cnt") && col("w2") <= col("word")))
      .groupBy("word", "cnt", "total_tok")
      .agg(count(lit(1)).cast("int").as("rank"),
        sum("c2").as("cum_cnt"))
      .withColumn("cum_frac",
        round(col("cum_cnt").cast("double") / col("total_tok"), 6))
      .select("rank", "word", "cnt", "cum_frac")
  }

  /** Percentile outlier trimming (winsorize-drop): keep rows whose
    * metric lies within the corpus's [loQ, hiQ] interpolated
    * percentiles — the length-trim every curation recipe applies
    * (drop the empty-ish head and the mega-document tail before
    * training). Uses EXACT interpolated percentiles (SQL-replayable,
    * and the q107-certified `percentile_approx` is the documented
    * drop-in at 100 TB where the exact sort-based percentile is the
    * bottleneck). One aggregate, bounds broadcast back, per-row
    * filter — the corpus is touched twice, shuffled never.
    */
  def trimOutliers(df: DataFrame, metricCol: String, loQ: Double,
      hiQ: Double): DataFrame = {
    require(loQ >= 0.0 && loQ < hiQ && hiQ <= 1.0,
      s"need 0 <= loQ < hiQ <= 1: ($loQ, $hiQ)")
    val bounds = df.agg(
      percentile(col(metricCol), lit(loQ)).as("p_lo"),
      percentile(col(metricCol), lit(hiQ)).as("p_hi"))
    df.crossJoin(broadcast(bounds))
      .filter(col(metricCol) >= col("p_lo") &&
        col(metricCol) <= col("p_hi"))
  }

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    * Spirakis 2006 — public; the A-Res scheme): each row draws a
    * priority u^(1/w) from a uniform u and its weight w, and the k
    * highest priorities are the sample — every row's inclusion
    * probability is proportional to its weight, jointly correct
    * without replacement. The uniform is NOT an RNG: u derives from
    * `md5(key ":" seed)` (first 13 hex digits — 52 bits, exact in a
    * double), so the sample is a pure function of (key, seed) —
    * reproducible across reruns, cluster sizes, and engines (the
    * oracle replays it digit for digit). Ranking uses the monotone
    * transform ln(u)/w (no pow), ties broken by key asc.
    *
    * Scale shape: priority is a per-row projection; the top-k goes
    * through the bounded [[graft.functions.expressions.TopKAgg]] —
    * each map task ships at most k rows, no global sort. Rows with
    * w ≤ 0 are excluded (they have zero sampling mass).
    *
    * This is the size-weighted sampling step of a token-budgeted
    * corpus draw ("sample documents proportional to token count"),
    * complementing [[sampleStratified]]'s per-stratum rates.
    */
  /** Deterministic source-INTERLEAVED training order (the data-order
    * staple of large-scale pretraining dataloaders, public: maximal
    * spacing of same-source documents so the training stream never
    * sees long single-domain runs — long runs make gradient batches
    * domain-correlated). Two engine-portable md5 uniforms: documents
    * rank within their source by u1(key); the global order key is
    * (rank_in_source, u2(source, rank)) — round r emits every source
    * exactly once (the round-robin invariant, until a source runs
    * dry), with u2 rotating each round's source order so no fixed
    * alphabetical cycle leaks into the curriculum.
    *
    * Output adds (rank_in_source, interleave_u); ORDER BY
    * (rank_in_source, interleave_u, key) IS the training order. At
    * 100 TB that order is a range-partitioned sort on two numeric
    * keys — the [[globalShuffle]]/q119 discipline — never a
    * single-task window; the only shuffle here is the source-keyed
    * ranking window.
    */
  def interleaveBySource(df: DataFrame, byCol: String, key: Column,
      seed: Long): DataFrame = {
    val sixteen13 = math.pow(16.0, 13.0) // 2^52, exact
    val u1 = conv(substring(
      md5(concat(key.cast("string"), lit(":" + seed))), 1, 13), 16, 10)
      .cast("double") / lit(sixteen13)
    val w = Window.partitionBy(byCol).orderBy(col("__u1"), key)
    val u2 = conv(substring(
      md5(concat(col(byCol), lit(":"), col("rank_in_source").cast("string"),
        lit(":" + seed))), 1, 13), 16, 10)
      .cast("double") / lit(sixteen13)
    df.withColumn("__u1", u1)
      .withColumn("rank_in_source", row_number().over(w).cast("int"))
      .withColumn("interleave_u", u2)
      .drop("__u1")
  }

  def sampleWeighted(df: DataFrame, k: Int, weight: Column, key: Column,
      seed: Long): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    val sixteen13 = math.pow(16.0, 13.0) // 2^52, exact
    val hv = conv(substring(
      md5(concat(key.cast("string"), lit(":" + seed))), 1, 13), 16, 10)
      .cast("long").cast("double")
    val logpri = log((hv + 0.5) / sixteen13) / weight
    val scored = df.filter(weight > 0.0)
      .withColumn("__logpri", logpri)
      // loud cast guard: a non-numeric key would cast to null, which
      // the bounded top-k skips — the operator would silently return
      // an empty "sample" instead of failing
      .withColumn("__key",
        when(key.isNotNull && key.cast("long").isNull,
          raise_error(concat(
            lit("sampleWeighted: key is not castable to long: "),
            key.cast("string"))))
        .otherwise(key.cast("long")))
    import graft.functions.expressions.TopKAgg
    val winners = scored
      .agg(TopKAgg.top_k(col("__logpri"), col("__key"), k).as("topk"))
      .select(posexplode(col("topk")).as(Seq("pos", "hit")))
      .select((col("pos") + 1).cast("int").as("rank"),
        col("hit.id").as("__key"), col("hit.score").as("logpri"))
    // A-Res is a per-item scheme: `key` MUST be unique (the contract —
    // duplicate keys would re-attach every row sharing a winning key,
    // returning > k rows with repeated ranks). The guard is in-plan
    // over the ≤ k-keyed join output (a window over at most k groups,
    // not a corpus pass) and raises loudly instead of over-sampling.
    val wk = Window.partitionBy("__key")
    winners.join(scored.drop("__logpri"), Seq("__key"))
      .withColumn("rank",
        when(count(lit(1)).over(wk) > 1, raise_error(concat(
          lit("sampleWeighted: duplicate key value "), col("__key"),
          lit(" — the A-Res per-item contract needs a unique key; " +
            "dedup the input or choose a distinct key column"))))
        .otherwise(col("rank")))
      .drop("__key")
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

  /** Deterministic global shuffle — the last step of every training-data
    * export (decorrelate document order before the corpus is sharded
    * into training files). Each row's shuffle key is `md5(id ":" seed)`,
    * so the permutation is a pure function of (id, seed): reproducible
    * across reruns, cluster sizes, and engines (an auditor can replay
    * the exact order in any SQL engine — the q-oracle does, verbatim).
    * Output: the input row plus `shuffle_pos` (0-based global position).
    *
    * Scale shape — NO global-window sort: a range repartition on the
    * key spreads the sorted order across `partitions` tasks, each task
    * window-numbers ITS rows only (the exchange keyed by the bounded
    * partition id — parallelism = partitions throughout), and the
    * per-partition row counts (a `partitions`-row aggregate) broadcast
    * back as prefix-sum offsets. Two exchanges + one tiny agg total,
    * vs the single-task funnel of `row_number() OVER (ORDER BY …)`.
    */
  def globalShuffle(df: DataFrame, idCol: String, seed: Long,
      partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val nPart = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    // ONE materialization of the range partitioning: the offsets branch
    // and the numbering branch below must see the SAME partition
    // boundaries, but RangePartitioner re-samples bounds per physical
    // evaluation (sketch seed involves the RDD id) — two lazy
    // evaluations can disagree and mis-split the prefix offsets. The
    // output permutation itself is boundary-independent (contiguous
    // ranges of the same total order), so pinning any one evaluation
    // restores determinism. An export shuffle materializes the corpus
    // by definition, so the checkpoint is not an added pass.
    val keyed = df
      .withColumn("skey", md5(concat_ws(":", col(idCol), lit(seed))))
      .repartitionByRange(nPart, col("skey"), col(idCol))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint(true)
    // pid → rows-before-it offsets: prefix sums over the nPart-row count
    // table via a broadcast triangle self-join (the q97 discipline — no
    // single-partition window anywhere in the plan)
    val counts = keyed.groupBy("pid").agg(count(lit(1)).as("n"))
    val offsets = counts.as("a")
      .join(broadcast(counts.select(col("pid").as("bpid"),
        col("n").as("bn"))), col("bpid") < col("pid"), "left")
      .groupBy("pid")
      .agg(coalesce(sum("bn"), lit(0L)).as("offset"))
    val wIn = Window.partitionBy("pid").orderBy("skey", idCol)
    keyed
      .withColumn("pos_in_part", row_number().over(wIn).cast("long") - 1L)
      .join(broadcast(offsets), Seq("pid"))
      .withColumn("shuffle_pos", col("offset") + col("pos_in_part"))
      .drop("skey", "pid", "pos_in_part", "offset")
  }

  /** Leakage-safe train/val/test split: the unit of assignment is the
    * GROUP (near-dup cluster, source domain, url host…), never the row,
    * so two rows of the same group can NEVER straddle splits — the
    * contamination mode a row-level random split silently commits
    * (a train document's near-duplicate landing in test inflates eval).
    *
    * The decision is [[sampleStratified]]'s engine-portable md5-prefix
    * uniform: split = the first name whose CUMULATIVE fraction boundary
    * (`hexThreshold`) exceeds `substring(md5(group ":" seed), 1, 4)` —
    * a pure per-row projection, NO shuffle, no group table, and the
    * same group value always lands in the same split on any cluster
    * size or engine (the oracle replays the ladder verbatim). Fractions
    * must sum to 1 (±1e-9); the last split absorbs the top boundary.
    * Realized fractions are granular at the GROUP level: a split only
    * approximates its fraction when groups are numerous and none
    * dominates — exactly the regime splits are computed in.
    */
  def groupSplit(df: DataFrame, groupCol: String,
      splits: Seq[(String, Double)], seed: Long = 0L): DataFrame = {
    require(splits.nonEmpty, "groupSplit: need at least one split")
    require(splits.forall(_._2 > 0.0),
      s"groupSplit: every fraction must be positive: $splits")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"groupSplit: fractions must sum to 1: ${splits.map(_._2).sum}")
    require(splits.map(_._1).distinct.size == splits.size,
      s"groupSplit: duplicate split names: ${splits.map(_._1)}")
    val hv = substring(
      md5(concat(col(groupCol).cast("string"), lit(":" + seed))), 1, 4)
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    // ladder of cumulative boundaries; the last split is the otherwise
    // branch, so the full [0, 1) mass is always assigned
    val assigned = splits.init.zip(cum.init).reverse.foldLeft(
      lit(splits.last._1): Column) { case (acc, ((name, _), c)) =>
      when(hv < lit(hexThreshold(c)), lit(name)).otherwise(acc)
    }
    df.withColumn("split", assigned)
  }

  // ------------------------------------------- unigram-LM tokenizer

  /** SEED-vocabulary arithmetic for the unigram-LM trainer (public
    * art: Kudo 2018 "Subword Regularization", the SentencePiece
    * unigram model; the reference's OpenAI tokenizers are BPE —
    * unigram is the OTHER production tokenizer family): every
    * substring of length 1..`maxPieceLen` of every corpus word,
    * counted per occurrence position and weighted by word frequency.
    * Fully relational (one wordcount + two position explodes + one
    * re-aggregate), so the q219 oracle replays it verbatim in SQL —
    * this is the trainer's round-0 statistics table.
    *
    * Scale shape: the corpus is touched ONCE (the wordcount); the
    * explodes run over the DISTINCT-word frame × O(len × maxPieceLen)
    * — the [[bpeMerges]] discipline.
    */
  def unigramSeedCounts(df: DataFrame, maxPieceLen: Int = 4,
      textCol: String = "text"): DataFrame = {
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1: $maxPieceLen")
    val wc = df
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))
    wc.select(col("word"), col("freq"),
        explode(sequence(lit(1), length(col("word")))).as("i"))
      .select(col("word"), col("freq"), col("i"),
        explode(sequence(lit(1),
          least(lit(maxPieceLen),
            length(col("word")) - col("i") + 1))).as("l"))
      .select(col("word").substr(col("i"), col("l")).as("piece"),
        col("freq"))
      .groupBy("piece").agg(sum("freq").as("cnt"))
  }

  /** Trained unigram-LM vocabulary: (piece, n_chars, count, prob).
    *
    * Training (hard-EM, the Viterbi-EM variant of Kudo 2018 —
    * deterministic, integer expected counts):
    *  1. seed = top `seedSize` multi-char substrings by
    *     ([[unigramSeedCounts]] desc, piece asc) ∪ ALL corpus single
    *     chars (coverage — chars are never pruned);
    *  2. `emRounds` × { E: per distinct word, the Viterbi-best
    *     segmentation under current probs (log-likelihood; ties →
    *     longer last piece, recursively deterministic), counts =
    *     Σ word-freq per piece on the best path — INTEGERS;
    *     M: prob = count / total, zero-count multi-char pieces drop,
    *     chars floor at count 1 };
    *  3. prune to `vocabSize`: chars ∪ top multi-char pieces by
    *     (count desc, piece asc) — the count-based simplification of
    *     SentencePiece's likelihood-loss prune (a piece's loss is
    *     monotone in its expected count at fixed alternatives;
    *     UnigramSpec pins the hand-computed EM arithmetic) — then one
    *     final E-step so the reported counts describe the SHIPPED
    *     vocabulary.
    *
    * Scale shape (the [[bpeMergesLocal]] contract): one distributed
    * wordcount touches the corpus; every EM round is one
    * mapPartitions pass over the DISTINCT-WORD frame with the
    * vocab-sized prob table broadcast, plus one vocab-sized aggregate
    * — rounds over the vocabulary, never the corpus.
    */
  def unigramVocab(df: DataFrame, vocabSize: Int = 512,
      maxPieceLen: Int = 4, emRounds: Int = 2, seedSize: Int = 2048,
      textCol: String = "text"): DataFrame = {
    require(vocabSize >= 1 && emRounds >= 1 && seedSize >= 1,
      "unigramVocab: vocabSize, emRounds, seedSize must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val words = df
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .as[(String, Long)]
      .localCheckpoint(true)
    val seeds = unigramSeedCounts(df, maxPieceLen, textCol)
      .localCheckpoint(true)
    val chars = seeds.filter(length(col("piece")) === 1)
      .as[(String, Long)].collect()
    val multi = seeds.filter(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece"))
      .limit(seedSize).as[(String, Long)].collect()
    var vocab: Map[String, Long] = (chars ++ multi).toMap
    (1 to emRounds).foreach { _ =>
      val counted = viterbiCounts(spark, words, vocab, maxPieceLen)
      // M-step: zero-count multi-char pieces drop; chars floor at 1
      vocab = counted ++
        chars.map { case (c, _) => c -> counted.getOrElse(c, 1L) }.toMap
    }
    // prune to vocabSize (chars always kept), then re-derive the
    // shipped vocabulary's own counts with one final E-step
    val keepMulti = vocab.toSeq.filter(_._1.length > 1)
      .sortBy { case (p, c) => (-c, p) }
      .take(math.max(0, vocabSize - chars.length)).toMap
    val pruned = keepMulti ++
      chars.map { case (c, _) => c -> vocab.getOrElse(c, 1L) }.toMap
    val finalCounts = viterbiCounts(spark, words, pruned, maxPieceLen)
    val shipped = pruned.keySet.toSeq.sorted.map { p =>
      (p, p.length, finalCounts.getOrElse(p,
        if (p.length == 1) 1L else 0L))
    }
    val total = shipped.map(_._3).sum.toDouble
    shipped.toDF("piece", "n_chars", "count")
      .withColumn("prob", round(col("count") / lit(total), 9))
  }

  /** One hard-EM E-step: Viterbi-best segmentation per distinct word
    * under `vocab`'s count-proportional probs, integer counts
    * aggregated word-freq-weighted. Distributed over the word frame;
    * the vocab rides a broadcast.
    */
  private def viterbiCounts(spark: SparkSession,
      words: org.apache.spark.sql.Dataset[(String, Long)],
      vocab: Map[String, Long], maxPieceLen: Int): Map[String, Long] = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(vocab)
    words.mapPartitions { it =>
      val v = bc.value
      val total = math.max(1L, v.values.sum).toDouble
      val logp = v.map { case (p, c) =>
        p -> math.log(math.max(1L, c) / total) }
      val acc = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { case (w, f) =>
        viterbiSegment(w, logp, maxPieceLen, total).foreach(p =>
          acc.update(p, acc.getOrElse(p, 0L) + f))
      }
      acc.iterator
    }.groupBy("_1").agg(sum("_2").as("c"))
      .as[(String, Long)].collect().toMap
  }

  /** Viterbi segmentation of one word: maximize Σ log p(piece); ties
    * prefer the longer last piece (recursively deterministic). Chars
    * absent from the vocab (possible at encode time on unseen text)
    * fall back to a floor prob of 0.5/total — always feasible, never
    * a crash on new data.
    */
  private[operators] def viterbiSegment(word: String,
      logp: Map[String, Double], maxPieceLen: Int,
      total: Double): Seq[String] = {
    val n = word.length
    if (n == 0) return Nil
    val floor = math.log(0.5 / math.max(1.0, total))
    val best = new Array[Double](n + 1)
    val back = new Array[Int](n + 1) // length of the best last piece
    var i = 1
    while (i <= n) {
      best(i) = Double.NegativeInfinity
      var l = 1
      val lMax = math.min(maxPieceLen, i)
      while (l <= lMax) {
        val piece = word.substring(i - l, i)
        val lp = logp.getOrElse(piece,
          if (l == 1) floor else Double.NegativeInfinity)
        if (lp != Double.NegativeInfinity) {
          val s = best(i - l) + lp
          // >= : at equal score the LONGER last piece (larger l,
          // visited later) wins — the documented tie-break
          if (s >= best(i)) { best(i) = s; back(i) = l }
        }
        l += 1
      }
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var j = n
    while (j > 0) { out += word.substring(j - back(j), j); j -= back(j) }
    out.reverse.toSeq
  }

  /** [[bpeEncodeTokens]]' unigram twin: per-document token sequences
    * under a trained [[unigramVocab]] — (doc_id, n_words, n_tokens,
    * tokens_str, rt_ok), rt_ok pinning the lossless roundtrip
    * (concatenating each word's pieces reproduces the word). The
    * corpus is touched once; the Viterbi DP runs over the
    * DISTINCT-word frame with the vocab broadcast.
    */
  def unigramEncodeTokens(df: DataFrame, vocab: DataFrame,
      maxPieceLen: Int = 4, textCol: String = "text",
      idCol: String = "doc_id", sep: String = "|"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val v = vocab.select("piece", "count").as[(String, Long)]
      .collect().toMap
    val total = math.max(1L, v.values.sum).toDouble
    val logp = v.map { case (p, c) =>
      p -> math.log(math.max(1L, c) / total) }
    val bc = spark.sparkContext.broadcast(logp)
    val words = df
      .select(col(idCol), posexplode(split(col(textCol), " "))
        .as(Seq("pos", "word")))
      .filter(col("word") =!= "")
    val enc = words.select("word").distinct().as[String]
      .mapPartitions { it =>
        val lp = bc.value
        it.map(w => (w, viterbiSegment(w, lp, maxPieceLen, total)))
      }.toDF("word", "syms")
    val rebuilt = words.join(enc, Seq("word"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"),
        sum(size(col("syms"))).as("n_tokens"),
        array_join(flatten(transform(
          array_sort(collect_list(struct(col("pos"), col("syms")))),
          s => s.getField("syms"))), sep).as("tokens_str"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("word")))),
          s => s.getField("word")), " ").as("rt_text"))
    rebuilt.join(df.select(col(idCol), col(textCol)), Seq(idCol))
      .withColumn("rt_ok", col("rt_text") ===
        array_join(filter(split(col(textCol), " "), w => w =!= ""), " "))
      .select(col(idCol), col("n_words"), col("n_tokens"),
        col("tokens_str"), col("rt_ok"))
  }

  /** [[tokenizerFertility]]'s unigram twin: tokens per word and chars
    * per token per stratum under a trained [[unigramVocab]] — the
    * same one-explode + vocab-join + stratum-keyed aggregate shape.
    */
  def unigramFertility(df: DataFrame, vocab: DataFrame,
      maxPieceLen: Int = 4, byCol: String = "lang",
      textCol: String = "text"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val v = vocab.select("piece", "count").as[(String, Long)]
      .collect().toMap
    val total = math.max(1L, v.values.sum).toDouble
    val logp = v.map { case (p, c) =>
      p -> math.log(math.max(1L, c) / total) }
    val bc = spark.sparkContext.broadcast(logp)
    val words = df
      .select(col(byCol), explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
    val enc = words.select("word").distinct().as[String]
      .mapPartitions { it =>
        val lp = bc.value
        it.map { w =>
          (w, viterbiSegment(w, lp, maxPieceLen, total).length.toLong,
            w.length.toLong)
        }
      }.toDF("word", "n_sym", "n_chars")
    words.join(enc, Seq("word"))
      .groupBy(byCol)
      .agg(count(lit(1)).as("n_words"),
        sum("n_sym").as("n_tokens"),
        round(sum("n_sym").cast("double") / count(lit(1)), 6)
          .as("fertility"),
        round(sum("n_chars").cast("double") / sum("n_sym"), 6)
          .as("chars_per_token"))
  }
}
