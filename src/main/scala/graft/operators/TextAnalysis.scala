package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (BASELINE.json north
  * star): language-ID, quality scoring, token counting, document
  * fingerprinting. All pure per-row projections from built-in functions —
  * no UDF, no shuffle; they scale linearly and stay in whole-stage codegen.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword count estimate: word-piece regex split — words,
    * numbers, punctuation runs each count as tokens, long words count
    * ceil(len/4) merges (a standard cheap proxy for BPE token counts).
    */
  def bpeTokenEstimate(text: Column): Column = {
    val pieces = split(text, "(?<=\\W)(?=\\w)|(?<=\\w)(?=\\W)|\\s+")
    aggregate(
      filter(pieces, p => length(trim(p)) > 0),
      lit(0L),
      (acc, p) => acc + ceil(length(p).cast("double") / 4.0).cast("long"))
  }

  /** Quality features + a composite score in [0,1]:
    * length, token count, mean word length, punctuation ratio, stopword
    * ratio, uppercase ratio — the classic cheap quality heuristics.
    */
  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "be", "this", "that", "from")

  def qualityFeatures(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val toks = split(lower(trim(t)), "\\s+")
    val nTok = tokenCount(t)
    val stopArr = array(Stopwords.map(lit): _*)
    df.withColumn("n_chars_obs", length(t))
      .withColumn("n_tokens", nTok)
      .withColumn("mean_tok_len",
        when(nTok === 0, lit(0.0))
          .otherwise(aggregate(toks, lit(0L), (a, x) => a + length(x))
            .cast("double") / nTok))
      .withColumn("punct_ratio",
        when(length(t) === 0, lit(0.0))
          .otherwise(length(regexp_replace(t, "[^\\p{Punct}]", ""))
            .cast("double") / length(t)))
      .withColumn("stopword_ratio",
        when(nTok === 0, lit(0.0))
          .otherwise(size(filter(toks, x => array_contains(stopArr, x)))
            .cast("double") / nTok))
      .withColumn("upper_ratio",
        when(length(t) === 0, lit(0.0))
          .otherwise(length(regexp_replace(t, "[^A-Z]", ""))
            .cast("double") / length(t)))
      .withColumn("quality_score",
        round(
          least(lit(1.0), col("n_tokens").cast("double") / 50.0) * 0.4 +
          (lit(1.0) - least(lit(1.0), col("punct_ratio") * 5.0)) * 0.3 +
          least(lit(1.0), col("stopword_ratio") * 4.0) * 0.3, 6))
  }

  /** Language-ID by stopword-profile voting: score each candidate language
    * by hits of its marker words, predict the argmax (ties → alphabetical).
    * A real system would use character n-gram profiles; markers keep it
    * deterministic and dependency-free. Profiles cover the fixture's lang
    * codes (FIXTURES.md: en/es/zh/de/...).
    */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "a", "value", "table", "row"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "una"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "nicht"),
    "fr" -> Seq("le", "la", "les", "des", "est", "une", "dans"),
    "zh" -> Seq("de", "shi", "le", "zai", "you", "wo"))

  /** Character-trigram language-ID (the classic n-gram heuristic):
    * profile per language = the distinct char trigrams of its marker
    * vocabulary; score = |doc trigrams ∩ profile|; predict argmax
    * (alphabetical first on ties). Built-ins only, per-row.
    */
  def languageIdNgram(df: DataFrame, textCol: String = "text"): DataFrame = {
    def charTrigrams(s: String): Seq[String] =
      if (s.length < 3) Seq(s) else (0 to s.length - 3).map(i => s.substring(i, i + 3)).distinct
    val profiles = LangMarkers.toSeq.sortBy(_._1).map { case (lang, ws) =>
      lang -> ws.flatMap(w => charTrigrams(" " + w + " ")).distinct
    }
    val toks = split(lower(trim(col(textCol))), "\\s+")
    val docTri =
      graft.functions.expressions.HashExpressions.char_trigrams(toks)
    val scoreCols = profiles.map { case (lang, tris) =>
      val arr = array(tris.map(lit): _*)
      struct(size(array_intersect(docTri, arr)).as("hits"), lit(lang).as("lang"))
    }
    val best = aggregate(
      array(scoreCols: _*),
      struct(lit(-1).as("hits"), lit("").as("lang")),
      (acc, s) => when(s.getField("hits") > acc.getField("hits"), s).otherwise(acc))
    df.withColumn("predicted_lang_ngram", best.getField("lang"))
      .withColumn("trigram_hits", best.getField("hits"))
  }

  def languageId(df: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = split(lower(trim(col(textCol))), "\\s+")
    val scoreCols = LangMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      val arr = array(markers.map(lit): _*)
      struct(
        size(filter(toks, x => array_contains(arr, x))).as("hits"),
        lit(lang).as("lang"))
    }
    // array_max on struct(hits, lang): max hits, then max lang — to get
    // alphabetical-first ties we negate nothing and order langs desc-proof:
    // sort desc by hits then asc by lang via reverse trick below.
    val best = aggregate(
      array(scoreCols: _*),
      struct(lit(-1).as("hits"), lit("").as("lang")),
      (acc, s) => when(s.getField("hits") > acc.getField("hits"), s).otherwise(acc))
    df.withColumn("predicted_lang", best.getField("lang"))
      .withColumn("marker_hits", best.getField("hits"))
  }

  /** [[languageId]] plus a CONFIDENCE estimate: Laplace-smoothed share
    * of the winner's marker hits, conf = (hits_best + 1) /
    * (Σ_lang hits + |langs|) ∈ (0, 1] — a probability-shaped score a
    * calibration pass ([[Evaluation.calibration]], q163) can audit
    * against ground truth. Adds (predicted_lang, marker_hits,
    * total_hits, lang_conf); same per-row zero-shuffle shape.
    */
  def languageIdWithConf(df: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = split(lower(trim(col(textCol))), "\\s+")
    val profiles = LangMarkers.toSeq.sortBy(_._1)
    val scoreCols = profiles.map { case (lang, markers) =>
      val arr = array(markers.map(lit): _*)
      struct(
        size(filter(toks, x => array_contains(arr, x))).as("hits"),
        lit(lang).as("lang"))
    }
    val best = aggregate(
      array(scoreCols: _*),
      struct(lit(-1).as("hits"), lit("").as("lang")),
      (acc, s) => when(s.getField("hits") > acc.getField("hits"), s).otherwise(acc))
    val total = aggregate(
      array(scoreCols: _*), lit(0),
      (acc, s) => acc + s.getField("hits"))
    df.withColumn("predicted_lang", best.getField("lang"))
      .withColumn("marker_hits", best.getField("hits"))
      .withColumn("total_hits", total)
      .withColumn("lang_conf",
        (col("marker_hits") + 1) /
          (col("total_hits") + lit(profiles.size.toDouble)))
  }

  /** Repetition quality signals (the Gopher-style repetitious-text
    * filters): fraction of the document that is its single most frequent
    * word, and fraction of word bigrams that are repeats. Both are
    * computed PER ROW with no shuffle by one native O(L) pass
    * ([[graft.functions.expressions.RepetitionStatsF]]: hash-map token
    * counts, hash-set bigram dedup) — linear in corpus size, where the
    * naive explode + groupBy(doc, token) formulation would shuffle every
    * token of a 100 TB corpus, and the earlier composed
    * array_sort + aggregate-fold form paid an interpreted lambda tree
    * per token (the measured per-row bottleneck of the bench).
    */
  def repetitionSignals(df: DataFrame, textCol: String = "text"): DataFrame = {
    val st = graft.functions.expressions.TextExpressions
      .repetition_stats(split(col(textCol), " "))
    df.withColumn("__rs", st)
      .withColumn("n_tok", col("__rs.n_tok"))
      .withColumn("top_word_frac",
        when(col("__rs.n_tok") === 0, lit(0.0))
          .otherwise(round(
            col("__rs.top_count").cast("double") / col("__rs.n_tok"), 6)))
      .withColumn("dup_bigram_frac",
        when(col("__rs.n_bi") === 0, lit(0.0))
          .otherwise(round(lit(1.0) -
            col("__rs.n_bi_distinct").cast("double") / col("__rs.n_bi"), 6)))
      .drop("__rs")
  }

  /** The Gopher repetitious-text rule set (Rae et al. 2021 §A1.1 — the
    * published quality filters production pretraining pipelines apply):
    * per document, the character fraction of its highest-coverage word
    * {2,3,4}-gram (count × chars of the n-gram over the document's
    * char length) and the token fraction covered by duplicated
    * {5..10}-grams (positions under any occurrence of an n-gram
    * appearing ≥ 2 times in the document). Gopher drops documents when
    * e.g. top2_frac > 0.20 or dup10_frac > 0.10; this emits the raw
    * fractions so thresholds stay policy.
    *
    * Scale shape: one native O(L)-per-row pass
    * ([[graft.functions.expressions.GopherStatsF]]) — zero shuffle,
    * linear in corpus tokens; the relational formulation (explode all
    * n-grams for 9 values of n, groupBy(doc, n, gram)) would shuffle
    * 9× the corpus token stream. The DuckDB oracle runs exactly that
    * relational formulation — an independent recomputation.
    */
  def gopherSignals(df: DataFrame, textCol: String = "text"): DataFrame = {
    val st = graft.functions.expressions.TextExpressions
      .gopher_stats(split(col(textCol), " "))
    val nc = length(col(textCol))
    val base = df.withColumn("__g", st)
      .withColumn("n_tok", col("__g.n_tok"))
    val withTops = (2 to 4).foldLeft(base) { (d, n) =>
      d.withColumn(s"top${n}_frac",
        when(nc === 0, lit(0.0)).otherwise(
          round(col(s"__g.top${n}_cov").cast("double") / nc, 6)))
    }
    (5 to 10).foldLeft(withTops) { (d, n) =>
      d.withColumn(s"dup${n}_frac",
        when(col("n_tok") === 0, lit(0.0)).otherwise(
          round(col(s"__g.dup${n}_cov").cast("double") / col("n_tok"), 6)))
    }.drop("__g")
  }

  /** CCNet-style n-gram language-model quality scoring: train an
    * interpolated bigram LM on the corpus itself and score every document
    * by per-token cross-entropy (low = fluent/typical, high =
    * gibberish/outlier — the classic perplexity quality filter, scored
    * here against the corpus's own distribution since no external LM may
    * be shipped).
    *
    * Model (add-α smoothing over the corpus vocabulary V, linear
    * interpolation λ):
    *   p_uni(w)      = (c(w) + α) / (N + α·|V|)
    *   p_bi(w|w')    = (c(w', w) + α) / (c(w') + α·|V|)
    *   p(w_1)        = p_uni(w_1)
    *   p(w_i | prev) = λ·p_bi + (1−λ)·p_uni        (i > 1)
    * Output per doc: (doc_id, n_tok, cross_entropy = −mean ln p rounded
    * to 6, ppl = exp(cross_entropy) rounded to 4). Empty documents emit
    * no row.
    *
    * Scale shape: the LM is two map-side-combinable count aggregates
    * (unigram and bigram tables — shuffles keyed by token, linear in
    * corpus size; at 100 TB these tables ARE the model and stay
    * distributed, never collected). Scoring is three hash joins of the
    * token stream against them (keyed tok / prev / (prev, tok)), each
    * exchange carrying only (doc_id, token, 8-byte count), then one
    * doc-keyed avg. The (N, |V|) scalars ride a broadcast; the previous
    * token is derived per-row by zipping the token array with its own
    * shift — no window, no self-join.
    */
  def lmScore(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", alpha: Double = 0.1,
      lambda: Double = 0.7): DataFrame = {
    require(alpha > 0.0, s"alpha must be positive: $alpha")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1]: $lambda")
    val arr = filter(split(col(textCol), " "), t => t =!= "")
    // (tok, prev) pairs in document order; prev = null for the first token.
    // The trailing isNotNull filter drops the row arrays_zip pads for an
    // EMPTY token array (zipping [] against the [null] prev seed yields a
    // (tok=null) row): without it an empty/whitespace-only document would
    // inject a null unigram into the vocabulary, inflating |V| and N for
    // every document's probability. Real first tokens always have
    // tok != null, so only the padding row is removed.
    val stream = df
      .select(col(idCol), explode(arrays_zip(
        arr.as("tok"),
        concat(array(lit(null).cast("string")),
          slice(arr, lit(1), greatest(size(arr) - 1, lit(0)))).as("prev")))
        .as("z"))
      .select(col(idCol), col("z.tok").as("tok"), col("z.prev").as("prev"))
      .filter(col("tok").isNotNull)
    val uni = stream.groupBy("tok").agg(count(lit(1)).as("c1"))
    val bi = stream.filter(col("prev").isNotNull)
      .groupBy("prev", "tok").agg(count(lit(1)).as("c2"))
    val tot = uni.agg(sum("c1").as("n_total"),
      count(lit(1)).as("v_size"))
    val pUni = (col("c1") + alpha) / (col("n_total") + col("v_size") * alpha)
    val pBi = (col("c2") + alpha) / (col("c1_prev") + col("v_size") * alpha)
    val scored = stream
      .join(uni, Seq("tok"))
      .join(uni.select(col("tok").as("prev"), col("c1").as("c1_prev")),
        Seq("prev"), "left")
      .join(bi, Seq("prev", "tok"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("p",
        when(col("prev").isNull, pUni)
          .otherwise(pBi * lambda + pUni * (1.0 - lambda)))
    scored.groupBy(idCol)
      .agg(count(lit(1)).as("n_tok"),
        round(-avg(log(col("p"))), 6).as("cross_entropy"),
        round(exp(-avg(log(col("p")))), 4).as("ppl"))
  }

  /** Text normalization pipeline: Unicode NFC (native
    * [[graft.functions.expressions.NfcNormalizeF]] — canonical
    * composition, fully specified by Unicode so any conformant engine
    * replays it), whitespace-run collapse to single spaces, remaining
    * control-character strip, trim. Adds `norm_text`. Pure per-row
    * projections — zero shuffle, linear; the regex steps stay in the
    * Java∩RE2 subset (the redactPii discipline) so the oracle replays
    * them verbatim.
    */
  def normalizeText(df: DataFrame, textCol: String = "text"): DataFrame =
    // controls become SPACES first, then whitespace runs collapse —
    // stripping controls after the collapse would leave "a  b"
    // as a double space, violating the single-space contract
    df.withColumn("norm_text",
      trim(regexp_replace(
        regexp_replace(
          graft.functions.expressions.TextExpressions
            .nfc_normalize(col(textCol)),
          "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]", " "),
        "[ \\t\\n\\r]+", " ")))

  /** Rolling-hash document fingerprint (winnowing-style): polynomial
    * rolling hash of each k-token window (O(n) native expression),
    * fingerprint = min window hash — plus a full-text xxhash64.
    */
  def fingerprint(df: DataFrame, textCol: String = "text", k: Int = 5): DataFrame = {
    val toks = split(lower(trim(col(textCol))), "\\s+")
    val n = size(toks)
    df.withColumn("fingerprint_min",
        graft.functions.expressions.HashExpressions.rolling_min_hash(toks, k))
      .withColumn("fingerprint_full", xxhash64(col(textCol)))
      .withColumn("n_windows", greatest(lit(1), n - (k - 1)))
  }

  /** Compression-ratio quality signal: (doc_id, raw_len, deflate_len,
    * compress_ratio) per document — the zlib-ratio filter production
    * pipelines use to drop boilerplate/repetition (ratio too low) and
    * high-entropy gibberish (ratio ≈ 1). Pure per-row native
    * projection — zero shuffle, linear in corpus bytes; an empty
    * document reports ratio 1.0 (nothing to judge).
    */
  def compressionSignals(df: DataFrame, textCol: String = "text",
      level: Int = 6): DataFrame = {
    import graft.functions.expressions.TextExpressions.deflate_stats
    df.withColumn("ds", deflate_stats(col(textCol), level))
      .withColumn("raw_len", col("ds.raw_len"))
      .withColumn("deflate_len", col("ds.deflate_len"))
      .withColumn("compress_ratio",
        when(col("raw_len") === 0, lit(1.0))
          .otherwise(col("deflate_len").cast("double") / col("raw_len")))
      .drop("ds")
  }

  /** DSIR-style importance weights for domain-targeted data selection
    * (Xie et al. 2023, "Data Selection for Language Models via
    * Importance Resampling" — public): score every document by the
    * log-likelihood ratio of a TARGET-domain unigram LM over the RAW
    * corpus unigram LM, averaged per token (length-normalized so long
    * documents don't dominate by token count alone). Downstream,
    * [[CorpusOps.sampleWeighted]] over `exp(log_w)` IS the importance
    * resampling step — the composition q149 ships.
    *
    * Both LMs use add-α smoothing over the SHARED raw-corpus
    * vocabulary (the target is a subset of the corpus, so every scored
    * token has a raw count; target counts coalesce to 0):
    *   log_w(d) = avg_tok [ ln((c_t + α)/(N_t + α|V|))
    *                      − ln((c_r + α)/(N_r + α|V|)) ]
    * Output: (doc_id, n_tok, log_w rounded to 6). Empty documents emit
    * no row; an empty target set fails loudly (weights would degenerate
    * to a constant and "resampling" would silently be uniform).
    *
    * Scale shape (the [[lmScore]] discipline): two map-side-combinable
    * unigram count aggregates (token-keyed, linear — at 100 TB the
    * count tables stay distributed), one hash join of the token stream
    * against the raw table plus a LEFT join against the target table
    * (exchanges carry (doc_id, token, 8-byte count) only), scalars ride
    * one broadcast, then a doc-keyed avg.
    */
  def importanceWeights(df: DataFrame, targetPred: Column,
      textCol: String = "text", idCol: String = "doc_id",
      alpha: Double = 0.1): DataFrame = {
    require(alpha > 0.0, s"alpha must be positive: $alpha")
    val arr = filter(split(col(textCol), " "), t => t =!= "")
    val toks = df.select(col(idCol), targetPred.as("__tgt"),
        explode(arr).as("tok"))
    val uniR = toks.groupBy("tok").agg(count(lit(1)).as("cr"))
    val uniT = toks.filter(col("__tgt"))
      .groupBy("tok").agg(count(lit(1)).as("ct"))
    val tot = uniR.agg(sum("cr").as("nr"), count(lit(1)).as("v"))
      .crossJoin(uniT.agg(
        // loud empty-target guard rides the same 1-row aggregate
        when(coalesce(sum("ct"), lit(0L)) === 0L,
          raise_error(lit("importanceWeights: target predicate matched " +
            "no tokens — the likelihood ratio is undefined; fix the " +
            "predicate or the corpus")))
          .otherwise(sum("ct")).as("nt")))
    toks
      .join(uniR, Seq("tok"))
      .join(uniT, Seq("tok"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("lr",
        log((coalesce(col("ct"), lit(0L)) + alpha)
          / (col("nt") + col("v") * alpha))
          - log((col("cr") + alpha) / (col("nr") + col("v") * alpha)))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tok"),
        round(avg(col("lr")), 6).as("log_w"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020 — public):
    * label every document head / middle / tail by its [[lmScore]]
    * perplexity TERCILE WITHIN its language — the standard quality
    * stratification a curation pipeline mixes on (head = most fluent
    * third under the LM). Boundaries are the exact interpolated
    * per-language (⅓, ⅔) percentiles of ppl; a document is `head` when
    * ppl ≤ p33, `middle` when ≤ p66, else `tail` (boundary ties go to
    * the better bucket — value-based, so no rank tie-break
    * nondeterminism). Output: (doc_id, lang-col, n_tok, ppl, bucket).
    *
    * Scale shape: [[lmScore]] as documented; the boundary table is one
    * ≤-languages-row aggregate that BROADCASTS (the [[CorpusOps
    * .trimOutliers]] discipline — no per-language sort window over the
    * corpus, so a dominant language cannot pin a single task);
    * `percentile_approx` is the certified 100 TB drop-in (q107).
    */
  def perplexityBuckets(df: DataFrame, byCol: String = "lang",
      textCol: String = "text", idCol: String = "doc_id",
      alpha: Double = 0.1, lambda: Double = 0.7): DataFrame = {
    val scored = lmScore(df, textCol, idCol, alpha, lambda)
      .join(df.select(col(idCol), col(byCol)), Seq(idCol))
    val bounds = scored.groupBy(byCol).agg(
      percentile(col("ppl"), lit(1.0 / 3.0)).as("p33"),
      percentile(col("ppl"), lit(2.0 / 3.0)).as("p66"))
    scored.join(broadcast(bounds), Seq(byCol))
      .withColumn("bucket",
        when(col("ppl") <= col("p33"), lit("head"))
          .when(col("ppl") <= col("p66"), lit("middle"))
          .otherwise(lit("tail")))
      .select(col(idCol), col(byCol), col("n_tok"), col("ppl"),
        col("bucket"))
  }
}
