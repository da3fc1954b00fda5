package graft.operators

import graft.functions.VectorOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines
  * (SURVEY.md §2.5 A9; mandated by BASELINE.json's north star). Five
  * flavors: exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine.
  *
  * Scale design: every per-document signature (shingles, minhashes, simhash)
  * is computed with built-in higher-order functions INSIDE the row — no
  * explode/shuffle for signature building; the only shuffles are the
  * candidate-pair groupBys/joins, which operate on signatures (tiny) rather
  * than full text. At 100 TB the LSH band-bucket join touches
  * O(n · bands) small rows, never O(n²) pairs.
  */
object Dedup {

  /** Word k-shingles as a distinct array column — a native single-pass
    * expression (the composed `transform`/`slice`/`concat_ws` form
    * evaluated one lambda tree per window and dominated every
    * shingle-based operator's runtime).
    */
  def shingles(text: Column, k: Int = 3): Column =
    graft.functions.expressions.HashExpressions.shingles_k(
      split(lower(trim(text)), "\\s+"), k)

  /** Exact dedup: canonical representative = min id per identical text.
    * Two-phase so the wide exchange carries ONLY the 8-byte xxhash64:
    * phase 1 aggregates (hash → min id, count) without text; the residual
    * equality check then re-groups by (hash, text) on just the
    * hash-colliding slice — true duplicates plus astronomically-rare
    * 64-bit collisions — so full document text never rides the main
    * shuffle. Semantics identical to grouping by text directly.
    */
  def exact(documents: DataFrame): DataFrame = {
    val hashed = documents.select(col("doc_id"), col("text"),
      xxhash64(col("text")).as("text_hash"))
    val byHash = hashed.select("doc_id", "text_hash")
      .groupBy("text_hash")
      .agg(min("doc_id").as("keep_doc_id"), count(lit(1)).as("n_copies"))
    val singletons = byHash.filter(col("n_copies") === 1)
      .select("keep_doc_id", "n_copies", "text_hash")
    val resolved = hashed
      .join(byHash.filter(col("n_copies") > 1).select("text_hash"),
        Seq("text_hash"), "left_semi")
      .groupBy(col("text_hash"), col("text"))
      .agg(min("doc_id").as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .select("keep_doc_id", "n_copies", "text_hash")
    singletons.unionByName(resolved)
  }

  /** Per-row MinHash signature: numHashes permutations approximated by
    * seeded xxhash64 over each shingle; min per seed. No shuffle.
    */
  def minHashSignature(shingleCol: Column, numHashes: Int): Column =
    graft.functions.expressions.HashExpressions.minhash_sig(shingleCol, numHashes)

  /** MinHash+LSH near-duplicate pairs: shingle → minhash → band →
    * bucket-join → exact-Jaccard verification of candidates.
    *
    * bands × rowsPerBand = numHashes. Output: (doc_id_a, doc_id_b, jaccard)
    * with doc_id_a < doc_id_b and verified jaccard >= threshold.
    */
  def minHashLsh(
      documents: DataFrame,
      k: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.5): DataFrame = {
    val withSig = minHashSigned(documents, k, numHashes)
    val shingleTable = withSig.select("doc_id", "sh")
    val banded = minHashBandRows(withSig, numHashes, bands)
    val a = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_id_a"))
    val b = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_id_b"))
    val cand = a.join(b, Seq("band", "bucket"))
      .filter(col("doc_id_a") < col("doc_id_b"))
      .select("doc_id_a", "doc_id_b")
      .dropDuplicates("doc_id_a", "doc_id_b")
    // exact Jaccard verification on the candidates only
    cand
      .join(shingleTable.select(col("doc_id").as("doc_id_a"),
        col("sh").as("sh_a")), Seq("doc_id_a"))
      .join(shingleTable.select(col("doc_id").as("doc_id_b"),
        col("sh").as("sh_b")), Seq("doc_id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .filter(col("jaccard") >= threshold)
      .select("doc_id_a", "doc_id_b", "jaccard")
  }

  /** (doc_id, band, bucket) rows from a signed frame — the key-space of
    * the minhash candidate bucket join (one row per doc per band;
    * bucket = xxhash64 of the band's signature slice). ONLY ids flow
    * through the bucket join — the (large) shingle arrays are
    * re-attached to the deduplicated candidate pairs afterwards, so the
    * widest shuffle carries 24-byte rows, not document signatures.
    * `private[graft]` so the banding scale sweep (graft.tools.DedupTune)
    * measures the exact key-space the operator exchanges on.
    */
  private[graft] def minHashBandRows(
      withSig: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    val rowsPerBand = numHashes / bands
    withSig.select(
      col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))))
        .as(Seq("band", "bucket")))
  }

  /** Shingle + minhash signature frame: (doc_id, sh, sig). */
  private[graft] def minHashSigned(
      documents: DataFrame, k: Int, numHashes: Int): DataFrame =
    documents
      .select(col("doc_id"), shingles(col("text"), k).as("sh"))
      .withColumn("sig", minHashSignature(col("sh"), numHashes))

  /** 64-bit SimHash of word tokens, built per-row from builtins: for each
    * bit position, sum the signs of xxhash64(token) bits; bit set when
    * positive. Near-dups = pairs with hamming distance <= maxHamming,
    * found via the pigeonhole trick (split 64 bits into `pieces` bands —
    * any pair within distance d < pieces shares at least one exact band).
    */
  def simHash(text: Column): Column =
    graft.functions.expressions.HashExpressions.simhash64(
      array_distinct(split(lower(text), "\\s+")))

  def hammingDist(a: Column, b: Column): Column =
    call_function("bit_count", a.bitwiseXOR(b)).cast("int")

  /** (doc_id, sh64, piece, piece_val) rows — the key-space of the
    * simhash pigeonhole bucket join. `private[graft]` for the banding
    * scale sweep (graft.tools.DedupTune).
    */
  private[graft] def simHashBandRows(
      documents: DataFrame, pieces: Int): DataFrame = {
    val bitsPerPiece = 64 / pieces
    documents.select(col("doc_id"), simHash(col("text")).as("sh64"))
      .select(col("doc_id"), col("sh64"),
        posexplode(transform(sequence(lit(0), lit(pieces - 1)),
          p => call_function("shiftright", col("sh64"), p * bitsPerPiece)
            .bitwiseAND(lit((1L << bitsPerPiece) - 1))))
          .as(Seq("piece", "piece_val")))
  }

  def simHashDedup(
      documents: DataFrame,
      maxHamming: Int = 3,
      pieces: Int = 4): DataFrame = {
    val banded = simHashBandRows(documents, pieces)
    val l = banded.select(col("piece"), col("piece_val"),
      col("doc_id").as("doc_id_a"), col("sh64").as("h_a"))
    val r = banded.select(col("piece"), col("piece_val"),
      col("doc_id").as("doc_id_b"), col("sh64").as("h_b"))
    l.join(r, Seq("piece", "piece_val"))
      .filter(col("doc_id_a") < col("doc_id_b"))
      .dropDuplicates("doc_id_a", "doc_id_b")
      .withColumn("hamming", hammingDist(col("h_a"), col("h_b")))
      .filter(col("hamming") <= maxHamming)
      .select("doc_id_a", "doc_id_b", "hamming")
  }

  /** Exact n-gram Jaccard similarity over ALL pairs above a threshold,
    * computed the scalable way: explode shingles → equi-join on shingle →
    * count intersections → |A∪B| = |A|+|B|−|A∩B|. SQL-expressible, so this
    * one has a DuckDB oracle. The shingle equi-join shuffles on the shingle
    * value — at 100 TB, frequent-shingle skew is handled by dropping
    * ubiquitous shingles (doc-frequency cap), the standard trick. The cap
    * is ON by default (a shingle in >128 docs identifies nothing and only
    * quadratically inflates its join key); union sizes stay exact, so
    * capping only prunes candidate generation for ubiquitous shingles.
    * Oracles mirror the same cap, so results stay verified even when the
    * cap binds.
    */
  val DefaultMaxShingleDocFreq: Long = 128L

  def ngramJaccard(
      documents: DataFrame,
      k: Int = 3,
      threshold: Double = 0.5,
      maxShingleDocFreq: Long = DefaultMaxShingleDocFreq): DataFrame = {
    val withSh = documents
      .select(col("doc_id"), shingles(col("text"), k).as("sh"))
    val sh = withSh.select(col("doc_id"), explode(col("sh")).as("shingle"))
    val filtered =
      if (maxShingleDocFreq == Long.MaxValue) sh
      else {
        val freq = sh.groupBy("shingle")
          .agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxShingleDocFreq)
        sh.join(freq.select("shingle"), Seq("shingle"))
      }
    // The cap prunes CANDIDATE GENERATION only; emitted scores are exact.
    // Two phases keep that cheap: (1) count shared CAPPED shingles per
    // pair through the equi-join — no arrays shipped, the 100 TB-shaped
    // plan — which bounds the exact jaccard from both sides (a pair can
    // hide at most min(capped_a, capped_b) extra shared shingles); (2)
    // re-verify WITH the full shingle arrays only the pairs whose upper
    // bound reaches the threshold. When the cap doesn't bind the bounds
    // coincide and phase 2 touches exactly the result set; a pair whose
    // every shared shingle is ubiquitous is never nominated (the
    // documented trade).
    // per-doc stats in ONE frame: shingle count from the array itself
    // (shingles are distinct by construction — no explode/re-aggregate),
    // capped count from the uncapped survivors
    val docStats = withSh
      .select(col("doc_id"), size(col("sh")).cast("long").as("n_sh"))
      .join(filtered.groupBy("doc_id").agg(count(lit(1)).as("n_kept")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_sh"),
        (col("n_sh") - coalesce(col("n_kept"), lit(0L))).as("n_capped"))
    val interCapped = filtered.as("x")
      .join(filtered.as("y"), Seq("shingle"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_id_a"), col("y.doc_id").as("doc_id_b"))
      .agg(count(lit(1)).as("inter_c"))
    val bounded = interCapped
      .join(docStats.select(col("doc_id").as("doc_id_a"),
        col("n_sh").as("n_a"), col("n_capped").as("c_a")), Seq("doc_id_a"))
      .join(docStats.select(col("doc_id").as("doc_id_b"),
        col("n_sh").as("n_b"), col("n_capped").as("c_b")), Seq("doc_id_b"))
      .withColumn("i_max", col("inter_c") + least(col("c_a"), col("c_b")))
      .withColumn("j_upper", col("i_max").cast("double")
        / (col("n_a") + col("n_b") - col("i_max")))
      .filter(col("j_upper") >= threshold)
      .select("doc_id_a", "doc_id_b")
    bounded
      .join(withSh.select(col("doc_id").as("doc_id_a"), col("sh").as("sh_a")),
        Seq("doc_id_a"))
      .join(withSh.select(col("doc_id").as("doc_id_b"), col("sh").as("sh_b")),
        Seq("doc_id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .filter(col("jaccard") >= threshold)
      .select("doc_id_a", "doc_id_b", "jaccard")
  }

  /** Connected-components-lite over near-duplicate pairs (SURVEY A9:
    * "keep min id per cluster"): iterative min-label propagation until
    * fixpoint (bounded). Each iteration is one join + one min-aggregate;
    * cluster diameter bounds the iteration count, so near-dup clusters
    * (almost always stars/short chains) converge in 2-3 rounds. Returns
    * (doc_id, cluster_id = min doc_id of the component).
    */
  def clusters(pairs: DataFrame, maxIter: Int = 10): DataFrame =
    clustersWithRounds(pairs, maxIter)._1

  /** [[clusters]] plus the number of propagation rounds it took —
    * measurement surface for `graft.tools.DedupTune cc`.
    */
  private[graft] def clustersWithRounds(
      pairs: DataFrame, maxIter: Int): (DataFrame, Int) = {
    // localCheckpoint truncates the (possibly expensive) pair-generation
    // lineage so each propagation round replans only the tiny graph.
    // Pairs are materialized ONCE before the symmetrizing union — a
    // union of two selects over the raw `pairs` would carry two copies
    // of the whole pair-generation subplan (Spark reuses exchanges, not
    // arbitrary common subtrees), paying the generation twice.
    val p = pairs.select(col("doc_id_a"), col("doc_id_b"))
      .localCheckpoint(true)
    val edges = p.select(col("doc_id_a").as("src"), col("doc_id_b").as("dst"))
      .unionByName(p.select(col("doc_id_b").as("src"), col("doc_id_a").as("dst")))
      .distinct()
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("cluster_id", col("doc_id"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("doc_id", "src"), Seq("src"))
        .select(col("dst").as("doc_id"), col("cluster_id"))
      // lazy checkpoint: the convergence count below materializes it, so
      // each round costs exactly ONE Spark job
      val next = labels.unionByName(viaNeighbors)
        .groupBy("doc_id")
        .agg(min("cluster_id").as("cluster_id"))
        .localCheckpoint(false)
      val changed = next.join(labels.withColumnRenamed("cluster_id", "old"),
        Seq("doc_id"))
        .filter(col("cluster_id") =!= col("old"))
        .limit(1).count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    // an unconverged exit would silently return wrong components (labels
    // still mid-propagation); fail loudly instead — maxIter bounds the
    // component DIAMETER, so raise it for pathologically long chains
    if (!converged) throw new IllegalStateException(
      s"cluster label propagation did not converge within $maxIter rounds; " +
        "a near-dup component has a longer min-label path — raise maxIter")
    (labels, iter)
  }

  /** Connected components in O(log n) ROUNDS — the alternating
    * large-star/small-star algorithm (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14). Same contract and
    * output as [[clusters]]: `(doc_id, cluster_id = min id of the
    * component)` for every node appearing in `pairs`.
    *
    * Why it exists alongside [[clusters]]: min-label propagation runs
    * one round per unit of component DIAMETER. Near-dup clusters are
    * almost always stars (2–3 rounds), but a boilerplate chain — doc A
    * near-dups B near-dups C without A~C, the classic template-drift
    * shape in web corpora — has diameter O(chain length), and at 100 TB
    * a 1 000-deep chain means 1 000 sequential shuffle rounds. The
    * alternating algorithm contracts every component to a star centered
    * at its minimum in O(log n) rounds REGARDLESS of diameter:
    *
    *   - large-star: for each node u, hook every neighbor v > u to
    *     m = min(Γ(u) ∪ u);
    *   - small-star: orienting edges high→low, hook every low neighbor
    *     (and u itself) to that minimum.
    *
    * Each half-round is one partition-by-node window (min over the
    * neighborhood) + one distinct — edges only, never payloads. At the
    * fixpoint the edge set IS the answer: every edge reads
    * (member, component-min). Like [[clusters]], an unconverged exit
    * fails loudly rather than returning mid-contraction labels.
    */
  def clustersAlternating(pairs: DataFrame, maxIter: Int = 25): DataFrame =
    clustersAlternatingWithRounds(pairs, maxIter)._1

  /** [[clustersAlternating]] plus the number of (large-star + small-star)
    * rounds it took — measurement surface for `graft.tools.DedupTune cc`.
    */
  private[graft] def clustersAlternatingWithRounds(
      pairs: DataFrame, maxIter: Int): (DataFrame, Int) = {
    import org.apache.spark.sql.expressions.Window
    // pair generation is materialized ONCE; allNodes and edges below are
    // cheap scans of the checkpointed frame instead of each carrying
    // their own copy of the (possibly expensive) generation subplan
    val p = pairs.select(col("doc_id_a"), col("doc_id_b"))
      .localCheckpoint(true)
    // every node appearing in pairs must come back labeled — including
    // nodes whose ONLY pair is a degenerate self-pair (a, a), which the
    // canonical-edge filter below rightly discards as an edge but must
    // not silently drop as a node (the clusters() contract); used once
    // at the end, so it stays a lazy derivation of the checkpoint
    val allNodes = p.select(col("doc_id_a").as("doc_id"))
      .unionByName(p.select(col("doc_id_b").as("doc_id")))
      .distinct()
    // canonical high→low edges
    var edges = p
      .select(greatest(col("doc_id_a"), col("doc_id_b")).as("src"),
        least(col("doc_id_a"), col("doc_id_b")).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(true)
    // a large-star round: symmetrize, then for each center u hook its
    // LARGER neighbors to the neighborhood min (≤ u, so output stays
    // canonical high→low). NOT deduped here: the window min is
    // duplicate-insensitive and smallStar's trailing distinct
    // canonicalizes the round, so an intermediate distinct would only
    // add a shuffle (output stays O(|E|) — one row per input edge).
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.unionByName(
        e.select(col("dst").as("src"), col("src").as("dst")))
      val m = min(least(col("dst"), col("src")))
        .over(Window.partitionBy("src"))
      sym.withColumn("m", m)
        .filter(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
    }
    // a small-star round: edges already point high→low, so Γ(u) here is
    // u's smaller neighbors; hook them all (and u) to the min. The one
    // trailing distinct canonicalizes the whole round's edge set.
    def smallStar(e: DataFrame): DataFrame = {
      val withM = e.withColumn("m",
        min(col("dst")).over(Window.partitionBy("src")))
      withM.select(col("dst").as("src"), col("m").as("dst"))
        .filter(col("src") =!= col("dst"))
        .unionByName(withM.select(col("src"), col("m").as("dst")))
        .distinct()
    }
    // fixpoint test = ONE aggregate job per round: both frames are
    // distinct edge SETS, so (count, xor of per-edge hashes) equality is
    // set equality up to a collision that must simultaneously preserve
    // the count AND two independently-seeded xxhash64 xors (≈2⁻¹²⁸ per
    // probe — far below any cluster's job-failure floor; the q80 oracle
    // pins output identity in CI regardless).
    // Replaces the two exceptAll anti-join jobs per round that dominated
    // q80's wall-clock (driver-side loop cost, not executor work), and
    // doubles as the materialization of the round's lazy checkpoint.
    def sig(e: DataFrame): (Long, Long, Long) = {
      val r = e.agg(count(lit(1)), expr("bit_xor(xxhash64(src, dst))"),
        expr("bit_xor(xxhash64(dst, src, 1))")).head()
      (r.getLong(0),
        if (r.isNullAt(1)) 0L else r.getLong(1),
        if (r.isNullAt(2)) 0L else r.getLong(2))
    }
    var edgeSig = sig(edges)
    var iter = 0
    var converged = edgeSig._1 == 0L
    while (iter < maxIter && !converged) {
      val next = smallStar(largeStar(edges)).localCheckpoint(false)
      val nextSig = sig(next)
      converged = nextSig == edgeSig
      edges = next
      edgeSig = nextSig
      iter += 1
    }
    if (!converged) throw new IllegalStateException(
      s"alternating connected components did not converge within $maxIter " +
        "rounds; raise maxIter (expected O(log n) — this indicates a " +
        "pathological graph or a far larger component count than sized for)")
    // stars: every edge is (member, min); centers label themselves, and
    // self-pair-only isolates (no star edge) fall back to their own id
    val starLabels = edges
      .select(col("src").as("doc_id"), col("dst").as("cluster_id"))
    (allNodes
      .join(starLabels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      .distinct(), iter)
  }

  /** Thresholds at or above this route through hyperplane-LSH candidate
    * generation instead of the all-pairs crossJoin. The floor is where the
    * collision math makes banding reliable: at cos 0.8 a hyperplane agrees
    * with probability 1 − θ/π ≈ 0.795, so an 8-bit table collides with
    * p ≈ 0.795⁸ ≈ 0.16 and 64 independent tables miss the pair with
    * (1 − 0.16)⁶⁴ ≈ 4e-5 (at cos 0.9 the miss is ~3e-10). Below the floor
    * collision probabilities decay too fast for any sub-quadratic banding
    * (measured for the fixture's 0.35–0.75 band — COVERAGE.md A9), so the
    * exact path is kept there by design.
    */
  val LshCosineFloor: Double = 0.8

  /** Embedding-cosine near-duplicate pairs above a threshold.
    *
    * `threshold >= LshCosineFloor`: sub-quadratic — hyperplane-LSH bucket
    * self-join generates candidate id pairs (the widest exchange carries
    * (table, bucket, id) rows only), then the exact cosine re-verifies
    * each candidate, so emitted pairs are exactly thresholded. This is
    * the 100 TB shape: O(n · tables) bucket rows instead of O(n²) pairs.
    *
    * Below the floor: exact all-pairs (crossJoin) — no LSH family serves
    * low-cosine bands sub-quadratically (measured; see LshCosineFloor).
    * Because that plan is O(n²), it is gated by an explicit scale
    * contract: the input is counted (one O(n) pass — only on this
    * branch) and the call FAILS LOUDLY past
    * `spark.graft.dedup.maxExactRows` (default 100 000 ≈ 5 × 10⁹ pairs,
    * a deliberate day-job ceiling) instead of silently shipping a
    * cartesian at 100× — the same fail-don't-degrade convention as
    * `clusters`' convergence gate. Raising the cap is the caller's
    * explicit opt-in to the quadratic cost.
    */
  def embeddingCosine(
      embeddings: DataFrame,
      threshold: Double = 0.95,
      lshTables: Int = 64,
      lshBits: Int = 8): DataFrame =
    if (threshold >= LshCosineFloor)
      cosineVerify(lshSelfCandidates(embeddings, lshTables, lshBits),
        embeddings, threshold)
    else {
      val maxRows = embeddings.sparkSession.conf
        .get("spark.graft.dedup.maxExactRows", "100000").toLong
      val n = embeddings.count()
      require(n <= maxRows,
        s"embeddingCosine(threshold=$threshold < LshCosineFloor=" +
          s"$LshCosineFloor) is exact all-pairs O(n²), and n=$n exceeds " +
          s"spark.graft.dedup.maxExactRows=$maxRows. Raise the threshold " +
          s"to >= $LshCosineFloor (sub-quadratic LSH mode), use " +
          "embeddingCosineClustered (sub-quadratic, measured recall — " +
          "see q77), or raise the cap to opt in to the quadratic cost.")
      embeddingCosineExact(embeddings, threshold)
    }

  /** Sub-quadratic APPROXIMATE cosine pairs for thresholds BELOW
    * [[LshCosineFloor]] — the band where no LSH family is sub-quadratic
    * (measured, see the floor's scaladoc) and the exact path is O(n²).
    * Shape: deterministic k-means centroids → each vector assigned to
    * its `assignTop` nearest lists (bounded TopKAgg, O(assignTop) rows
    * per vector out of the map side) → all-pairs WITHIN a shared list →
    * exact cosine verification. Soundness is exact (every emitted pair
    * really clears the threshold — same `cosineVerify` as the LSH
    * mode); completeness is approximate — pairs whose members share no
    * probed list are missed — and MEASURED, not asserted: the q77
    * invariant pins the recall floor against the exact pair set at
    * every fixture scale, and `DedupTune cosine` prints the
    * recall/cost curve vs (lists, assignTop).
    *
    * Cost: expected list size is n·assignTop/lists, so pair work is
    * ~n²·assignTop²/lists (the exchanges carry id rows only; vectors
    * are re-attached per nominated pair). The tradeoff is MEASURED and
    * honest (BASELINE.md round-5 table): recall tracks the absolute
    * `lists` count (n = 2 000: 8 lists → 1.00, 32 → 0.84; n = 20 000:
    * 312 → 0.44), so holding recall while n grows means holding
    * `lists` — a²/lists of the exact work, a constant-factor win, NOT
    * an asymptotic escape: no family is sub-quadratic in this band
    * (the round-4 measurement behind [[LshCosineFloor]]). Choose
    * `lists` for the recall you need and pay n²·a²/lists.
    *
    * `centroids`: pass a precomputed `(centroid_id, centroid_vec)`
    * frame — e.g. a persisted IVF index's centroid table
    * ([[graft.sources.AnnIndex.IvfHandle.centroids]]) — to skip the
    * in-call k-means; training once per corpus instead of once per
    * dedup call is the serving shape at scale (`lists`/`iters` are
    * ignored when provided).
    */
  def embeddingCosineClustered(
      embeddings: DataFrame,
      threshold: Double,
      lists: Int = 16,
      assignTop: Int = 4,
      iters: Int = 3,
      centroids: Option[DataFrame] = None): DataFrame = {
    import graft.functions.expressions.TopKAgg.top_k
    val cents = broadcast(centroids.getOrElse(
      SimilaritySearch.kMeansCentroids(
        embeddings.select("vec_id", "embedding"), lists, iters)))
    val assigned = embeddings.select("vec_id", "embedding")
      .crossJoin(cents)
      .withColumn("csim",
        VectorOps.cosine(col("embedding"), col("centroid_vec")))
      .groupBy("vec_id")
      .agg(top_k(col("csim"), col("centroid_id").cast("long"), assignTop)
        .as("tc"))
      .select(col("vec_id"), explode(col("tc.id")).as("centroid_id"))
    val a = assigned.select(col("centroid_id"), col("vec_id").as("vec_id_a"))
    val b = assigned.select(col("centroid_id"), col("vec_id").as("vec_id_b"))
    val cand = a.join(b, Seq("centroid_id"))
      .filter(col("vec_id_a") < col("vec_id_b"))
      .select("vec_id_a", "vec_id_b")
      .dropDuplicates("vec_id_a", "vec_id_b")
    cosineVerify(cand, embeddings, threshold)
  }

  /** Exact all-pairs form — the quadratic baseline the LSH mode is
    * verified against (and the only exact option below LshCosineFloor).
    */
  private[graft] def embeddingCosineExact(
      embeddings: DataFrame,
      threshold: Double): DataFrame = {
    // norms are computed ONCE per vector before the pair join (an O(n)
    // projection), so the O(n^2) pair stage only does one dot product
    val withNorm = embeddings.select(col("vec_id"), col("embedding"),
      VectorOps.l2Norm(col("embedding")).as("nrm"))
    val a = withNorm.select(col("vec_id").as("vec_id_a"),
      col("embedding").as("emb_a"), col("nrm").as("nrm_a"))
    val b = withNorm.select(col("vec_id").as("vec_id_b"),
      col("embedding").as("emb_b"), col("nrm").as("nrm_b"))
    a.crossJoin(b)
      .filter(col("vec_id_a") < col("vec_id_b"))
      .withColumn("cos",
        when(col("nrm_a") * col("nrm_b") === 0.0, lit(0.0))
          .otherwise(VectorOps.dot(col("emb_a"), col("emb_b"))
            / (col("nrm_a") * col("nrm_b"))))
      .filter(col("cos") >= threshold)
      .select("vec_id_a", "vec_id_b", "cos")
  }

  /** Candidate id pairs from a hyperplane-LSH bucket SELF-join: pairs
    * sharing a bucket in any of `tables` tables. Id-only — embeddings are
    * re-attached per side only for the nominated pairs.
    */
  private def lshSelfCandidates(
      embeddings: DataFrame, tables: Int, bits: Int): DataFrame = {
    import graft.functions.expressions.VectorExpressions.lsh_buckets
    val banded = embeddings.select(col("vec_id"),
      posexplode(lsh_buckets(col("embedding"), tables, bits))
        .as(Seq("table", "bucket")))
    val a = banded.select(col("table"), col("bucket"),
      col("vec_id").as("vec_id_a"))
    val b = banded.select(col("table"), col("bucket"),
      col("vec_id").as("vec_id_b"))
    a.join(b, Seq("table", "bucket"))
      .filter(col("vec_id_a") < col("vec_id_b"))
      .select("vec_id_a", "vec_id_b")
      .dropDuplicates("vec_id_a", "vec_id_b")
  }

  /** Exact cosine over nominated id pairs: re-attach each side's vector
    * (two equi-joins), score once, threshold. Emitted scores are exact
    * regardless of how the candidates were generated.
    */
  private def cosineVerify(
      cand: DataFrame, embeddings: DataFrame, threshold: Double): DataFrame = {
    val withNorm = embeddings.select(col("vec_id"), col("embedding"),
      VectorOps.l2Norm(col("embedding")).as("nrm"))
    cand
      .join(withNorm.select(col("vec_id").as("vec_id_a"),
        col("embedding").as("emb_a"), col("nrm").as("nrm_a")), Seq("vec_id_a"))
      .join(withNorm.select(col("vec_id").as("vec_id_b"),
        col("embedding").as("emb_b"), col("nrm").as("nrm_b")), Seq("vec_id_b"))
      .withColumn("cos",
        when(col("nrm_a") * col("nrm_b") === 0.0, lit(0.0))
          .otherwise(VectorOps.dot(col("emb_a"), col("emb_b"))
            / (col("nrm_a") * col("nrm_b"))))
      .filter(col("cos") >= threshold)
      .select("vec_id_a", "vec_id_b", "cos")
  }

  /** WINNOWING document fingerprints (Schleimer, Wilkerson & Aiken,
    * "Winnowing: Local Algorithms for Document Fingerprinting",
    * SIGMOD 2003 — the MOSS algorithm; public): hash every k-token
    * gram, slide a window of `w` consecutive gram hashes, keep each
    * window's MINIMUM — the selected hash set is the fingerprint.
    * The paper's guarantee: any shared token run of length ≥ w + k − 1
    * yields at least one shared fingerprint, with expected density
    * 2/(w+1) — a principled, tunable thinning that MinHash does not
    * give (MinHash bounds RESEMBLANCE; winnowing bounds CONTAINMENT of
    * long runs, the plagiarism/boilerplate shape).
    *
    * The gram hash is the engine-portable md5-prefix 52-bit value (the
    * [[CorpusOps.sampleWeighted]] uniform — the oracle replays it
    * digit for digit); at 100 TB swap in xxhash64 for cheaper hashing,
    * the selection logic is hash-agnostic. Documents shorter than k
    * tokens have no grams and are absent (the [[CorpusOps
    * .dupShingleStats]] contract).
    *
    * Scale shape: fingerprint construction is a PURE PER-ROW
    * projection (one native single-pass kernel, [[graft.functions
    * .expressions.WinnowFpF]]: each gram hashed once, O(L·w) window
    * comparisons — compute bound per document, zero shuffle, no
    * corpus-wide state; the earlier nested higher-order-function
    * formulation re-evaluated the O(L) md5 array inside every
    * window's lambda and cost ~400× more wall-clock at sf0.1).
    * Output: (idCol, fp) distinct per document.
    */
  def winnowFingerprints(df: DataFrame, k: Int = 4, w: Int = 4,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(k >= 1 && w >= 1, s"need k, w >= 1: ($k, $w)")
    import graft.functions.expressions.TextExpressions.winnow_fp
    val toks = filter(split(col(textCol), " "), t => t =!= "")
    df.filter(size(toks) >= k)
      .select(col(idCol), explode(winnow_fp(toks, k, w)).as("fp"))
  }

  /** Cross-document overlap pairs from [[winnowFingerprints]] output:
    * candidate pairs share a fingerprint; `dfCap` drops fingerprints
    * present in more than that many documents (ubiquitous boilerplate
    * phrases would otherwise pair-explode quadratically — the
    * [[jaccardNearDups]] df-cap discipline), and pairs must share at
    * least `minShared` surviving fingerprints. Output: (doc_id_a <
    * doc_id_b, n_shared).
    *
    * Scale shape: one fp-keyed document-frequency aggregate + one
    * fp-keyed self-join carrying ONLY (8-byte fp, id) — text never
    * shuffles; the df-cap bounds each fingerprint's pair fan-out at
    * dfCap², so the pair stage is linear in surviving fp postings.
    */
  def winnowPairs(fps: DataFrame, dfCap: Int = 10,
      minShared: Int = 2): DataFrame = {
    require(dfCap >= 2, s"dfCap must be >= 2 to form any pair: $dfCap")
    require(minShared >= 1, s"minShared must be >= 1: $minShared")
    val rare = fps.groupBy("fp")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap && col("df") >= 2)
      .select("fp")
    val kept = fps.join(rare, Seq("fp"))
    kept.select(col("fp"), col("doc_id").as("doc_id_a"))
      .join(kept.select(col("fp"), col("doc_id").as("doc_id_b")),
        Seq("fp"))
      .filter(col("doc_id_a") < col("doc_id_b"))
      .groupBy("doc_id_a", "doc_id_b")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** LINE-level corpus dedup (the Dolma "dedupe by paragraph" /
    * CCNet paragraph-hash pass; public): split each document on
    * newlines, count per distinct line the number of DOCUMENTS it
    * appears in, and cut every line whose document frequency exceeds
    * `maxDf` — repeated navigation headers, cookie banners, license
    * footers, the boilerplate exact-doc dedup never sees because the
    * surrounding text differs. Whitespace-only lines are never counted
    * or cut (they carry no content and would otherwise be the most
    * "duplicated" lines in any corpus). Returns every input row with
    * `text` rewritten (kept lines re-joined with \n, original order),
    * plus (n_lines, n_cut).
    *
    * Scale shape: the df aggregate exchanges ONLY (8-byte xxhash64,
    * doc id) pairs — never line text; the over-threshold hash set
    * joins back hash-keyed; the rewrite is a pure per-row lambda
    * (re-split, drop flagged positions, re-join). Document text can
    * ride at most the ONE per-doc rewrite join ([[cutLines]]): when
    * the planner broadcasts the (id, positions) cut side — the usual
    * case, cuts touch only boilerplate-affected docs — text stays in
    * place; when both sides are large, store the corpus id-BUCKETED
    * (the q64 layout) and the join needs no text exchange at all.
    * Nothing here assumes the cut set fits in memory — no forced
    * broadcast, no driver collect. PlanInvariantsSpec pins the
    * hash-only df machinery and bounds text-carrying exchanges at
    * one per rewrite.
    */
  def dedupLines(df: DataFrame, maxDf: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(maxDf >= 1, s"maxDf must be >= 1: $maxDf")
    val lines = lineRows(df, textCol, idCol)
    val hot = lines.select(col(idCol), col("lh")).distinct()
      .groupBy("lh").agg(count(lit(1)).as("line_df"))
      .filter(col("line_df") > maxDf)
      .select("lh")
    cutLines(df, lines, hot, textCol, idCol)
  }

  /** (id, pos, lh) — one row per NON-BLANK line of each document
    * (blank lines carry no content and never count toward df or cuts).
    */
  private[graft] def lineRows(df: DataFrame, textCol: String,
      idCol: String): DataFrame =
    df.select(col(idCol),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .filter(trim(col("line")) =!= "")
      .select(col(idCol), col("pos"), xxhash64(col("line")).as("lh"))

  /** Rewrite each document dropping the positions whose line-hash is
    * in `hot` (a 1-column `lh` frame): hash-keyed join, per-doc cut
    * set, pure per-row lambda rewrite — document text never rides an
    * exchange. Adds (n_lines, n_cut).
    */
  private[graft] def cutLines(df: DataFrame, lines: DataFrame,
      hot: DataFrame, textCol: String, idCol: String): DataFrame = {
    val lineArr = split(col(textCol), "\n")
    val isBlank = (l: Column) => trim(l) === ""
    val cuts = lines.join(hot, Seq("lh"))
      .groupBy(idCol).agg(collect_set(col("pos")).as("__cut"))
    df.join(cuts, Seq(idCol), "left")
      .withColumn("n_lines",
        size(filter(lineArr, l => !isBlank(l))).cast("long"))
      .withColumn("n_cut",
        coalesce(size(col("__cut")), lit(0)).cast("long"))
      .withColumn(textCol, array_join(
        zip_with(lineArr, sequence(lit(0), size(lineArr) - 1),
          (l, i) => when(array_contains(
              coalesce(col("__cut"), array().cast("array<int>")), i),
            lit(null)).otherwise(l)),
        "\n"))
      .drop("__cut")
  }
}
