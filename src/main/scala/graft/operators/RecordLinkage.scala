package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity resolution by BLOCKED pairwise matching — the record-linkage
  * pipeline (public art: Fellegi-Sunter blocking, Dedoop/Magellan-style
  * blocking joins): a cheap deterministic BLOCKING KEY partitions the
  * records, candidate pairs form only WITHIN a block, an edit-distance
  * predicate keeps the matches, and the match graph collapses to
  * entity clusters with the existing connected-components machinery
  * ([[Dedup.clusters]]). The whole reason this scales is what it never
  * does: an all-pairs comparison. At 100 TB the pair stage is one
  * hash-partitioned self-join on the blocking key; the block-size
  * guard makes the quadratic-within-block cost explicit and LOUD
  * instead of discovered in production.
  */
object RecordLinkage {

  /** Candidate match pairs: records sharing `blockKey`, paired once
    * (id_a < id_b), kept when `levenshtein(name_a, name_b) <= maxDist`.
    * Output: (id_a, id_b, name_a, name_b, dist).
    *
    * The largest block is probed FIRST (one aggregate + limit-1
    * collect): a degenerate blocking key — empty string, a constant —
    * silently recreates the all-pairs join this operator exists to
    * avoid, so it is refused loudly with the offending block named.
    */
  def blockedPairs(
      records: DataFrame,
      idCol: String,
      nameCol: String,
      blockKey: Column,
      maxDist: Int = 2,
      maxBlock: Long = 100000L): DataFrame = {
    val blocked = records.select(col(idCol).as("id"),
      col(nameCol).as("name"), blockKey.as("blk"))
    guardBlocks(blocked, maxBlock)
    val a = blocked.select(col("blk"), col("id").as("id_a"),
      col("name").as("name_a"))
    val b = blocked.select(col("blk"), col("id").as("id_b"),
      col("name").as("name_b"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
      .select("id_a", "id_b", "name_a", "name_b", "dist")
  }

  /** The degenerate-blocking-key refusal shared by every pair stage:
    * one aggregate + limit-1 collect, loud with the offending block
    * named (an empty-string or constant key silently recreates the
    * all-pairs join this operator exists to avoid).
    */
  private def guardBlocks(blocked: DataFrame, maxBlock: Long): Unit = {
    val oversize = blocked.groupBy("blk").agg(count(lit(1)).as("n"))
      .filter(col("n") > maxBlock).limit(1).collect()
    require(oversize.isEmpty, {
      val r = oversize.head
      s"blockedPairs: block '${r.get(0)}' holds ${r.getLong(1)} records " +
        s"(> maxBlock=$maxBlock) — the within-block pairing is " +
        "quadratic; refine the blocking key or raise maxBlock " +
        "deliberately"
    })
  }

  /** One field's comparison spec for [[scoredPairs]] — the
    * Fellegi-Sunter (1969, public) parameters: `agree` compares the
    * pair's two sides (any predicate — equality, an edit-distance
    * bound, a numeric tolerance; a null comparison counts as
    * DISAGREEMENT — evidence that can't be evaluated supports no
    * match), `m` = P(agree | true match), `u` = P(agree | non-match).
    * Agreement contributes log₂(m/u) to the pair's score,
    * disagreement log₂((1−m)/(1−u)).
    */
  final case class FieldAgreement(field: String,
      agree: (Column, Column) => Column, m: Double, u: Double) {
    require(0.0 < u && u < m && m < 1.0,
      s"FieldAgreement($field): need 0 < u < m < 1, got m=$m u=$u " +
        "(agreement must be MORE likely under a true match)")
    def agreeWeight: Double = math.log(m / u) / math.log(2.0)
    def disagreeWeight: Double =
      math.log((1.0 - m) / (1.0 - u)) / math.log(2.0)
  }

  /** Multi-attribute scored candidate pairs — the Fellegi-Sunter
    * log-odds form of [[blockedPairs]] (one-field edit distance is the
    * toy; real linkage weighs EVIDENCE across fields): records sharing
    * `blockKey` pair once (id_a < id_b), each field contributes its
    * agree/disagree log-odds weight, pairs scoring ≥ `minScore` are
    * matches. Output: (id_a, id_b, agree_<field>..., score).
    *
    * Scale shape is unchanged from [[blockedPairs]] — the same
    * hash-partitioned blocking self-join with the same loud
    * degenerate-block refusal; the per-field comparators and the
    * weighted sum are per-pair projections, free at the exchange.
    */
  def scoredPairs(
      records: DataFrame,
      idCol: String,
      fields: Seq[FieldAgreement],
      blockKey: Column,
      minScore: Double,
      maxBlock: Long = 100000L): DataFrame = {
    require(fields.nonEmpty, "scoredPairs: no field specs")
    require(fields.map(_.field).distinct.size == fields.size,
      "scoredPairs: duplicate field names")
    val cols = fields.map(_.field)
    val blocked = records.select(
      col(idCol).as("id") +: blockKey.as("blk") +: cols.map(col): _*)
    guardBlocks(blocked, maxBlock)
    val a = blocked.select(col("blk") +: col("id").as("id_a") +:
      cols.map(c => col(c).as(s"${c}_a")): _*)
    val b = blocked.select(col("blk") +: col("id").as("id_b") +:
      cols.map(c => col(c).as(s"${c}_b")): _*)
    val paired = fields.foldLeft(
      a.join(b, Seq("blk")).filter(col("id_a") < col("id_b"))) {
      case (df, f) => df.withColumn(s"agree_${f.field}",
        coalesce(f.agree(col(s"${f.field}_a"), col(s"${f.field}_b")),
          lit(false)))
    }
    val score = fields.map(f =>
      when(col(s"agree_${f.field}"), lit(f.agreeWeight))
        .otherwise(lit(f.disagreeWeight))).reduce(_ + _)
    paired.withColumn("score", score)
      .filter(col("score") >= minScore)
      .select(Seq(col("id_a"), col("id_b")) ++
        fields.map(f => col(s"agree_${f.field}")) :+ col("score"): _*)
  }

  /** [[resolveEntities]] over the multi-attribute scored matcher:
    * scored pairs at `minScore` → alternating-CC closure → canonical
    * entity = min id per cluster.
    */
  def resolveEntitiesScored(
      records: DataFrame,
      idCol: String,
      fields: Seq[FieldAgreement],
      blockKey: Column,
      minScore: Double,
      maxBlock: Long = 100000L): DataFrame = {
    val pairs = scoredPairs(records, idCol, fields, blockKey, minScore,
        maxBlock)
      .select(col("id_a").as("doc_id_a"), col("id_b").as("doc_id_b"))
    val clusters = Dedup.clustersAlternating(pairs)
      .select(col("doc_id").as("id"), col("cluster_id"))
    records.select(col(idCol).as("id"))
      .join(clusters, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("cluster_id"), col("id")).as("entity_id"))
  }

  /** The full ER pipeline: block → pair → cluster → canonicalize.
    * Every record gets (id, entity_id) where entity_id is the MINIMUM
    * id of its transitive match cluster (unmatched records are their
    * own entity) — [[Dedup.clusters]]' alternating-CC contract, so the
    * closure costs O(log n) rounds, never a driver walk.
    */
  def resolveEntities(
      records: DataFrame,
      idCol: String,
      nameCol: String,
      blockKey: Column,
      maxDist: Int = 2,
      maxBlock: Long = 100000L): DataFrame = {
    val pairs = blockedPairs(records, idCol, nameCol, blockKey, maxDist,
        maxBlock)
      .select(col("id_a").as("doc_id_a"), col("id_b").as("doc_id_b"))
    val clusters = Dedup.clustersAlternating(pairs)
      .select(col("doc_id").as("id"), col("cluster_id"))
    records.select(col(idCol).as("id"))
      .join(clusters, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("cluster_id"), col("id")).as("entity_id"))
  }
}
