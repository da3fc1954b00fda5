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
    val oversize = blocked.groupBy("blk").agg(count(lit(1)).as("n"))
      .filter(col("n") > maxBlock).limit(1).collect()
    require(oversize.isEmpty, {
      val r = oversize.head
      s"blockedPairs: block '${r.get(0)}' holds ${r.getLong(1)} records " +
        s"(> maxBlock=$maxBlock) — the within-block pairing is " +
        "quadratic; refine the blocking key or raise maxBlock " +
        "deliberately"
    })
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
