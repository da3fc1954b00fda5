package graft.plans

import graft.functions.expressions.CosineF
import graft.operators.SimilaritySearch
import org.apache.spark.sql.{GraftExprBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** ANN index behind a plain query API (SURVEY.md §4 O3): an optimizer
  * rule that recognizes the exact cosine top-k plan shape —
  *
  *   Filter(rank <= k,
  *     Window(row_number() OVER (PARTITION BY qid
  *                               ORDER BY score DESC, vid ASC) AS rank,
  *       Project(..., CosineF(emb, qvec) AS score,
  *         Join(index, queries, Cross, None))))
  *
  * — and substitutes the bucketed multi-probe LSH candidate join with
  * exact re-rank (`SimilaritySearch.lshTopK`). The user writes the naive
  * crossJoin query; the session plans it through the index, exactly like
  * the reference's retriever hides its vector index behind a similarity
  * query (reference: `/root/reference/AI.py:48-55`, queried at `AI.py:138`).
  *
  * The rewrite changes the physical search strategy, not the query
  * semantics the session signed up for: it is OFF by default and enabled
  * per-session with an explicit operating point (`LshAnnPlan.enable`),
  * the same contract as creating an ANN index in a vector store. With
  * the shipped recall-1.0 point (64 tables × 12 bits × 48 probes,
  * measured 1.000 on BOTH sf0.001 and sf0.01 by `graft.tools.AnnTune`)
  * the rewritten plan is output-identical to the exact plan — q59
  * hash-matches q35's oracle. The ~55% candidate fraction is the price
  * of exactness at a 500-vector fixture; bucket occupancy scales as
  * n/2^bits per table, so the fraction collapses as the index grows.
  *
  * Scale: the CrossJoin the rule removes is O(index × queries) work per
  * batch; the substituted plan is an equi-join on (table, bucket) whose
  * exchanges carry id-only rows (vectors re-attached after candidate
  * dedup), the shape that survives a 100 TB index.
  */
object LshAnnPlan {

  /** LSH operating point for the rewrite. Defaults are the measured
    * recall-1.0 point at fixture scale (AnnTune on sf0.001/sf0.01).
    *
    * `persistedSource`: when set to a source directory with a persisted
    * LSH index ([[graft.sources.AnnIndex.ensureLsh]]) at the SAME
    * (tables, bits) point, matching queries whose index side is a clean
    * (unfiltered) scan of that source are re-planned onto the STORED
    * bucket table — no index-side signature recomputation at all, the
    * full index-once/query-many lifecycle behind a naive query. Falls
    * back to the in-memory LSH path whenever the guard fails (filtered
    * index side, missing/mismatched/unopenable index) — never to a
    * wrong plan.
    *
    * Immutable-source assumption: the routed path opens the index via
    * [[graft.sources.AnnIndex.openLsh]], which does NO freshness probe
    * (that is what makes the rewrite free per query). If the files
    * under `persistedSource` change after `ensureLsh`, re-run
    * `ensureLsh` (its content fingerprint detects the change and
    * rebuilds) before relying on the rewrite; until then the optimizer
    * would serve the stored — now stale — index.
    */
  case class Config(tables: Int = 64, bits: Int = 12, probes: Int = 48,
      persistedSource: Option[String] = None)

  /** Turns the rewrite on for the session (idempotent — one rule
    * instance per session; re-enabling swaps the operating point).
    */
  def enable(spark: SparkSession, cfg: Config = Config()): Unit = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations
        .filterNot(_.isInstanceOf[LshAnnRewrite]) :+ LshAnnRewrite(spark, cfg)
  }

  def disable(spark: SparkSession): Unit = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations
        .filterNot(_.isInstanceOf[LshAnnRewrite])
  }
}

case class LshAnnRewrite(spark: SparkSession, cfg: LshAnnPlan.Config)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case f @ Filter(cond,
        Window(
          Seq(rankAlias @ Alias(WindowExpression(_: RowNumber, _), _)),
          Seq(qid: AttributeReference),
          Seq(SortOrder(scoreAttr: AttributeReference, Descending, _, _),
              SortOrder(vid: AttributeReference, Ascending, _, _)),
          ScoredCrossJoin(projList, l, r, hint), _)) =>
      rewrite(f, cond, rankAlias, qid, scoreAttr, vid, projList, l, r, hint)
        .getOrElse(f)
  }

  /** The window's child: a projection computing the score over a cross
    * join — looking through the `WindowGroupLimit` node the optimizer's
    * main batches insert below rank windows (it belongs to the plan we
    * are replacing, so it is safe to discard).
    */
  private object ScoredCrossJoin {
    def unapply(plan: LogicalPlan): Option[
        (Seq[NamedExpression], LogicalPlan, LogicalPlan, JoinHint)] = plan match {
      case WindowGroupLimit(_, _, _, _, child) => unapply(child)
      case Project(projList, Join(l, r, Cross | Inner, None, hint)) =>
        Some((projList, l, r, hint))
      case _ => None
    }
  }

  private def rewrite(
      f: Filter,
      cond: Expression,
      rankAlias: Alias,
      qid: AttributeReference,
      scoreAttr: AttributeReference,
      vid: AttributeReference,
      projList: Seq[NamedExpression],
      l: LogicalPlan,
      r: LogicalPlan,
      hint: JoinHint): Option[LogicalPlan] = {
    val rank = rankAlias.toAttribute
    for {
      k <- extractK(cond, rank)
      // the window's score must be the cosine computed right below it
      cos <- projList.collectFirst {
        case a @ Alias(c: CosineF, _) if a.exprId == scoreAttr.exprId => c
      }
      emb <- Some(cos.left).collect { case a: AttributeReference => a }
      qvec <- Some(cos.right).collect { case a: AttributeReference => a }
      // orient the join: the query side owns the partition key
      (idxChild, qryChild) <-
        if (r.outputSet.contains(qid)) Some((l, r))
        else if (l.outputSet.contains(qid)) Some((r, l))
        else None
      // cosine args must straddle the join; vid lives on the index side
      (embA, qvecA) <-
        if (idxChild.outputSet.contains(emb) &&
          qryChild.outputSet.contains(qvec)) Some((emb, qvec))
        else if (idxChild.outputSet.contains(qvec) &&
          qryChild.outputSet.contains(emb)) Some((qvec, emb))
        else None
      if idxChild.outputSet.contains(vid)
      // an ANN index is never the broadcast side: a broadcast hint on the
      // side owning the ids marks a SMALL vector set (e.g. the IVF
      // centroid-probe window, whose exact top-nProbe selection must not
      // be approximated) — leave those plans alone
      if !(if (idxChild eq l) hint.leftHint else hint.rightHint)
        .exists(_.strategy.isDefined)
      // everything the parent reads must be expressible by the ANN plan
      if f.output.forall(a => Seq(qid, vid, scoreAttr, rank)
        .exists(_.exprId == a.exprId))
    } yield {
      val idxDf = GraftExprBridge.ofRows(spark, idxChild).select(
        GraftExprBridge.column(vid).as("vec_id"),
        GraftExprBridge.column(embA).as("embedding"))
      val qryDf = GraftExprBridge.ofRows(spark, qryChild).select(
        GraftExprBridge.column(qid).as("query_id"),
        GraftExprBridge.column(qvecA).as("query_vec"))
      val ann = persistedHandle(idxChild) match {
        case Some(h) =>
          graft.sources.AnnIndex.queryLsh(qryDf, h, k, cfg.probes)
        case None => SimilaritySearch.lshTopK(
          qryDf, idxDf, k, cfg.tables, cfg.bits, cfg.probes)
      }
      // splice pre-optimized (the main batches won't re-visit it), with a
      // projection restoring the original output attribute ids
      val sub = GraftExprBridge.optimizedPlan(ann)
      val byName = sub.output.map(a => a.name -> a).toMap
      val rename = Map(
        qid.exprId -> byName("query_id"), vid.exprId -> byName("vec_id"),
        scoreAttr.exprId -> byName("score"), rank.exprId -> byName("rank"))
      Project(
        f.output.map(a => Alias(rename(a.exprId), a.name)(exprId = a.exprId)),
        sub)
    }
  }

  /** The persisted index to route through, iff the config names one AND
    * the index side of the matched join is a clean scan of exactly that
    * source AND the stored index carries the config's (tables, bits)
    * point. Each guard is a semantics guard, not an optimization
    * heuristic: a FILTERED index side must not be served from the full
    * persisted index (rows the filter excludes would come back), a
    * different source is a different vector set, and a different
    * operating point voids the measured recall. Any failure ⇒ None ⇒
    * the in-memory LSH path, which is always applicable.
    */
  private def persistedHandle(
      idxChild: LogicalPlan): Option[graft.sources.AnnIndex.LshHandle] =
    for {
      src <- cfg.persistedSource
      // ANY open failure (no meta, deleted layout under a live meta,
      // catalog DDL conflict, MSCK failure) means "no usable index",
      // not "fail the user's query" — the in-memory path is always
      // applicable, so a NonFatal here must route there.
      h <- try Some(graft.sources.AnnIndex.openLsh(spark, src))
        catch { case scala.util.control.NonFatal(_) => None }
      if h.tables == cfg.tables && h.bits == cfg.bits
      if cleanScanOf(idxChild, src, h.indexedPaths)
    } yield h

  /** True when `plan` is only column pruning over ONE file relation
    * that reads EXACTLY the indexed vector set — no Filter, no joins,
    * no other sources. Identity is the stored index meta's recorded
    * relation paths (set equality after normalization); for indexes
    * built from in-memory frames (no recorded paths) the fallback is a
    * path-component-bounded prefix of `src` — `src` itself or below
    * `src/`, so a sibling dir (`…/sf0.10` vs `…/sf0.1`) can't pass.
    * A bare `startsWith` would also admit a DIFFERENT table under the
    * same source dir; the recorded-path comparison is what rules that
    * out.
    */
  private def cleanScanOf(plan: LogicalPlan, src: String,
      indexedPaths: Seq[String]): Boolean = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    import graft.sources.AnnIndex.normalizePath
    var clean = true
    var relations = 0
    plan.foreach {
      case _: Project | _: SubqueryAlias => ()
      case lr: LogicalRelation =>
        relations += 1
        lr.relation match {
          case fs: HadoopFsRelation =>
            val scanPaths =
              fs.location.rootPaths.map(p => normalizePath(p.toString))
            val ok =
              if (indexedPaths.nonEmpty)
                scanPaths.toSet == indexedPaths.toSet
              else {
                val srcN = normalizePath(src)
                scanPaths.forall(p =>
                  p == srcN || p.startsWith(srcN + "/"))
              }
            if (!ok) clean = false
          case _ => clean = false
        }
      case _ => clean = false
    }
    clean && relations == 1
  }

  /** cond must be `rank <= k` (or `rank < k+1` / `rank = 1`), modulo
    * inferred `IsNotNull(rank)` conjuncts.
    */
  private def extractK(cond: Expression, rank: Attribute): Option[Int] = {
    val conjuncts = splitAnd(cond)
    val ks = conjuncts.collect {
      case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType))
        if a.exprId == rank.exprId => k
      case LessThan(a: Attribute, Literal(k: Int, IntegerType))
        if a.exprId == rank.exprId => k - 1
      case EqualTo(a: Attribute, Literal(1, IntegerType))
        if a.exprId == rank.exprId => 1
    }
    val rest = conjuncts.filter {
      case IsNotNull(a: Attribute) if a.exprId == rank.exprId => false
      case LessThanOrEqual(a: Attribute, Literal(_: Int, IntegerType))
        if a.exprId == rank.exprId => false
      case LessThan(a: Attribute, Literal(_: Int, IntegerType))
        if a.exprId == rank.exprId => false
      case EqualTo(a: Attribute, Literal(1, IntegerType))
        if a.exprId == rank.exprId => false
      case _ => true
    }
    if (ks.size == 1 && rest.isEmpty && ks.head >= 1) Some(ks.head) else None
  }

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitAnd(a) ++ splitAnd(b)
    case other => Seq(other)
  }
}
