package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftExprBridge}
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Manual Bloom-filter join pruning — the runtime-filter shape Spark's
  * own `InjectRuntimeFilter` rule applies when statistics allow, exposed
  * as an explicit operator for the cases the rule can't see (pre-shuffle
  * pruning of a fact table against a filtered dim when the join is
  * built dynamically, or when the big side must be pruned BEFORE an
  * expensive upstream transform, not just before the join exchange).
  *
  * Scale shape: the small side aggregates into one Bloom filter (a few
  * MB — the same bits Spark's runtime filter ships via a scalar
  * subquery; here a 1-row driver collect, then a literal in the big
  * side's filter). The big side is pruned by a per-row hash probe
  * BEFORE its shuffle — the exchange carries ~selectivity · |big| rows
  * plus the fpp share instead of everything. No false negatives, so
  * the join output is row-identical to the unpruned join; false
  * positives only ride to the join and drop there.
  */
object BloomJoin {

  private def bloomOf(small: DataFrame, smallKey: String,
      expectedItems: Long, numBits: Long): Array[Byte] = {
    val agg = GraftExprBridge.column(
      new BloomFilterAggregate(
        XxHash64(Seq(GraftExprBridge.expression(col(smallKey))), 42L),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())
    small.agg(agg.as("bf")).head().getAs[Array[Byte]](0)
  }

  /** Probe column: true iff `key` might be in the filter. */
  private def mightContain(bloom: Array[Byte], key: Column): Column =
    GraftExprBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      XxHash64(Seq(GraftExprBridge.expression(key)), 42L)))

  /** Inner equi join with the big side Bloom-pruned before its
    * exchange. Output ≡ `big.join(small, bigKey === smallKey)`.
    */
  def bloomPrunedJoin(big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String,
      expectedItems: Long = 1000000L,
      numBits: Long = 8388608L): DataFrame = {
    val bloom = bloomOf(small, smallKey, expectedItems, numBits)
    big.filter(mightContain(bloom, col(bigKey)))
      .join(small, col(bigKey) === col(smallKey), "inner")
  }

  /** The pruned big side alone (for pipelines that want the filter
    * pushed below further transforms before the eventual join).
    */
  def bloomPrune(big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String,
      expectedItems: Long = 1000000L,
      numBits: Long = 8388608L): DataFrame =
    big.filter(mightContain(bloomOf(small, smallKey, expectedItems,
      numBits), col(bigKey)))
}
