package graft.operators

import graft.functions.{VectorMeanAgg, VectorOps}
import graft.functions.expressions.TextExpressions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trained document-quality classifier — the fastText/CCNet-style
  * linear filter production pipelines train against a reference corpus
  * and run over the raw crawl (GPT-3, CCNet, RefinedWeb all document
  * the pattern): logistic regression over hashed bag-of-words features,
  * trained distributed with full-batch gradient descent.
  *
  * Scale shape, per training iteration: ONE map-side-combinable
  * aggregate over the (checkpointed-once) feature frame — the gradient
  * is a `dim`-vector mean ([[VectorMeanAgg]]), the model is `dim`+1
  * doubles broadcast back inside the next iteration's literals (the
  * k-bounded driver-collect discipline of kMeansCentroids). The corpus
  * is featurized ONCE ([[graft.functions.expressions.HashedBowF]],
  * per-row O(L), zero shuffle) and never re-read as text. Scoring is a
  * pure per-row projection: one native dot + a sigmoid. At 100 TB the
  * wall-clock ceiling is `iters` sequential linear passes — the same
  * shape every distributed SGD/LBFGS implementation pays per epoch —
  * and `dim` bounds every exchange at a constant.
  */
object QualityClassifier {

  /** Trained model + the loss trajectory endpoints (for convergence
    * certification — a training run that didn't reduce loss should
    * never ship silently).
    */
  final case class Model(weights: Array[Double], bias: Double,
      dim: Int, initLoss: Double, finalLoss: Double)

  private def fx(textCol: String, dim: Int) =
    TextExpressions.hashed_bow(split(col(textCol), " "), dim)

  /** Full-batch GD logistic regression: labelCol must be 0/1. */
  def train(df: DataFrame, labelCol: String, textCol: String = "text",
      dim: Int = 256, iters: Int = 40, lr: Double = 10.0): Model = {
    require(iters >= 1, s"iters must be positive: $iters")
    val base = df
      .select(col(labelCol).cast("double").as("y"),
        fx(textCol, dim).as("fx"))
      .localCheckpoint(false) // featurize once; flat lineage across iters
    val w = new Array[Double](dim)
    var b = 0.0
    var initLoss = Double.NaN
    var lastLoss = Double.NaN
    var it = 0
    while (it < iters) {
      // model as codegen reference objects (not literals): a dim-wide
      // literal array re-keys the generated code every iteration,
      // forcing a Janino recompile per GD step — with the reference
      // form the per-iteration source is byte-identical and the
      // codegen cache hits after step 1 (values identical: same float
      // cast, same left-to-right dot, same σ)
      val p = graft.functions.expressions.VectorExpressions
        .logistic_prob(col("fx"), w.map(_.toFloat), b)
      val resid = p - col("y")
      val logloss = -(col("y") * log(greatest(p, lit(1e-12))) +
        (lit(1.0) - col("y")) * log(greatest(lit(1.0) - p, lit(1e-12))))
      val r = base
        .select(resid.as("r"), logloss.as("l"), col("fx"))
        .agg(
          VectorMeanAgg.asColumn(
            transform(col("fx"), x => x * col("r")).cast("array<float>"))
            .as("grad"),
          avg("r").as("rbar"), avg("l").as("loss"))
        .head()
      val grad = r.getSeq[Double](0)
      if (it == 0) initLoss = r.getDouble(2)
      lastLoss = r.getDouble(2)
      var j = 0
      while (j < dim) { w(j) -= lr * grad(j); j += 1 }
      b -= lr * r.getDouble(1)
      it += 1
    }
    Model(w, b, dim, initLoss, lastLoss)
  }

  /** Pure per-row scoring: quality_prob = σ(w·x + b), quality_pred =
    * prob ≥ 0.5. The model rides as literals — no join, no shuffle.
    */
  def score(df: DataFrame, model: Model,
      textCol: String = "text"): DataFrame = {
    val wCol = array(model.weights.map(v => lit(v.toFloat)): _*)
    val p = lit(1.0) / (lit(1.0) +
      exp(-(VectorOps.dot(fx(textCol, model.dim), wCol) + lit(model.bias))))
    df.withColumn("quality_prob", p)
      .withColumn("quality_pred", (p >= 0.5).cast("int"))
  }
}
