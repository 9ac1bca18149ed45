package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Trained quality classifier over hashed n-gram features — the
 * CCNet/GPT-3-style "does this look like the reference corpus" filter
 * (fastText-shaped linear model, public method): logistic regression on
 * hashed unigram+bigram instance counts, trained by batch gradient
 * descent, applied as a scan-local expression. Complements the heuristic
 * gates ([[TextAnalysis]]) and the generative ratio ([[Dsir]]): this is
 * the DISCRIMINATIVE scorer production pipelines train on
 * wiki-vs-crawl-style labels.
 *
 * Scale shape: training materializes each labeled doc's bucket array once
 * (one tokenization total, persisted), then each GD iteration is ONE
 * aggregation — per-bucket gradient sums, bounded by B+1 rows out (the
 * sentinel bucket B carries the bias gradient) — plus a driver-side
 * update of the B-sized weight vector. Label sets are sampled in
 * practice; B and iters are parameters, so driver memory is B doubles by
 * construction. Scoring ([[margin]]/[[probability]]) shuffles nothing:
 * the weights ride the plan inside the same single-pass expression DSIR
 * uses (a hashed-feature dot product IS a λ-table walk).
 *
 * Training is deterministic up to float-summation order in the gradient
 * aggregation (last-bit wobble across partitionings); tests assert
 * margins and accuracy, not exact weights.
 */
object QualityClassifier {

  /** weights(b) = coefficient of hash bucket b; bias separate. */
  final case class Model(weights: Array[Double], bias: Double) {
    def buckets: Int = weights.length
  }

  /** Raw decision margin w·x + b (x = hashed gram-instance counts) —
    * scan-local, single tokenization pass. */
  def margin(textCol: Column, model: Model): Column =
    Dsir.dsirWeight(textCol, model.weights) + lit(model.bias)

  /** P(quality | doc) = sigmoid(margin). */
  def probability(textCol: Column, model: Model): Column = {
    val m = margin(textCol, model)
    lit(1.0) / (lit(1.0) + exp(-m))
  }

  /**
   * Batch-GD logistic regression: `positives` = reference-quality docs
   * (e.g. a wiki-like sample), `negatives` = raw-crawl sample. Each
   * iteration: residual r = sigmoid(w·x+b) − y per doc, per-bucket
   * gradient = Σ_docs r · x_b via one explode-aggregate (x_b is the
   * instance count, so exploding instances and summing r per bucket IS
   * r·x_b), weight update on the driver.
   */
  def train(positives: DataFrame, negatives: DataFrame, textCol: String,
            buckets: Int = 1 << 16, iters: Int = 30, lr: Double = 0.5,
            l2: Double = 1e-6): Model = {
    val labeled = positives.select(col(textCol).as("__t"), lit(1.0).as("__y"))
      .unionByName(negatives.select(col(textCol).as("__t"), lit(0.0).as("__y")))
      // bucket arrays materialize once; every GD pass reads them, never
      // re-tokenizes. Sentinel bucket B appended per doc = the bias
      // feature (constant 1), so one aggregation yields ALL gradients.
      .select(col("__y"),
        concat(Dsir.gramBuckets(col("__t"), buckets), array(lit(buckets))).as("__bs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = labeled.count().toDouble
      require(n > 0, "empty training set")
      val w = new Array[Double](buckets + 1) // [0,B) weights, B = bias
      for (_ <- 1 to iters) {
        val rCol = (lit(1.0) / (lit(1.0) +
          exp(-bucketDot(col("__bs"), w)))) - col("__y")
        // one job per iteration; collect() materializes before w mutates
        val grads = labeled.withColumn("__r", rCol)
          .select(col("__r"), explode(col("__bs")).as("__b"))
          .groupBy("__b").agg(sum("__r").as("__g"))
          .where(col("__g") =!= 0.0)
          .collect()
        grads.foreach { row => w(row.getInt(0)) -= lr * (row.getDouble(1) / n) }
        if (l2 > 0) {
          var i = 0
          while (i < buckets) { w(i) -= lr * l2 * w(i); i += 1 } // bias exempt
        }
      }
      Model(w.take(buckets), w(buckets))
    } finally { labeled.unpersist(); () }
  }

  /** Dot product of a bucket-id array against a plan-embedded weight
    * table (bucket ids out of range contribute 0 — never happens for
    * arrays built with the same B). */
  def bucketDot(bucketsCol: Column, weights: Array[Double]): Column =
    GraftBridge.column(BucketDotExpr(GraftBridge.expression(bucketsCol), weights))
}

/** Σ weights(b) over an array<int> of bucket ids — the sparse dot product
  * for pre-hashed feature arrays. */
case class BucketDotExpr(child: Expression, weights: Array[Double])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    var sum = 0.0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val b = arr.getInt(i)
      if (b >= 0 && b < weights.length) sum += weights(b)
      i += 1
    }
    sum
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
