package graft.streaming

import graft.resolve.ResolveEngine
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Megabus-style ref resolution (SURVEY §2.5, §2.9): a stream of update refs
 * (table, key, changeId) is resolved against the store. A ref whose write
 * is not yet readable (no change row at or after the ref's changeId)
 * classifies as PENDING and routes to the retry side-channel instead of
 * failing the pipeline; deletes surface as tombstones
 * (MegabusRefResolver.java:157-221, MissingRefDelayProcessor).
 *
 * Batch form below; the streaming form applies the same function per
 * micro-batch via foreachBatch with the retry output unioned back into the
 * source after a delay.
 */
object RefResolver {

  /** Classify + resolve one batch of refs against the change log.
    * Returns a DataFrame with a `status` column:
    *  - "resolved": doc payload columns populated from the fold
    *  - "pending":  the store has no change at/after the ref (retry later)
    */
  def resolveRefs(refs: DataFrame, changes: DataFrame,
                  resolvedStore: Option[DataFrame] = None): DataFrame = {
    // latest visible changeId per coordinate (one cheap aggregate, no fold)
    val visible = changes.groupBy(col("table"), col("key"))
      .agg(max(struct(col("ms"), col("seq"), col("node"))).as("max_change"))

    val classified = refs.join(visible, Seq("table", "key"), "left")
      .withColumn("status",
        when(col("max_change").isNull ||
             struct(col("ms"), col("seq"), col("node")) > col("max_change"), "pending")
          .otherwise("resolved"))

    val resolvedKeys = classified.where(col("status") === "resolved")
      .select("table", "key").distinct()

    // deployment path: serve from the continuously-maintained resolved
    // store (the materializer's output) — megabus reads the SoR view, it
    // does not re-fold; fallback folds only the resolved coordinates
    val docs = resolvedStore
      .map(_.select(col("table"), col("id").as("key"), col("version"),
        col("deleted"), col("body")))
      .getOrElse(ResolveEngine.resolve(
          changes.join(resolvedKeys, Seq("table", "key"), "left_semi"))
        .toDF()
        .select(col("table"), col("id").as("key"), col("version"),
          col("deleted"), col("body")))

    // pending refs carry NO payload: the write they announce is not yet
    // readable, so emitting the stale doc would double-publish it — the
    // retry channel re-resolves after the delay (MegabusRefResolver
    // routes missing refs without a document)
    val resolvedOnly = (c: org.apache.spark.sql.Column) =>
      when(col("status") === "resolved", c)
    classified
      .join(docs, Seq("table", "key"), "left")
      .select(col("table"), col("key"), col("ms"), col("seq"), col("node"),
        col("status"), resolvedOnly(col("version")).as("version"),
        resolvedOnly(col("deleted")).as("deleted"),
        resolvedOnly(col("body")).as("body"))
  }

  /** The retry side-channel: pending refs to re-inject after a delay. */
  def retryChannel(classified: DataFrame): DataFrame =
    classified.where(col("status") === "pending")
      .select("table", "key", "ms", "seq", "node")
}
