package graft.resolve

import graft.delta.{Delta, DslParser}
import graft.json.TimeUuid
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * One row of the delta log (the engine's stored representation of a
 * document: current doc = fold of its log, FIXTURES.md §A1).
 * changeId = (ms, seq, node), totally ordered.
 */
final case class ChangeRow(
    table: String,
    key: String,
    ms: Long,
    seq: Long,
    node: String,
    delta: String,
    tags: Seq[String])

/** Encoder-friendly flat form used on the fold's hot path: tags carried in
  * canonical sorted--joined form (see Resolver.TagSep). */
final case class ChangeRowFlat(
    table: String,
    key: String,
    ms: Long,
    seq: Long,
    node: String,
    delta: String,
    tagsJoined: String)

/** One timeline entry with the resolved document state AS OF that change
  * (DataStore.getTimeline includeContentData=true). */
final case class VersionRow(
    table: String,
    key: String,
    ms: Long,
    seq: Long,
    node: String,
    change_type: String,
    version: Long,
    signature: String,
    deleted: Boolean,
    body: String)

/** A resolved document row (FIXTURES.md §A2). Timestamps as epoch millis;
  * body as canonical JSON text (null when deleted). */
final case class DocRow(
    table: String,
    id: String,
    version: Long,
    signature: String,
    deleted: Boolean,
    first_update_ms: Long,
    last_update_ms: Long,
    last_mutate_ms: Long,
    placement: String,
    body: String,
    last_tags: Seq[String],
    redundant_changes: Long) {

  import graft.json._

  /** Document as served: body fields + `~` intrinsics in canonical order. */
  def contentJson: String = {
    val base: Map[String, JValue] = JsonCodec.parseOrUndefined(body) match {
      case JObj(fields) => fields
      case _            => Map.empty
    }
    import graft.condition.Intrinsic
    val all = base ++ Seq(
      Intrinsic.Id -> JString(id),
      Intrinsic.Table -> JString(table),
      Intrinsic.Version -> JLong(version),
      Intrinsic.Signature -> JString(signature),
      Intrinsic.Deleted -> JBool(deleted),
      Intrinsic.Placement -> JString(placement)) ++
      (if (first_update_ms != 0) Seq(Intrinsic.FirstUpdateAt -> JString(Iso8601.format(first_update_ms))) else Nil) ++
      (if (last_update_ms != 0) Seq(Intrinsic.LastUpdateAt -> JString(Iso8601.format(last_update_ms))) else Nil) ++
      (if (last_mutate_ms != 0) Seq(Intrinsic.LastMutateAt -> JString(Iso8601.format(last_mutate_ms))) else Nil)
    JsonCodec.render(JObj(all))
  }
}

/**
 * Batch resolve: Dataset[ChangeRow] -> Dataset[DocRow].
 *
 * Scale design: ONE hash shuffle on (table, key) whose sort phase also
 * provides the per-document changeId order (secondary sort), then a
 * streaming per-partition fold with O(1) state per document — no per-group
 * materialization, no driver-side work, skew-free for EmoDB-sized documents
 * (delta logs are per-document and small; a single hot document is bounded
 * by the compaction analog, not by this operator).
 */
object ResolveEngine {

  /** Columns required of a changes DataFrame. */
  val changeColumns: Seq[String] = Seq("table", "key", "ms", "seq", "node", "delta", "tags")

  /** Reserved first char of a compaction-checkpoint delta. A control char is
    * never legal DSL text, so detection cannot collide with producer data. */
  final val CheckpointDeltaPrefix = '\u0001'

  def isCheckpoint(deltaText: String): Boolean =
    deltaText != null && deltaText.nonEmpty &&
      deltaText.charAt(0) == CheckpointDeltaPrefix

  final case class CheckpointMeta(count: Long, firstUpdateMs: Long,
                                  lastMutateMs: Long, cutoffSignature: String)

  /** Legacy (pre-marker) checkpoint detection: the first checkpoint format
    * signaled via the NODE field alone — "compaction:<count>:<firstMs>:
    * <lastMutateMs>" (4 fields, all-numeric tail) with an UNPREFIXED body
    * delta. Current logs signal checkpoints out-of-band via
    * [[CheckpointDeltaPrefix]]; a legacy row reaching the fold would
    * otherwise apply as an ordinary literal delta and silently produce wrong
    * ~version/~signature, so the fold fails loudly instead (re-compact the
    * log with the current Compactor to migrate). A producer node id can only
    * collide with this pattern by matching the exact all-numeric 4-field
    * shape. */
  def isLegacyCheckpointNode(node: String): Boolean = {
    if (node == null || !node.startsWith("compaction:")) false
    else {
      val parts = node.split(":", -1)
      parts.length == 4 && parts.drop(1).forall(p => p.nonEmpty && p.forall(_.isDigit))
    }
  }

  /** Strict parse of a checkpoint row's node field:
    * "compaction:<count>:<firstUpdateMs>:<lastMutateMs>:<md5hex32>".
    * A row already identified as a checkpoint (reserved delta prefix) with a
    * node that fails this parse is corrupt — fail loudly rather than fold
    * bogus state. */
  def parseCheckpointNode(table: String, key: String, node: String): CheckpointMeta = {
    val parts = if (node == null) Array.empty[String] else node.split(":", -1)
    require(parts.length == 5 && parts(0) == "compaction" &&
      parts(4).length == 32 && parts(4).forall(c => (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f')),
      s"corrupt compaction checkpoint for ($table,$key): node=$node")
    try CheckpointMeta(parts(1).toLong, parts(2).toLong, parts(3).toLong, parts(4))
    catch { case _: NumberFormatException =>
      throw new IllegalArgumentException(
        s"corrupt compaction checkpoint for ($table,$key): node=$node")
    }
  }

  /** Snapshot resolve: fold only changes at or before `cutoffMs` — the
    * MultiTableScanOptions/DataTools cutoffTime semantics
    * (sor/.../core/DataTools.java:32-76) that make a placement export
    * CONSISTENT as of one timestamp even while producers keep writing. The
    * filter lands before the fold's shuffle (and reaches the parquet scan
    * as a pushed predicate on a stored log), so post-cutoff deltas are
    * never read, not merely ignored. */
  def resolveAsOf(changes: DataFrame, cutoffMs: Long,
                  placement: String = "default",
                  includeDeleted: Boolean = true): Dataset[DocRow] =
    resolve(changes.where(col("ms") <= cutoffMs), placement, includeDeleted)

  def resolve(changes: DataFrame, placement: String = "default",
              includeDeleted: Boolean = true): Dataset[DocRow] = {
    val spark = changes.sparkSession
    import spark.implicits._
    // flat string/primitive row for the typed boundary: tag-set
    // canonicalization (sort + join) runs in Tungsten, and the encoder never
    // materializes per-row Seq objects — measured ~2x on the fold stage
    val ds = changes
      .select(col("table").cast("string"), col("key").cast("string"),
        col("ms").cast("long"), col("seq").cast("long"),
        col("node").cast("string"), col("delta").cast("string"),
        array_join(array_sort(coalesce(col("tags"), array())),
          Resolver.TagSep.toString).as("tagsJoined"))
      .as[ChangeRowFlat]

    val docs = ds
      .repartition(col("table"), col("key"))
      .sortWithinPartitions("table", "key", "ms", "seq", "node")
      .mapPartitions(foldPartition(placement))

    if (includeDeleted) docs else docs.filter(!_.deleted)
  }

  /**
   * Per-version fold: one output row per change carrying the RESOLVED
   * document state after that change — DataStore.getTimeline's
   * `includeContentData=true` semantics (DataStore.java:122), where each
   * timeline entry exposes the content as of its version. Same single
   * shuffle + secondary sort as [[resolve]]; the fold emits every prefix
   * state instead of only the last. Cost over resolve is one JSON render
   * per change (inherent to the contract).
   */
  def resolveVersions(changes: DataFrame,
                      placement: String = "default"): Dataset[VersionRow] = {
    val spark = changes.sparkSession
    import spark.implicits._
    val ds = changes
      .select(col("table").cast("string"), col("key").cast("string"),
        col("ms").cast("long"), col("seq").cast("long"),
        col("node").cast("string"), col("delta").cast("string"),
        array_join(array_sort(coalesce(col("tags"), array())),
          Resolver.TagSep.toString).as("tagsJoined"))
      .as[ChangeRowFlat]
    ds.repartition(col("table"), col("key"))
      .sortWithinPartitions("table", "key", "ms", "seq", "node")
      .mapPartitions(foldVersions(placement))
  }

  private def foldVersions(placement: String)(
      rows: Iterator[ChangeRowFlat]): Iterator[VersionRow] =
    new Iterator[VersionRow] {
      private val it = rows.buffered
      private var resolver: Resolver = null
      private var curTable: String = null
      private var curKey: String = null
      private val deltaCache = new java.util.LinkedHashMap[String, Delta](1024, 0.75f, true) {
        override def removeEldestEntry(e: java.util.Map.Entry[String, Delta]): Boolean = size > 4096
      }
      private def parseDelta(text: String): Delta = {
        var d = deltaCache.get(text)
        if (d == null) { d = DslParser.parseDelta(text); deltaCache.put(text, d) }
        d
      }

      def hasNext: Boolean = it.hasNext

      def next(): VersionRow = {
        val c = it.next()
        if (resolver == null || c.table != curTable || c.key != curKey) {
          resolver = new Resolver(c.table, c.key, placement)
          curTable = c.table
          curKey = c.key
        }
        val cid = TimeUuid(c.ms, c.seq, c.node)
        val changeType =
          if (isCheckpoint(c.delta)) {
            val meta = parseCheckpointNode(c.table, c.key, c.node)
            val bodyText = c.delta.substring(1)
            val content = graft.json.JsonCodec.parseOrUndefined(
              if (bodyText == "~") null else bodyText)
            resolver.restoreCompaction(content, meta.count, cid,
              meta.firstUpdateMs, meta.lastMutateMs, meta.cutoffSignature,
              Resolver.splitTags(if (c.tagsJoined == null) "" else c.tagsJoined).toSet)
            "compaction"
          } else if (isLegacyCheckpointNode(c.node)) {
            throw new IllegalStateException(
              s"legacy compaction checkpoint for (${c.table},${c.key}): " +
              s"node=${c.node} uses the pre-marker format; re-compact the log " +
              "with the current Compactor before resolving")
          } else {
            resolver.updateJoined(cid, parseDelta(c.delta),
              if (c.tagsJoined == null) "" else c.tagsJoined)
            "delta"
          }
        val r = resolver.result()
        VersionRow(c.table, c.key, c.ms, c.seq, c.node, changeType,
          r.version, r.signature, r.deleted, r.bodyJson)
      }
    }

  /** Streaming fold over a (table,key)-clustered, changeId-sorted iterator. */
  private def foldPartition(placement: String)(rows: Iterator[ChangeRowFlat]): Iterator[DocRow] =
    new Iterator[DocRow] {
      private val it = rows.buffered
      // Delta texts repeat heavily across documents (e.g. templated updates):
      // cache parsed ASTs per partition, bounded.
      private val deltaCache = new java.util.LinkedHashMap[String, Delta](1024, 0.75f, true) {
        override def removeEldestEntry(e: java.util.Map.Entry[String, Delta]): Boolean = size > 4096
      }
      private def parseDelta(text: String): Delta = {
        var d = deltaCache.get(text)
        if (d == null) { d = DslParser.parseDelta(text); deltaCache.put(text, d) }
        d
      }

      def hasNext: Boolean = it.hasNext

      def next(): DocRow = {
        val first = it.head
        val resolver = new Resolver(first.table, first.key, placement)
        while (it.hasNext && it.head.table == first.table && it.head.key == first.key) {
          val c = it.next()
          val cid = TimeUuid(c.ms, c.seq, c.node)
          if (isCheckpoint(c.delta)) {
            // Checkpoint rows are signaled out-of-band by the reserved delta
            // prefix (illegal as DSL text), never by the node id, so a
            // producer whose node happens to start with "compaction:" is an
            // ordinary change. A checkpoint restores state at ANY position:
            // rows ordering before it (late arrivals predating the cutoff)
            // are superseded, matching the reference where compaction
            // replaces every delta at or before the cutoff.
            val meta = parseCheckpointNode(first.table, first.key, c.node)
            val bodyText = c.delta.substring(1)
            val content = graft.json.JsonCodec.parseOrUndefined(
              if (bodyText == "~") null else bodyText)
            resolver.restoreCompaction(content, meta.count, cid,
              meta.firstUpdateMs, meta.lastMutateMs, meta.cutoffSignature,
              Resolver.splitTags(if (c.tagsJoined == null) "" else c.tagsJoined).toSet)
          } else if (isLegacyCheckpointNode(c.node)) {
            throw new IllegalStateException(
              s"legacy compaction checkpoint for (${first.table},${first.key}): " +
              s"node=${c.node} uses the pre-marker format; re-compact the log " +
              "with the current Compactor before resolving")
          } else {
            resolver.updateJoined(cid, parseDelta(c.delta),
              if (c.tagsJoined == null) "" else c.tagsJoined)
          }
        }
        toRow(resolver.result())
      }
    }

  def toRow(r: ResolvedDoc): DocRow = DocRow(
    table = r.table,
    id = r.id,
    version = r.version,
    signature = r.signature,
    deleted = r.deleted,
    first_update_ms = if (r.firstUpdateAt == null) 0L else r.firstUpdateAt.ms,
    last_update_ms = if (r.lastUpdateAt == null) 0L else r.lastUpdateAt.ms,
    last_mutate_ms = if (r.lastMutateAt == null) 0L else r.lastMutateAt.ms,
    placement = r.placement,
    body = r.bodyJson,
    last_tags = r.lastTags.toSeq.sorted(Resolver.Utf8Order), // batch array_sort parity
    redundant_changes = r.redundantChanges)
}
