package graft.streaming

import graft.delta.DslParser
import graft.json.{Hashes, JsonCodec, TimeUuid}
import graft.resolve.{ChangeRow, DocRow}
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming materializer (SURVEY §2.9, megabus parity): continuously folds a
 * change stream into the current resolved document per coordinate, emitting
 * a changelog row per mutating micro-batch — deletes emitted as tombstones
 * (deleted=true), redundant-only batches suppressed
 * (MegabusRefResolver.java:157-221 / DefaultResolver.java:73-90 semantics).
 *
 * State per coordinate is the O(1) fold state (content + intrinsics), kept
 * in the state store — the streaming analog of compaction checkpoints: the
 * delta history is never re-read. At 100 TB the state store must be RocksDB
 * (spark.sql.streaming.stateStore.providerClass).
 *
 * Ordering caveat vs the batch fold: changes are sorted by changeId only
 * WITHIN each micro-batch and batches apply in arrival order, so a delta
 * arriving in a later batch with an earlier changeId folds after — the
 * fold is order-sensitive, and such late deltas can resolve differently
 * than ResolveEngine over the full log (which sorts globally). This mirrors
 * the reference's own eventual-consistency window (writes racing a read
 * resolve in arrival order until the log settles); producers needing exact
 * batch parity must deliver in changeId order or buffer with an event-time
 * watermark upstream of this operator.
 */
object Materializer {

  /** Serializable fold state per coordinate. */
  final case class FoldState(
      body: String,         // canonical JSON, null = UNDEFINED (deleted)
      version: Long,
      sigHex: String,
      firstMs: Long,
      lastMs: Long,
      mutateMs: Long,
      lastTags: Seq[String],
      redundant: Long)

  val initialState: FoldState = FoldState(null, 0L, Hashes.toHex(Hashes.SignatureZero),
    0L, 0L, 0L, Seq.empty, 0L)

  // delta texts repeat heavily across coordinates (templated updates):
  // bounded per-thread parse cache, same as the batch fold's
  private val deltaCache = ThreadLocal.withInitial(() =>
    new java.util.LinkedHashMap[String, graft.delta.Delta](1024, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, graft.delta.Delta]): Boolean = size > 4096
    })

  private def parseDeltaCached(text: String): graft.delta.Delta = {
    val cache = deltaCache.get()
    var d = cache.get(text)
    if (d == null) { d = DslParser.parseDelta(text); cache.put(text, d) }
    d
  }

  /** Apply one batch of changes (already sorted) to a fold state. Returns
    * (new state, whether any change in the batch mutated content or tags).
    *
    * Compaction checkpoint rows (reserved delta prefix — a compacted log IS
    * "a standard changes DataFrame") restore the fold state exactly like the
    * batch fold's `Resolver.restoreCompaction`: content, version count,
    * timestamps, tags and the verbatim cutoff signature all resume from the
    * checkpoint, superseding whatever preceded it. */
  def applyBatch(table: String, key: String, state: FoldState,
                 changes: Seq[ChangeRow], placement: String = "default"): (FoldState, Boolean) = {
    var body = JsonCodec.parseOrUndefined(state.body)
    var sig = state.sigHex
    var version = state.version
    var firstMs = state.firstMs
    var lastMs = state.lastMs
    var mutateMs = state.mutateMs
    var lastTags = state.lastTags.toSet
    var redundant = state.redundant
    var anyMutation = false

    def iso(ms: Long): String =
      if (ms == 0L) null else graft.resolve.Iso8601.format(ms)
    changes.foreach { c =>
      val cid = TimeUuid(c.ms, c.seq, c.node)
      if (graft.resolve.ResolveEngine.isCheckpoint(c.delta)) {
        val meta = graft.resolve.ResolveEngine.parseCheckpointNode(table, key, c.node)
        val bodyText = c.delta.substring(1)
        val restored = JsonCodec.parseOrUndefined(if (bodyText == "~") null else bodyText)
        if (restored != body) anyMutation = true
        body = restored
        version = meta.count
        sig = meta.cutoffSignature
        firstMs = meta.firstUpdateMs
        lastMs = c.ms
        mutateMs = meta.lastMutateMs
        lastTags = if (c.tags == null) Set.empty[String] else c.tags.toSet
        redundant = 0L
      } else if (graft.resolve.ResolveEngine.isLegacyCheckpointNode(c.node)) {
        throw new IllegalStateException(
          s"legacy compaction checkpoint for ($table,$key): node=${c.node} " +
          "uses the pre-marker format; re-compact the log with the current " +
          "Compactor before streaming it")
      } else {
        val delta = parseDeltaCached(c.delta)
        val tags = if (c.tags == null) Set.empty[String] else c.tags.toSet
        // mid-fold intrinsics carry the running timestamps AND the fold's
        // placement (parity with Resolver.intrinsicsView) so conditional
        // deltas reading ~firstUpdateAt/~lastUpdateAt/~lastMutateAt or
        // ~placement resolve as in batch; built lazily — ISO formatting only
        // when the delta actually reads it
        val intr = if (delta.needsIntrinsics)
          graft.condition.IntrinsicsView(key, table, sig,
            body eq graft.json.JUndefined, iso(firstMs), iso(lastMs), iso(mutateMs), placement)
        else null
        val updated = graft.delta.DeltaEvaluator.eval(delta, body, intr)
        val contentChanged = updated != body
        if (!contentChanged && lastTags == tags) redundant += 1
        else anyMutation = true
        body = updated
        lastTags = tags
        version += 1
        sig = Hashes.toHex(Hashes.chainSignature(hexToBytes(sig), cid.bytes))
        if (firstMs == 0L) firstMs = c.ms
        lastMs = c.ms
        if (contentChanged || mutateMs == 0L) mutateMs = c.ms
      }
    }
    val rendered = if (body eq graft.json.JUndefined) null else JsonCodec.render(body)
    (FoldState(rendered, version, sig, firstMs, lastMs, mutateMs,
      lastTags.toSeq.sorted(graft.resolve.Resolver.Utf8Order), redundant), anyMutation)
  }

  private def hexToBytes(hex: String): Array[Byte] = {
    val out = new Array[Byte](hex.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = Integer.parseInt(hex.substring(2 * i, 2 * i + 2), 16).toByte
      i += 1
    }
    out
  }

  def stateToDoc(table: String, key: String, s: FoldState, placement: String): DocRow =
    DocRow(table, key, s.version, s.sigHex, s.body == null,
      s.firstMs, s.lastMs, s.mutateMs, placement, s.body, s.lastTags, s.redundant)

  /**
   * The streaming query fragment: changes stream -> changelog of resolved
   * docs. Works with Append output mode; one output row per coordinate per
   * mutating micro-batch (tombstones carry deleted=true, megabus's
   * RefType.DELETED analog).
   */
  def materialize(changes: Dataset[ChangeRow],
                  placement: String = "default"): Dataset[DocRow] = {
    implicit val stateEnc = Encoders.product[FoldState]
    implicit val docEnc = Encoders.product[DocRow]
    implicit val keyEnc = Encoders.tuple(Encoders.STRING, Encoders.STRING)
    changes
      .groupByKey(c => (c.table, c.key))
      .flatMapGroupsWithState[FoldState, DocRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case ((table, key), rows, state: GroupState[FoldState]) =>
          // node tie-break in UTF-8 order — MUST match the batch fold's
          // Tungsten sortWithinPartitions (see Resolver.Utf8Order)
          val sorted = rows.toSeq.sortBy(c => (c.ms, c.seq, c.node))(
            Ordering.Tuple3(Ordering.Long, Ordering.Long, graft.resolve.Resolver.Utf8Order))
          val prev = state.getOption.getOrElse(initialState)
          val (next, mutated) = applyBatch(table, key, prev, sorted, placement)
          state.update(next)
          // suppress redundant-only batches from the changelog
          if (mutated) Iterator.single(stateToDoc(table, key, next, placement))
          else Iterator.empty
      }
  }

  /** Per-coordinate state of the watermark-ordered fold: committed fold
    * state + changes newer than the watermark, still reorderable. */
  final case class OrderedState(fold: FoldState, buffer: Seq[ChangeRow])

  /** ChangeRow + its event-time column: the watermark column must survive
    * to the stateful operator for EventTimeTimeout. */
  final case class TimedChange(table: String, key: String, ms: Long, seq: Long,
      node: String, delta: String, tags: Seq[String],
      eventTime: java.sql.Timestamp) {
    def toChangeRow: ChangeRow = ChangeRow(table, key, ms, seq, node, delta, tags)
  }

  /**
   * Watermark-ordered materializer: exact batch-fold parity for any
   * disorder within `latenessMs`. Changes buffer in state until the event-
   * time watermark passes them, then fold in global changeId order — a late
   * change arriving within the allowed lateness folds at its correct
   * position even when it belongs before changes from earlier micro-
   * batches. This is the buffering alternative to [[materialize]]'s
   * arrival-order semantics (see the ordering caveat above): one extra
   * latency window in exchange for cross-batch order.
   *
   * Changes arriving with event time at or below the current watermark
   * (i.e. later than `latenessMs` behind the stream head) are DROPPED
   * before this operator sees them — `FlatMapGroupsWithStateExec` with
   * `EventTimeTimeout` applies the standard Structured Streaming late-data
   * filter to its input (pinned by StreamingSpec's drop-contract test).
   * Size `latenessMs` to the producer's real disorder bound; a deployment
   * that cannot tolerate drops must use [[materialize]] (arrival-order,
   * no watermark, nothing filtered) and accept its ordering caveat.
   */
  def materializeOrdered(changes: Dataset[ChangeRow], latenessMs: Long,
                         placement: String = "default"): Dataset[DocRow] = {
    val spark = changes.sparkSession
    import spark.implicits._
    implicit val stateEnc = Encoders.product[OrderedState]
    implicit val docEnc = Encoders.product[DocRow]
    implicit val keyEnc = Encoders.tuple(Encoders.STRING, Encoders.STRING)
    changes
      .withColumn("eventTime", org.apache.spark.sql.functions
        .timestamp_millis(org.apache.spark.sql.functions.col("ms")))
      .withWatermark("eventTime", s"$latenessMs milliseconds")
      .as[TimedChange]
      .groupByKey(c => (c.table, c.key))
      .flatMapGroupsWithState[OrderedState, DocRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case ((table, key), rows, state: GroupState[OrderedState]) =>
          val prev = state.getOption.getOrElse(OrderedState(initialState, Seq.empty))
          val wm = state.getCurrentWatermarkMs()
          val all = prev.buffer ++ rows.map(_.toChangeRow)
          // ripe = at or before the watermark (no further reordering
          // possible) plus anything already later than allowed
          val (ripe, hold) = all.partition(_.ms <= wm)
          val sorted = ripe.sortBy(c => (c.ms, c.seq, c.node))(
            Ordering.Tuple3(Ordering.Long, Ordering.Long, graft.resolve.Resolver.Utf8Order))
          val (next, mutated) = applyBatch(table, key, prev.fold, sorted, placement)
          state.update(OrderedState(next, hold))
          if (hold.nonEmpty) {
            // wake when the watermark passes the oldest held change
            state.setTimeoutTimestamp(math.max(hold.map(_.ms).min, wm + 1))
          }
          if (mutated) Iterator.single(stateToDoc(table, key, next, placement))
          else Iterator.empty
      }
  }
}
