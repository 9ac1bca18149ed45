package graft.engine

import graft.resolve.{DocRow, ResolveEngine}
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * REST-shaped query facade over a delta log (SURVEY §2.1): the engine's
 * equivalents of get / multiGet / scan / getSplits / timeline / listTables.
 *
 * The underlying store is a changes DataFrame (ResolveEngine.changeColumns
 * schema); resolved documents are computed by the fold and cached per
 * session. At scale the resolved view is a materialized table maintained by
 * the streaming materializer; here it is re-derived lazily.
 */
final class EmoSession(val spark: SparkSession, val changes: DataFrame,
                       placement: String = "default",
                       resolvedView: Option[DataFrame] = None) {

  /** Resolved current documents (including tombstones). Pass a persisted
    * `resolvedView` (the continuously-maintained store) to serve reads from
    * it instead of re-folding the log per session. */
  lazy val docs: Dataset[DocRow] = {
    import spark.implicits._
    resolvedView.map(_.as[DocRow])
      .getOrElse(ResolveEngine.resolve(changes, placement))
  }

  private def docsDf: DataFrame = resolvedView.getOrElse(docs.toDF())

  /** Point get: resolve one document. Uses a key-pushdown filter BEFORE the
    * fold shuffle — only that coordinate's deltas are read.
    *
    * Consistency mirrors the reference read contract
    * (`DataStore.get(table, key, consistency)`): STRONG folds the live
    * delta log, so every acknowledged write is visible; WEAK serves
    * straight from the maintained resolved view — no fold at all, the
    * fast path — and may lag writes not yet materialized (with no view
    * maintained, WEAK degrades to STRONG rather than failing). */
  def get(table: String, key: String, includeDeleted: Boolean = false,
          consistency: EmoSession.ReadConsistency = EmoSession.Strong): Option[DocRow] = {
    val one = (consistency, resolvedView) match {
      case (EmoSession.Weak, Some(view)) =>
        import spark.implicits._
        view.where(col("table") === table && col("id") === key).as[DocRow].collect()
      case _ =>
        ResolveEngine.resolve(
          changes.where(col("table") === table && col("key") === key), placement)
          .collect()
    }
    one.headOption.filter(d => includeDeleted || !d.deleted)
  }

  /** Batch point reads: semi-join of the key list against the log (small
    * lists broadcast automatically). WEAK semi-joins the resolved view
    * instead — no fold shuffle in the plan at all. */
  def multiGet(coords: Seq[(String, String)], includeDeleted: Boolean = false,
               consistency: EmoSession.ReadConsistency = EmoSession.Strong): DataFrame = {
    import spark.implicits._
    val keys = coords.toDF("table", "key")
    val resolved = (consistency, resolvedView) match {
      case (EmoSession.Weak, Some(view)) =>
        view.join(broadcast(keys),
            view("table") === keys("table") && view("id") === keys("key"),
            "left_semi")
          .as[DocRow]
      case _ =>
        val filtered = changes.join(broadcast(keys), Seq("table", "key"), "left_semi")
        ResolveEngine.resolve(filtered, placement)
    }
    (if (includeDeleted) resolved else resolved.filter(!_.deleted)).toDF()
      .withColumnRenamed("id", "key")
  }

  /** The reference read contract: reads never miss. An unknown coordinate
    * resolves to the synthetic non-existent record — ~deleted=true,
    * ~version=0, ~signature all zeros (the client-visible sentinel for
    * "never written", distinct from a real delete whose version/signature
    * reflect its history). */
  def getOrDefault(table: String, key: String): DocRow =
    get(table, key, includeDeleted = true).getOrElse(
      DocRow(table, key, 0L, EmoSession.NonExistentSignature, deleted = true,
        0L, 0L, 0L, placement, null, Seq.empty, 0L))

  /** multiGet returning one row per REQUESTED coordinate, synthesizing the
    * non-existent record for coordinates with no history. */
  def multiGetAll(coords: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    val keys = coords.toDF("table", "key")
    keys.join(multiGet(coords, includeDeleted = true), Seq("table", "key"), "left")
      .select(col("table"), col("key"),
        coalesce(col("version"), lit(0L)).as("version"),
        coalesce(col("signature"), lit(EmoSession.NonExistentSignature)).as("signature"),
        coalesce(col("deleted"), lit(true)).as("deleted"),
        coalesce(col("first_update_ms"), lit(0L)).as("first_update_ms"),
        coalesce(col("last_update_ms"), lit(0L)).as("last_update_ms"),
        coalesce(col("last_mutate_ms"), lit(0L)).as("last_mutate_ms"),
        coalesce(col("placement"), lit(placement)).as("placement"),
        col("body"),
        coalesce(col("last_tags"), array()).as("last_tags"),
        coalesce(col("redundant_changes"), lit(0L)).as("redundant_changes"))
  }

  /** Scan-order key: (shard, table, key) like the reference's shard-prefixed
    * row keys — deterministic but not key-alphabetical (SURVEY §1.3). */
  def rowKey(table: Column, key: Column): Column = expressions.emoRowKey(table, key)

  /** Ordered scan with resumable pagination from an exclusive start row key. */
  def scan(table: String, fromRowKeyExclusive: Option[String] = None,
           limit: Int = 10, includeDeleted: Boolean = false): DataFrame = {
    var df = docsDf.where(col("table") === table)
    if (!includeDeleted) df = df.where(!col("deleted"))
    val rk = rowKey(col("table"), col("id"))
    fromRowKeyExclusive.foreach(from => df = df.where(rk > lit(from)))
    df.withColumn("row_key", rk).orderBy("row_key").limit(limit)
  }

  /** Filtered scan: condition DSL split by [[EmoDocs.predicate]] — intrinsic
    * and partition conjuncts compile to native Catalyst predicates (parquet
    * pushdown + partition pruning on a materialized store), only the
    * body-touching remainder evaluates via the exact-parity expression. */
  def scanWhere(table: String, conditionText: String, limit: Int = Int.MaxValue): DataFrame = {
    val base = docsDf
    val df = base.where(col("table") === table && !col("deleted"))
      .where(EmoDocs.predicate(base, conditionText))
    df.withColumn("row_key", rowKey(col("table"), col("id"))).orderBy("row_key").limit(limit)
  }

  /** Split planning: Spark partitions ARE the splits. Returns (split id,
    * approximate records) by hashing keys into `numSplits` ranges, mirroring
    * token-range splits grouped to ~recordsPerSplit. */
  def getSplits(table: String, recordsPerSplit: Int = 10000): DataFrame = {
    val total = docsDf.where(col("table") === table).count()
    val numSplits = math.max(1, (total / math.max(1, recordsPerSplit)).toInt)
    docsDf.where(col("table") === table)
      .withColumn("split", pmod(expressions.emoHash32(col("id")), lit(numSplits)))
      .groupBy("split").agg(count(lit(1)).as("records"))
      .orderBy("split")
  }

  /** One split's rows (a partition-parallel consumer reads one split each). */
  def getSplit(table: String, split: Int, numSplits: Int): DataFrame =
    docsDf.where(col("table") === table &&
      pmod(expressions.emoHash32(col("id")), lit(numSplits)) === split)

  /** Per-document change history, TimeUUID-bounded, forward or reverse.
    * Over a compacted log, checkpoint rows surface as change_type
    * "compaction" with the reserved marker stripped from the delta (the
    * reference timeline likewise interleaves deltas, compactions and
    * audits — DataStore.java:122-124). */
  def timeline(table: String, key: String,
               startMs: Option[Long] = None, endMs: Option[Long] = None,
               reversed: Boolean = false, limit: Int = Int.MaxValue): DataFrame = {
    var df = changes.where(col("table") === table && col("key") === key)
    startMs.foreach(s => df = df.where(col("ms") >= s))
    endMs.foreach(e => df = df.where(col("ms") <= e))
    val order = if (reversed) Seq(col("ms").desc, col("seq").desc, col("node").desc)
                else Seq(col("ms").asc, col("seq").asc, col("node").asc)
    val marker = graft.resolve.ResolveEngine.CheckpointDeltaPrefix.toString
    val isCp = col("delta").startsWith(marker)
    df.withColumn("change_type", when(isCp, "compaction").otherwise("delta"))
      .withColumn("delta", when(isCp, expr("substring(delta, 2)")).otherwise(col("delta")))
      .orderBy(order: _*).limit(limit)
  }

  /** Timeline with the resolved document state at each version —
    * DataStore.getTimeline's `includeContentData=true` (DataStore.java:122).
    * The coordinate filter lands BEFORE the fold's shuffle, so only this
    * document's log is read and folded. */
  def timelineResolved(table: String, key: String,
                       startMs: Option[Long] = None, endMs: Option[Long] = None,
                       reversed: Boolean = false,
                       limit: Int = Int.MaxValue): DataFrame = {
    // NOTE: start/end bound which VERSIONS are returned, not which deltas
    // fold — a window never changes the resolved state at a version, so
    // the fold always starts from the log's beginning (reference parity)
    val folded = graft.resolve.ResolveEngine.resolveVersions(
      changes.where(col("table") === table && col("key") === key)).toDF()
    var df = folded
    startMs.foreach(s => df = df.where(col("ms") >= s))
    endMs.foreach(e => df = df.where(col("ms") <= e))
    val order = if (reversed) Seq(col("ms").desc, col("seq").desc, col("node").desc)
                else Seq(col("ms").asc, col("seq").asc, col("node").asc)
    df.orderBy(order: _*).limit(limit)
  }

  /** Paged table catalog listing. */
  def listTables(fromExclusive: Option[String] = None, limit: Int = Int.MaxValue): DataFrame = {
    var df = changes.select(col("table")).distinct()
    fromExclusive.foreach(f => df = df.where(col("table") > f))
    df.orderBy("table").limit(limit)
  }

  /** Approximate record count including tombstones (bounded when limit set). */
  def tableApproximateSize(table: String, limit: Option[Int] = None): Long = {
    val df = docsDf.where(col("table") === table)
    limit.map(n => df.limit(n).count()).getOrElse(df.count())
  }

  /** The reference's canonical write path in one call
    * (DefaultDataStore.updateAll, DefaultDataStore.java:678-770): tag/name
    * legality checks → [[graft.delta.Deltas.sanitize]] (strip intrinsics,
    * reject non-object top-level literals) → TimeUUID changeId assignment →
    * ChangeRow append → databus UpdateRef emission. Functional over the
    * immutable log: returns the post-write session plus the UpdateRef rows.
    *
    * The refs carry (table, key, ms, seq, node, tags) — the fanout event
    * schema — and the reference writes them to the databus BEFORE the store
    * so listeners never lose updates (beforeWrite algorithm note,
    * DefaultDataStore.java:744-760); feed them to [[graft.streaming.Databus.fanout]]
    * or a Kafka sink accordingly.
    *
    * `atMs`/`node` seed auto-assigned changeIds (consecutive seq per call —
    * the fabricated-UUID protocol of TimeUUIDs.uuidForTimeMillis); an
    * explicit `Update.changeId` wins. Writes at or before
    * `fullConsistencyMs` are rejected like the reference's far-past guard
    * (conflict resolution cannot be trusted below the compaction horizon,
    * DefaultDataStore.java:732-737). */
  def updateAll(updates: Seq[EmoSession.Update], atMs: Long,
                tags: Set[String] = Set.empty, node: String = "local",
                fullConsistencyMs: Long = Long.MinValue): EmoSession.UpdateResult = {
    import graft.delta.{DeltaPrinter, Deltas}
    import graft.resolve.ChangeRow
    // tag budget guard (DefaultDataStore.checkLegalTags:995-1003)
    require(tags.size <= 3, "Maximum of 3 tags are allowed")
    tags.foreach(t => require(t.length < 9,
      s"Tag $t is of more than the allowed length of 8 characters."))
    val tagSeq = tags.toSeq.sorted(graft.resolve.Resolver.Utf8Order) // fold-order parity
    var autoSeq = -1L
    val rows = updates.map { u =>
      require(Names.isLegalTableName(u.table), s"illegal table name: ${u.table}")
      val sanitized = Deltas.sanitize(u.delta)
      val cid = u.changeId.getOrElse { autoSeq += 1; graft.json.TimeUuid(atMs, autoSeq, node) }
      require(cid.ms > fullConsistencyMs,
        s"The 'changeId' UUID is from too far in the past: ${cid.ms}")
      (ChangeRow(u.table, u.key, cid.ms, cid.seq, cid.node,
        DeltaPrinter.print(sanitized), tagSeq), u.audit)
    }
    import spark.implicits._
    // audit rides as an extra column only when the base log carries one
    // (Change.java:25-46 pairs an optional Audit with each delta)
    val newRows = rows.map { case (c, a) =>
      (c.table, c.key, c.ms, c.seq, c.node, c.delta, c.tags, a.orNull)
    }.toDF("table", "key", "ms", "seq", "node", "delta", "tags", "audit")
    val appended = changes.unionByName(
      newRows.select(changes.columns.map(col).toIndexedSeq: _*))
    val refs = newRows.select("table", "key", "ms", "seq", "node", "tags")
    EmoSession.UpdateResult(
      new EmoSession(spark, appended, placement, resolvedView = None), refs)
  }

  /** Single-document write (DataStore.update → updateAll singleton). */
  def update(table: String, key: String, delta: graft.delta.Delta, atMs: Long,
             tags: Set[String] = Set.empty, node: String = "local",
             audit: Option[String] = None): EmoSession.UpdateResult =
    updateAll(Seq(EmoSession.Update(table, key, delta, audit = audit)), atMs,
      tags, node)

  /** Document delete: a tombstone delta through the same write path. */
  def delete(table: String, key: String, atMs: Long,
             tags: Set[String] = Set.empty, node: String = "local",
             audit: Option[String] = None): EmoSession.UpdateResult =
    update(table, key, graft.delta.Deltas.delete, atMs, tags, node, audit)

  /** Purge/drop control events (SURVEY §2.9 table control): one delete delta
    * per live key of the table at `atMs`, tombstoning every document
    * downstream (the RefType.DELETED batch analog). Union the result onto
    * the change log / control stream. */
  def purgeEvents(table: String, atMs: Long): DataFrame = {
    import org.apache.spark.sql.functions.{lit => l}
    changes.where(col("table") === table)
      .select(col("table"), col("key")).distinct()
      .select(col("table"), col("key"), l(atMs).as("ms"), l(0L).as("seq"),
        l("purge").as("node"), l("~").as("delta"),
        array(l("purge")).as("tags"))
  }
}

object EmoSession {
  /** ~signature of a coordinate that was never written
    * (the all-zeros sentinel the reference clients assert against). */
  val NonExistentSignature: String = "0" * 32

  /** Read-consistency contract (sor-api ReadConsistency, collapsed to the
    * two externally meaningful levels): STRONG sees every acknowledged
    * write (folds the live log); WEAK serves from the maintained resolved
    * view and may lag the log tail. */
  sealed trait ReadConsistency
  case object Strong extends ReadConsistency
  case object Weak extends ReadConsistency

  /** One write intent (Update.java): coordinate + delta, with an optional
    * explicit changeId (else assigned from the session's atMs/node) and an
    * optional audit JSON string. */
  final case class Update(table: String, key: String, delta: graft.delta.Delta,
                          changeId: Option[graft.json.TimeUuid] = None,
                          audit: Option[String] = None)

  /** Write result: the post-write session (immutable-log append) and the
    * databus UpdateRef rows in the fanout event schema. */
  final case class UpdateResult(session: EmoSession, refs: DataFrame)
}
