package graft.resolve

import graft.condition.IntrinsicsView
import graft.delta.{Delta, DeltaEvaluator}
import graft.json._

/**
 * The resolve fold — the engine's core aggregate.
 *
 * Folds a TimeUUID-ordered sequence of deltas over UNDEFINED into the
 * current document, tracking the intrinsics: version (count of changes),
 * chained-MD5 signature, first/last update, last content mutation, deleted.
 * Also flags redundant changes (application didn't change content AND tags
 * equal the last applied tags) so downstream CDC can suppress no-op events.
 *
 * Semantics parity: sor/.../core/DefaultResolver.java:67-132.
 */
final class Resolver(val table: String, val id: String, val placement: String) {

  private var content: JValue = JUndefined
  private var version: Long = 0L
  private var signature: Array[Byte] = Hashes.SignatureZero
  private var firstUpdate: TimeUuid = _
  private var lastUpdate: TimeUuid = _
  private var lastMutate: TimeUuid = _
  // canonical (sorted, \u0001-joined) tag set — string equality == set equality
  private var lastTagsJoined: String = ""
  private var redundant: Long = 0L
  private var lastWasRedundant: Boolean = false

  def isDeleted: Boolean = content eq JUndefined

  private def iso(t: TimeUuid): String =
    if (t == null) null else Iso8601.format(t.ms)

  /** Intrinsics as visible to conditional deltas evaluated mid-fold. */
  def intrinsicsView: IntrinsicsView =
    IntrinsicsView(id, table, Hashes.toHex(signature), isDeleted,
      iso(firstUpdate), iso(lastUpdate), iso(lastMutate), placement)

  /** Restore state from a compaction checkpoint (the analog of
    * DefaultResolver's Compaction constructor, DefaultResolver.java:45-64):
    * content, version count, timestamps, tags and the chained signature all
    * resume from the checkpoint. The cutoff signature is restored VERBATIM
    * (Compaction.getCutoffSignature, DefaultResolver.java:52/60/96) so the
    * ~signature of a logical document is stable across compaction — it is
    * the optimistic-concurrency token. Any state folded before this call is
    * discarded: changes ordering before a checkpoint are superseded by it. */
  def restoreCompaction(checkpointContent: JValue, count: Long, markerId: TimeUuid,
                        firstUpdateMs: Long, lastMutateMs: Long,
                        cutoffSignatureHex: String, tags: Set[String]): Unit = {
    content = checkpointContent
    version = count
    signature = Hashes.fromHex(cutoffSignatureHex)
    firstUpdate = TimeUuid(firstUpdateMs, 0, "")
    lastUpdate = markerId
    lastMutate = TimeUuid(lastMutateMs, 0, "")
    lastTagsJoined = Resolver.joinTags(tags)
    redundant = 0L
    lastWasRedundant = false
  }

  /** Apply one change; returns true when the change was redundant. */
  def update(changeId: TimeUuid, delta: Delta, tags: Set[String]): Boolean =
    updateJoined(changeId, delta, Resolver.joinTags(tags))

  /** Hot-path variant taking the canonical joined tag form (sorted,
    * \u0001-separated) — the batch engine canonicalizes in Tungsten. */
  def updateJoined(changeId: TimeUuid, delta: Delta, tagsJoined: String): Boolean = {
    // intrinsics view (ISO date formatting) only when the delta can see it
    val updated = DeltaEvaluator.eval(delta, content,
      if (delta.needsIntrinsics) intrinsicsView else null)
    val contentChanged = updated != content

    // Redundant = no content change and same tags: a delta made redundant by
    // its predecessors is suppressed from the change stream, unless its tags
    // differ (a consumer filtering on tags must still see it).
    lastWasRedundant = !contentChanged && lastTagsJoined == tagsJoined
    if (lastWasRedundant) redundant += 1

    content = updated
    lastTagsJoined = tagsJoined
    version += 1
    signature = Hashes.chainSignature(signature, changeId.bytes)
    if (firstUpdate == null) firstUpdate = changeId
    lastUpdate = changeId
    // corner case: if the first delta is a delete, lastMutateAt is still set
    if (contentChanged || lastMutate == null) lastMutate = changeId
    lastWasRedundant
  }

  def result(): ResolvedDoc = ResolvedDoc(
    table = table,
    id = id,
    content = content,
    version = version,
    signature = Hashes.toHex(signature),
    deleted = isDeleted,
    firstUpdateAt = firstUpdate,
    lastUpdateAt = lastUpdate,
    lastMutateAt = lastMutate,
    placement = placement,
    redundantChanges = redundant,
    lastChangeRedundant = lastWasRedundant,
    lastTags = Resolver.splitTags(lastTagsJoined).toSet)
}

/** Fold result: current document + intrinsics. */
final case class ResolvedDoc(
    table: String,
    id: String,
    content: JValue,
    version: Long,
    signature: String,
    deleted: Boolean,
    firstUpdateAt: TimeUuid,
    lastUpdateAt: TimeUuid,
    lastMutateAt: TimeUuid,
    placement: String,
    redundantChanges: Long,
    lastChangeRedundant: Boolean,
    lastTags: Set[String]) {

  def intrinsicsView: IntrinsicsView =
    IntrinsicsView(id, table, signature, deleted,
      if (firstUpdateAt == null) null else Iso8601.format(firstUpdateAt.ms),
      if (lastUpdateAt == null) null else Iso8601.format(lastUpdateAt.ms),
      if (lastMutateAt == null) null else Iso8601.format(lastMutateAt.ms),
      placement)

  /** Document as the reference returns it: body fields + `~` intrinsics,
    * canonical key order (intrinsics first, then sorted) —
    * DefaultDataStore.toContent (DefaultDataStore.java:475-521) +
    * OrderedJson.java:18-35. */
  def toContentJson: String = {
    val base: Map[String, JValue] = content match {
      case JObj(fields) => fields
      case _            => Map.empty
    }
    val withIntrinsics = base ++ Seq(
      graft.condition.Intrinsic.Id -> JString(id),
      graft.condition.Intrinsic.Table -> JString(table),
      graft.condition.Intrinsic.Version -> JLong(version),
      graft.condition.Intrinsic.Signature -> JString(signature),
      graft.condition.Intrinsic.Deleted -> JBool(deleted),
      graft.condition.Intrinsic.Placement -> JString(placement)) ++
      Option(firstUpdateAt).map(t => graft.condition.Intrinsic.FirstUpdateAt -> JString(Iso8601.format(t.ms))) ++
      Option(lastUpdateAt).map(t => graft.condition.Intrinsic.LastUpdateAt -> JString(Iso8601.format(t.ms))) ++
      Option(lastMutateAt).map(t => graft.condition.Intrinsic.LastMutateAt -> JString(Iso8601.format(t.ms)))
    JsonCodec.render(JObj(withIntrinsics))
  }

  def bodyJson: String = if (content eq JUndefined) null else JsonCodec.render(content)
}

object Resolver {
  /** Separator for the canonical joined tag form (not a legal tag char). */
  final val TagSep = '\u0001'

  /** Code-point string ordering == the UTF-8 byte order Tungsten's
    * sortWithinPartitions/array_sort use. JVM-side fold sorts MUST use
    * this, not String's UTF-16 code-unit order: the two diverge when
    * [U+E000, U+FFFF] meets supplementary-plane strings, and a divergent
    * tie-break or tag order changes fold content AND the chained
    * ~signature between the batch and streaming paths. */
  val Utf8Order: Ordering[String] = new Ordering[String] {
    def compare(a: String, b: String): Int = {
      // fast path: walk the equal char prefix (compareTo speed); only the
      // first DIFFERING position needs code-point semantics — and if the
      // previous char is a high surrogate the difference starts inside a
      // pair, so back up one unit and compare whole code points there
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n && a.charAt(i) == b.charAt(i)) i += 1
      if (i == n) Integer.compare(a.length, b.length)
      else {
        val j = if (i > 0 && Character.isHighSurrogate(a.charAt(i - 1))) i - 1 else i
        Integer.compare(a.codePointAt(j), b.codePointAt(j))
      }
    }
  }

  def joinTags(tags: Set[String]): String =
    if (tags.isEmpty) "" else tags.toSeq.sorted(Utf8Order).mkString(TagSep.toString)

  def splitTags(joined: String): Seq[String] =
    if (joined.isEmpty) Seq.empty else joined.split(TagSep).toSeq

  /** Fold an already-ordered change sequence. */
  def resolveOrdered(
      table: String, id: String, placement: String,
      changes: Iterator[(TimeUuid, Delta, Set[String])]): ResolvedDoc = {
    val r = new Resolver(table, id, placement)
    changes.foreach { case (cid, d, tags) => r.update(cid, d, tags) }
    r.result()
  }
}

/** ISO-8601 millisecond UTC timestamps (common/json/.../ISO8601DateFormat.java). */
object Iso8601 {
  private val fmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
    .withZone(java.time.ZoneOffset.UTC)

  def format(epochMs: Long): String = fmt.format(java.time.Instant.ofEpochMilli(epochMs))

  def parseMs(s: String): Long = java.time.Instant.parse(s).toEpochMilli
}
