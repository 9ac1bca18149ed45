package graft.json

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/**
 * Change-id: the engine's version-ordering token.
 *
 * The reference orders every per-document change by a time-based UUID whose
 * time-then-bits ordering is the only ordering guarantee in the system
 * (common/uuid/.../TimeUUIDs.java). Spark has no UUID type, so we model the
 * change id as a struct of lexically sortable components with total order
 * (ms, seq, node):
 *   - ms:   epoch millis of the change
 *   - seq:  tie-breaker sequence within the millisecond / producer
 *   - node: producer id (last tie-breaker)
 *
 * The 16+ byte canonical form feeds the chained-MD5 document signature
 * (DefaultResolver.java:119-132 hashes the UUID's 16 bytes; we hash this
 * canonical form — internally consistent, deterministic).
 */
final case class TimeUuid(ms: Long, seq: Long, node: String)
    extends Ordered[TimeUuid] {

  def compare(that: TimeUuid): Int = {
    var c = java.lang.Long.compare(ms, that.ms)
    if (c == 0) c = java.lang.Long.compare(seq, that.seq)
    if (c == 0) c = node.compareTo(that.node)
    c
  }

  def bytes: Array[Byte] = {
    val nodeBytes = node.getBytes(StandardCharsets.UTF_8)
    val buf = ByteBuffer.allocate(16 + nodeBytes.length)
    buf.putLong(ms)
    buf.putLong(seq)
    buf.put(nodeBytes)
    buf.array()
  }

  /** Sortable compact text form: 16-hex ms, 16-hex seq, node. */
  override def toString: String = f"$ms%016x-$seq%016x-$node"
}

object TimeUuid {
  def parse(s: String): TimeUuid = {
    val ms = java.lang.Long.parseUnsignedLong(s.substring(0, 16), 16)
    val seq = java.lang.Long.parseUnsignedLong(s.substring(17, 33), 16)
    TimeUuid(ms, seq, s.substring(34))
  }

  val Min: TimeUuid = TimeUuid(Long.MinValue, Long.MinValue, "")
}
