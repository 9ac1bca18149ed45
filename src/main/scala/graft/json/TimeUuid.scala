package graft.json

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/**
 * Change-id: the engine's version-ordering token, with RFC-4122 version-1
 * byte parity.
 *
 * The reference orders every per-document change by a time-based UUID whose
 * time-then-bits ordering is the only ordering guarantee in the system
 * (common/uuid/.../TimeUUIDs.java). Spark has no UUID type, so the engine
 * models the change id as a struct of sortable components (ms, seq, node) —
 * but its BYTE form (the input to the chained-MD5 document signature,
 * DefaultResolver.java:127-132 + UUIDs.java asByteArray) is the real
 * version-1 UUID layout the reference fabricates in
 * TimeUUIDs.uuidForTimeMillis (TimeUUIDs.java:83-118):
 *
 *   msb: | time_low (32) | time_mid (16) | version=0001 (4) | time_hi (12) |
 *        over rawTime = ms*10000 + 0x01b21dd213814000 (100ns since 1582)
 *   lsb: | variant=10 (2) | clock_seq (14) | node (48) |
 *
 * so a `~signature` computed here matches one computed from a real export's
 * UUIDs given the same (timestamp, sequence, node) components.
 *
 * Ordering parity: the reference compares timestamp first, then the full
 * UUID (TimeUUIDs.java:158-169; for equal timestamps that reduces to the
 * (clock_seq, node) bits). This struct compares (ms, seq, node-string);
 * with canonical 12-hex node strings the two orders agree — property-tested
 * against the reference algorithm in TimeUuidSpec.
 */
final case class TimeUuid(ms: Long, seq: Long, node: String)
    extends Ordered[TimeUuid] {

  def compare(that: TimeUuid): Int = {
    var c = java.lang.Long.compare(ms, that.ms)
    if (c == 0) c = java.lang.Long.compare(seq, that.seq)
    if (c == 0) c = node.compareTo(that.node)
    c
  }

  /** Most-significant half of the version-1 UUID form. */
  def v1Msb: Long = TimeUuid.v1Msb(ms)

  /** Least-significant half: variant bits + 14-bit clock_seq + 48-bit node.
    * seq values >= 2^14 wrap in the byte form (the reference's own
    * fabricated-UUID constraint, TimeUUIDs.java:113-119); struct ordering
    * still uses the full seq. */
  def v1Lsb: Long = TimeUuid.v1Lsb(seq, TimeUuid.node48(node))

  /** The RFC-4122 v1 UUID as java.util.UUID. */
  def v1Uuid: java.util.UUID = new java.util.UUID(v1Msb, v1Lsb)

  /** Big-endian 16-byte form (UUIDs.asByteArray parity) — the bytes the
    * chained-MD5 signature hashes. */
  def bytes: Array[Byte] = {
    val buf = ByteBuffer.allocate(16)
    buf.putLong(v1Msb)
    buf.putLong(v1Lsb)
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

  /** Magic from com.eaio.uuid.UUID.createTime (TimeUUIDs.java:20): 100ns
    * intervals between the UUID epoch (1582-10-15) and the Unix epoch. */
  final val Num100nsIntervalsSinceUuidEpoch = 0x01b21dd213814000L

  /** Millis bounds that don't under/overflow a time UUID
    * (TimeUUIDs.java:22-25). */
  final val TimeMillisMin: Long = -Num100nsIntervalsSinceUuidEpoch / 10000
  final val TimeMillisMax: Long =
    ((-1L >>> 4) - Num100nsIntervalsSinceUuidEpoch) / 10000

  /** 100ns intervals since 1582-10-15, on a millisecond boundary
    * (TimeUUIDs.getRawTimestamp). */
  def rawTimestamp(timeMillis: Long): Long = {
    require(timeMillis >= TimeMillisMin, s"Time value too small: $timeMillis")
    require(timeMillis <= TimeMillisMax, s"Time value too large: $timeMillis")
    timeMillis * 10000 + Num100nsIntervalsSinceUuidEpoch
  }

  /** TimeUUIDs.getMostSignificantBits: v1 time-field scatter. */
  def v1Msb(timeMillis: Long): Long = {
    val rawTime = rawTimestamp(timeMillis)
    val version = 1L << 12
    val timeLow = (rawTime & 0xffffffffL) << 32
    val timeMid = (rawTime & 0xffff00000000L) >> 16
    val timeHi = (rawTime & 0xfff000000000000L) >> 48
    timeLow | timeMid | version | timeHi
  }

  /** TimeUUIDs.getLeastSignificantBits: variant + clock_seq + node. */
  def v1Lsb(sequence: Long, node: Long): Long =
    0x8000000000000000L | ((sequence & 0x3fffL) << 48) | (node & 0xffffffffffffL)

  /** Millis back out of a v1 msb (TimeUUIDs.getTimeMillis over
    * java.util.UUID.timestamp's field gather). */
  def v1TimeMillis(msb: Long): Long = {
    val rawTime = ((msb & 0x0fffL) << 48) |
      (((msb >> 16) & 0xffffL) << 32) |
      (msb >>> 32)
    (rawTime - Num100nsIntervalsSinceUuidEpoch) / 10000
  }

  /** Struct from a real v1 UUID: ms from the timestamp, seq from clock_seq,
    * node as the canonical 12-hex string (so struct ordering matches UUID
    * ordering). */
  def fromV1(uuid: java.util.UUID): TimeUuid = {
    require(uuid.version() == 1, s"Not a time UUID: $uuid")
    val lsb = uuid.getLeastSignificantBits
    TimeUuid(v1TimeMillis(uuid.getMostSignificantBits),
      (lsb >>> 48) & 0x3fffL, f"${lsb & 0xffffffffffffL}%012x")
  }

  /** 48-bit node id for a producer node string: canonical 12-hex strings
    * parse directly (fromV1 round-trips bit-exactly); anything else maps
    * through md5 (stable, spread) — the engine's analog of a MAC address
    * for producers named by free-form strings. Memoized per thread: node
    * strings are low-cardinality (one per producer) and this sits on the
    * signature hot path of the fold. */
  def node48(node: String): Long = {
    val key = if (node == null) "" else node
    val cache = node48Cache.get()
    val hit = cache.get(key)
    if (hit != null) hit.longValue
    else {
      val v = computeNode48(key)
      if (cache.size < 4096) cache.put(key, java.lang.Long.valueOf(v))
      v
    }
  }

  private val node48Cache = ThreadLocal.withInitial(() =>
    new java.util.HashMap[String, java.lang.Long]())

  private def computeNode48(node: String): Long = {
    val isHex12 = node.length == 12 &&
      node.forall(c => (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f'))
    if (isHex12) java.lang.Long.parseLong(node, 16)
    else {
      val d = Hashes.md5(node.getBytes(StandardCharsets.UTF_8))
      ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) | ((d(2) & 0xffL) << 24) |
        ((d(3) & 0xffL) << 16) | ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
    }
  }

  /** TimeUUIDs.minimumUuid: sorts <= all v1 UUIDs. */
  def minimumUuid: java.util.UUID = {
    val version = 1L << 12
    new java.util.UUID(version, v1Lsb(0, 0))
  }

  /** TimeUUIDs.maximumUuid: sorts >= all v1 UUIDs. */
  def maximumUuid: java.util.UUID = {
    val rawTime = Long.MaxValue
    val version = 1L << 12
    val msb = ((rawTime & 0xffffffffL) << 32) |
      ((rawTime & 0xffff00000000L) >> 16) | version |
      ((rawTime & 0xfff000000000000L) >> 48)
    new java.util.UUID(msb, v1Lsb(Int.MaxValue.toLong, Long.MaxValue))
  }

  /** TimeUUIDs.getNext: smallest v1 UUID greater than `uuid`, or null at
    * the maximum (exclusive-to-inclusive range bound conversions). */
  def v1Next(uuid: java.util.UUID): java.util.UUID = {
    require(uuid.version() == 1, s"Not a time UUID: $uuid")
    val max = maximumUuid
    val lsb = uuid.getLeastSignificantBits
    if (lsb < max.getLeastSignificantBits)
      new java.util.UUID(uuid.getMostSignificantBits, lsb + 1)
    else if (uuid.timestamp() < max.timestamp())
      new java.util.UUID(v1MsbOfRaw(uuid.timestamp() + 1),
        minimumUuid.getLeastSignificantBits)
    else null
  }

  /** TimeUUIDs.getPrevious: largest v1 UUID less than `uuid`, or null. */
  def v1Previous(uuid: java.util.UUID): java.util.UUID = {
    require(uuid.version() == 1, s"Not a time UUID: $uuid")
    val min = minimumUuid
    val lsb = uuid.getLeastSignificantBits
    if (lsb > min.getLeastSignificantBits)
      new java.util.UUID(uuid.getMostSignificantBits, lsb - 1)
    else if (uuid.timestamp() > min.timestamp())
      new java.util.UUID(v1MsbOfRaw(uuid.timestamp() - 1),
        maximumUuid.getLeastSignificantBits)
    else null
  }

  private def v1MsbOfRaw(rawTime: Long): Long = {
    val version = 1L << 12
    ((rawTime & 0xffffffffL) << 32) | ((rawTime & 0xffff00000000L) >> 16) |
      version | ((rawTime & 0xfff000000000000L) >> 48)
  }
}
