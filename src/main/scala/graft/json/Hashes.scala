package graft.json

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/**
 * Hash functions with bit-parity to the reference's uses:
 *  - murmur3_32 (MurmurHash3 x86 32-bit, seed 0, little-endian blocks) over
 *    a concatenated UTF-8 byte stream — used by the `partition(N:...)`
 *    condition (ConditionEvaluator.java:266-276: abs(h) % N + 1, with Java
 *    int abs semantics) and the row-key shard id (RowKeyUtils.java:69-70).
 *    Spark's builtin `hash()` is murmur3 with a different seed/combining
 *    scheme, hence this standalone implementation (public MurmurHash3
 *    algorithm by Austin Appleby, public domain).
 *  - chained MD5 document signature: sig' = md5(sig ++ changeIdBytes)
 *    (DefaultResolver.java:119-132), zero-initialized (16 zero bytes).
 */
object Hashes {

  // ------------------------------------------------------------- murmur3_32

  private final val C1 = 0xcc9e2d51
  private final val C2 = 0x1b873593

  def murmur3_32(bytes: Array[Byte]): Int = {
    val len = bytes.length
    var h1 = 0 // seed 0
    val nBlocks = len / 4
    var b = 0
    while (b < nBlocks) {
      val idx = b * 4
      var k1 = (bytes(idx) & 0xff) |
        ((bytes(idx + 1) & 0xff) << 8) |
        ((bytes(idx + 2) & 0xff) << 16) |
        ((bytes(idx + 3) & 0xff) << 24)
      k1 *= C1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= C2
      h1 ^= k1
      h1 = Integer.rotateLeft(h1, 13)
      h1 = h1 * 5 + 0xe6546b64
      b += 1
    }
    // tail
    val tailStart = nBlocks * 4
    var k1 = 0
    (len & 3) match {
      case 3 =>
        k1 ^= (bytes(tailStart + 2) & 0xff) << 16
        k1 ^= (bytes(tailStart + 1) & 0xff) << 8
        k1 ^= bytes(tailStart) & 0xff
      case 2 =>
        k1 ^= (bytes(tailStart + 1) & 0xff) << 8
        k1 ^= bytes(tailStart) & 0xff
      case 1 =>
        k1 ^= bytes(tailStart) & 0xff
      case _ =>
    }
    if ((len & 3) != 0) {
      k1 *= C1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= C2
      h1 ^= k1
    }
    // fmix
    h1 ^= len
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  def murmur3_32(s: String): Int = murmur3_32(s.getBytes(StandardCharsets.UTF_8))

  /** murmur3_32 over the concatenated UTF-8 bytes of the inputs (equivalent
    * to an incremental hasher fed each string in turn). */
  def murmur3_32Concat(a: String, b: String): Int = {
    val ba = a.getBytes(StandardCharsets.UTF_8)
    val bb = b.getBytes(StandardCharsets.UTF_8)
    val all = new Array[Byte](ba.length + bb.length)
    System.arraycopy(ba, 0, all, 0, ba.length)
    System.arraycopy(bb, 0, all, ba.length, bb.length)
    murmur3_32(all)
  }

  /** Document partition for `partition(N:...)`: abs(murmur3_32(table ++ id))
    * % N + 1 with Java Math.abs int semantics (ConditionEvaluator.java:266-276). */
  def partitionOf(table: String, id: String, numPartitions: Int): Int =
    Math.abs(murmur3_32Concat(table, id)) % numPartitions + 1

  /** Row-key shard id: low 8 bits of the key hash (RowKeyUtils.java:69-70). */
  def shardId(table: String, key: String, numShards: Int = 16): Int =
    Math.abs(murmur3_32Concat(table, key)) & (numShards - 1)

  // ------------------------------------------------------- chained signature

  val SignatureZero: Array[Byte] = new Array[Byte](16)

  private val localMd5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  def md5(bytes: Array[Byte]): Array[Byte] = {
    val md = localMd5.get()
    md.reset()
    md.digest(bytes)
  }

  /** sig' = md5(prevSig ++ changeIdBytes). */
  def chainSignature(prev: Array[Byte], changeIdBytes: Array[Byte]): Array[Byte] = {
    val md = localMd5.get()
    md.reset()
    md.update(prev)
    md.update(changeIdBytes)
    md.digest()
  }

  def toHex(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bytes.length * 2)
    bytes.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** Inverse of toHex; strict (throws on odd length / non-hex chars). */
  def fromHex(hex: String): Array[Byte] = {
    require(hex.length % 2 == 0, s"odd-length hex: $hex")
    val out = new Array[Byte](hex.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = Integer.parseInt(hex.substring(2 * i, 2 * i + 2), 16).toByte
      i += 1
    }
    out
  }
}
