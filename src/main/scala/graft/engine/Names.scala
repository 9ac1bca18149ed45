package graft.engine

/**
 * Name legality rules shared by every named resource (SURVEY §2.1; reference
 * common/api Names.java, databus-api/queue-api Names.java — the subscription
 * and queue rules are character-for-character the table rule, blob-api
 * Names.java for blob ids, sor-api Names.java for attribute names).
 *
 * Table/subscription/queue names: 1-255 chars of lowercase ascii letters,
 * digits and `-.:_`; may not start with a single `_` (URL space reserved for
 * extensions, `__` is allowed) and may not be the relative paths `.`/`..`.
 */
object Names {

  private def allowedTableChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
      c == '-' || c == '.' || c == ':' || c == '_'

  def isLegalTableName(name: String): Boolean =
    name != null && name.nonEmpty && name.length <= 255 &&
      !(name.charAt(0) == '_' && !name.startsWith("__")) &&
      name != "." && name != ".." &&
      name.forall(allowedTableChar)

  /** Subscription names follow the table rule (databus-api Names.java). */
  def isLegalSubscriptionName(name: String): Boolean = isLegalTableName(name)

  /** Queue names follow the table rule (queue-api Names.java). */
  def isLegalQueueName(name: String): Boolean = isLegalTableName(name)

  /** Blob ids: printable ascii excluding path/glob/quote characters
    * (blob-api Names.java — excludes whitespace, control, non-ascii and
    * the characters in backslash-slash-star-question-quote-angle-pipe-comma-hash). */
  def isLegalBlobId(id: String): Boolean =
    id != null && id.nonEmpty && id.length <= 255 &&
      id.forall(c => c >= '!' && c <= '~' && !"\\/*?\"'<>|,#".contains(c))

  /** Table template attribute names may not collide with the `~` intrinsic
    * namespace (sor-api Names.java, enforced at createTable/setAttributes —
    * DefaultDataStore.java:991). */
  def isLegalTableAttributeName(name: String): Boolean = !name.startsWith("~")
}

/**
 * TTL coercion (reference common/api Ttls.java): durations round UP to whole
 * seconds, are clamped below by `minimum` and above by `forever` (the
 * store's "no expiry" sentinel). `None` duration means forever.
 */
object Ttls {
  def toSeconds(ttl: Option[java.time.Duration], minimum: Int,
                forever: Option[Int]): Option[Int] = ttl match {
    case None => forever
    case Some(d) =>
      require(d.compareTo(java.time.Duration.ZERO) >= 0, s"Ttl may not be negative: $d")
      // round up to whole seconds
      val seconds = d.plusSeconds(1).minusMillis(1).getSeconds
      if (seconds > Int.MaxValue) forever // no support for really large numbers
      else if (seconds < minimum) Some(minimum)
      else if (forever.exists(seconds > _)) forever
      else Some(seconds.toInt)
  }
}
