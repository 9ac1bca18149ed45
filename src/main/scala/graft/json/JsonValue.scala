package graft.json

/**
 * JSON value ADT — the engine's logical type system.
 *
 * Mirrors the reference semantics (bazaarvoice/emodb):
 *  - the value space is exactly JSON (null, bool, number with Long vs Double
 *    distinguished, string, array, object) plus a distinguished UNDEFINED
 *    sentinel (key absent != key null) — see
 *    sor-api/.../delta/eval/DeltaEvaluator.java:29-34.
 *  - equality is type-strict deep equality: JNum long 3 != double 3.0, lists
 *    are order-sensitive, maps are order-insensitive
 *    (ConditionEvaluator.java:56-63).
 *  - cross-type ordering (needed for sorted-set deltas) sorts nulls first,
 *    numbers numerically, then by type-class name
 *    (Boolean < List < Map < Number < String), then within-type
 *    (LiteralImpl.java:88-127).
 */
sealed trait JValue extends Serializable {
  def isDefined: Boolean = this ne JUndefined
}

/** Sentinel for "no value at this position" (absent map key / deleted doc). */
case object JUndefined extends JValue {
  override def toString: String = "<UNDEFINED>"
}
case object JNull extends JValue
final case class JBool(value: Boolean) extends JValue
final case class JLong(value: Long) extends JValue
final case class JDouble(value: Double) extends JValue
final case class JString(value: String) extends JValue
final case class JArr(items: Vector[JValue]) extends JValue {
  /** Memoized set view for containment checks: multi-condition evaluation
    * (fanout matching N subscriptions against one event) probes the same
    * array once per condition — rebuilding the set per probe dominated the
    * match loop. Transient (recomputed after deserialization) and not a
    * constructor field, so case-class equality/serialization are untouched. */
  @transient lazy val itemSet: Set[JValue] = items.toSet
}
final case class JObj(fields: Map[String, JValue]) extends JValue {
  /** Field access preserving the UNDEFINED-vs-null trichotomy. */
  def get(key: String): JValue = fields.getOrElse(key, JUndefined)
}

object JValue {

  val JTrue: JBool = JBool(true)
  val JFalse: JBool = JBool(false)
  def obj(fields: (String, JValue)*): JObj = JObj(fields.toMap)
  def arr(items: JValue*): JArr = JArr(items.toVector)

  def num(n: Long): JValue = JLong(n)
  def num(n: Double): JValue = JDouble(n)
  def str(s: String): JValue = JString(s)

  def isNumber(v: JValue): Boolean = v match {
    case _: JLong | _: JDouble => true
    case _ => false
  }

  /** Numeric value promoted to double for comparisons. */
  def doubleValue(v: JValue): Double = v match {
    case JLong(n)   => n.toDouble
    case JDouble(n) => n
    case other      => throw new IllegalArgumentException(s"not a number: $other")
  }

  /**
   * Cross-type total order, parity with the reference's literal ordering
   * (LiteralImpl.java:88-127): nulls first; any two numbers numerically
   * (double compare if either is a double, else long compare); different
   * types by type-class simple name (Boolean < List < Map < Number <
   * String); same-type: booleans false<true, strings lexicographically
   * (UTF-16 code units like Java's String.compareTo), lists/maps by their
   * canonical serialized form.
   */
  object CrossTypeOrdering extends Ordering[JValue] {
    private def typeRank(v: JValue): Int = v match {
      case JNull         => 0
      case _: JBool      => 1 // "Boolean"
      case _: JArr       => 2 // "List"
      case _: JObj       => 3 // "Map"
      case _: JLong      => 4 // "Number"
      case _: JDouble    => 4
      case _: JString    => 5 // "String"
      case JUndefined    => throw new IllegalArgumentException("cannot order UNDEFINED")
    }

    def compare(a: JValue, b: JValue): Int = {
      if (a eq JNull) return if (b eq JNull) 0 else -1
      if (b eq JNull) return 1
      if (isNumber(a) && isNumber(b)) {
        (a, b) match {
          case (JLong(x), JLong(y)) => java.lang.Long.compare(x, y)
          case _ => java.lang.Double.compare(doubleValue(a), doubleValue(b))
        }
      } else {
        val ra = typeRank(a)
        val rb = typeRank(b)
        if (ra != rb) Integer.compare(ra, rb)
        else (a, b) match {
          case (JBool(x), JBool(y))     => java.lang.Boolean.compare(x, y)
          case (JString(x), JString(y)) => x.compareTo(y)
          case _ => JsonCodec.render(a).compareTo(JsonCodec.render(b))
        }
      }
    }
  }

  /** Strict deep equality is structural equality on the ADT (case classes),
    * matching Objects.equals semantics on Jackson trees: type-strict numbers,
    * order-sensitive lists, order-insensitive maps. Exposed for clarity. */
  def deepEqual(a: JValue, b: JValue): Boolean = a == b
}
