package graft.condition

import graft.json._

/**
 * Static condition algebra (no data): implication, disjointness, inversion —
 * the engine's equivalents of the reference's SubsetEvaluator (506 LoC),
 * DistinctEvaluator (489), InverseEvaluator (216)
 * (sor-api/.../condition/eval/). Used for permission-style subsumption,
 * subscription-union pruning and conjunct elimination before Catalyst ever
 * sees the plan.
 *
 * All three analyses are CONSERVATIVE: `isSubset`/`isDisjoint`/`isInverse`
 * returning false means "cannot prove", never "definitely not" — callers may
 * only use positive answers to transform plans, so unproven cases are safe.
 */
object ConditionAlgebra {

  /** l implies r: every value matching l also matches r. */
  def isSubset(l: Condition, r: Condition): Boolean = (l, r) match {
    case (_, ConstantCondition(true))  => true
    case (ConstantCondition(false), _) => true
    case (ConstantCondition(true), rr) => matchesEverything(rr)
    case (_, ConstantCondition(false)) => never(l)

    // decompose l first: a union is a subset iff every branch is
    case (OrCondition(ls), _) => ls.forall(isSubset(_, r))
    // a conjunction is a subset if any single conjunct already is
    case (AndCondition(ls), _) if ls.exists(isSubset(_, r)) => true

    // decompose r: subset of a conjunction needs all conjuncts
    case (_, AndCondition(rs)) => rs.forall(isSubset(l, _))
    // subset of a union if subset of any branch
    case (_, OrCondition(rs)) if rs.exists(isSubset(l, _)) => true
    // subset of a negation iff provably disjoint from the negated condition
    case (_, NotCondition(b)) => isDisjoint(l, b)

    // negation on the left: the constructive inverse substitutes directly
    // (the reference's SubsetEvaluator does exactly this via
    // InverseEvaluator); otherwise push through De Morgan — not(A or B)
    // implies not(A) (and not(B)), not(A and B) = not(A) or not(B) needs
    // every branch to imply r
    case (NotCondition(la), rr) =>
      inverseOf(la).map(isSubset(_, rr)).getOrElse(la match {
        case OrCondition(as)  => as.exists(a => isSubset(Conditions.not(a), rr))
        case AndCondition(as) => as.forall(a => isSubset(Conditions.not(a), rr))
        case _                => false
      })

    // exact rule: a literal value implies r iff r accepts it (data-free eval;
    // only valid when r needs no intrinsics)
    case (EqualCondition(v), rr) if !referencesIntrinsics(rr) =>
      evalSafe(rr, v).getOrElse(false)
    case (InCondition(vs), rr) if !referencesIntrinsics(rr) =>
      vs.forall(v => evalSafe(rr, v).getOrElse(false))

    case (IsCondition(a), IsCondition(b)) =>
      a == b || (b == State.DEFINED && a != State.UNDEFINED)

    // a comparison only matches values of its operand's kind
    // (ConditionEvaluator: string compares match strings, numeric match
    // numbers, everything else never matches)
    case (ComparisonCondition(_, _), IsCondition(State.DEFINED)) => true
    case (ComparisonCondition(_, v), IsCondition(State.STRING)) =>
      v.isInstanceOf[JString]
    case (ComparisonCondition(_, v), IsCondition(State.NUM)) => JValue.isNumber(v)
    case (lc @ ComparisonCondition(_, _), rc @ ComparisonCondition(_, _)) =>
      comparisonSubset(lc, rc)

    // contains(...) only matches lists; map conditions only match maps.
    // (A hand-built ContainsCondition(Set.empty, ANY|ALL) evaluates true on
    // EVERY value including undefined, which would make this rule unsound —
    // but the builders/parser normalize empty contains-sets away, and the
    // reference's SubsetEvaluator.java:216 states this same rule for its
    // own ContainsCondition objects: deliberate parity.)
    case (ContainsCondition(_, _), IsCondition(State.ARRAY | State.DEFINED)) => true
    case (MapCondition(_), IsCondition(State.OBJECT | State.DEFINED)) => true

    case (ContainsCondition(lv, lc), ContainsCondition(rv, rc)) =>
      containsSubset(lv, lc, rv, rc)

    case (LikeCondition(_), IsCondition(State.STRING | State.DEFINED)) => true
    case (lc @ LikeCondition(_), rc @ LikeCondition(_)) => likeSubset(lc, rc)

    // every match of a like() starts with its anchored prefix, so it is >=
    // that prefix (the prefix itself is the infimum of the match set)
    case (lc @ LikeCondition(_), ComparisonCondition(op, JString(v))) =>
      anchoredPrefix(lc) match {
        case Some(pre) if op == Comparison.GE => pre >= v
        case Some(pre) if op == Comparison.GT => pre > v
        case _ => false
      }

    case (MapCondition(le), MapCondition(re)) =>
      // {..} conditions: l constrains a superset of keys at least as tightly.
      // For keys absent in l, l allows anything, so r's entry must accept
      // every possible value (only alwaysTrue does, conservatively).
      re.forall { case (k, rc) =>
        le.get(k) match {
          case Some(lc) => isSubset(lc, rc)
          case None     => matchesEverything(rc)
        }
      }

    case (IntrinsicCondition(ln, lc), IntrinsicCondition(rn, rc)) =>
      ln == rn && isSubset(lc, rc)

    case (PartitionCondition(ln, lc), PartitionCondition(rn, rc)) =>
      ln == rn && isSubset(lc, rc)

    case _ => l == r // reflexivity
  }

  /** l and r cannot both hold for any value. */
  def isDisjoint(l: Condition, r: Condition): Boolean = (l, r) match {
    case (ConstantCondition(false), _) | (_, ConstantCondition(false)) => true
    case (ConstantCondition(true), rr) => never(rr)
    case (ll, ConstantCondition(true)) => never(ll)

    case (OrCondition(ls), _) => ls.forall(isDisjoint(_, r))
    case (_, OrCondition(rs)) => rs.forall(isDisjoint(l, _))
    case (AndCondition(ls), _) if ls.exists(isDisjoint(_, r)) => true
    case (_, AndCondition(rs)) if rs.exists(isDisjoint(l, _)) => true

    case (EqualCondition(v), rr) if !referencesIntrinsics(rr) =>
      evalSafe(rr, v).exists(b => !b)
    case (rr, EqualCondition(v)) if !referencesIntrinsics(rr) =>
      evalSafe(rr, v).exists(b => !b)
    case (InCondition(vs), rr) if !referencesIntrinsics(rr) =>
      vs.forall(v => evalSafe(rr, v).exists(b => !b))
    case (rr, InCondition(vs)) if !referencesIntrinsics(rr) =>
      vs.forall(v => evalSafe(rr, v).exists(b => !b))

    case (IsCondition(a), IsCondition(b)) =>
      if ((a == State.UNDEFINED && b == State.DEFINED) ||
          (a == State.DEFINED && b == State.UNDEFINED)) true
      else a != b && a != State.DEFINED && b != State.DEFINED

    case (lc @ ComparisonCondition(_, _), rc @ ComparisonCondition(_, _)) =>
      comparisonDisjoint(lc, rc)

    // a comparison never matches values outside its operand's kind
    case (ComparisonCondition(_, v), IsCondition(s)) => comparisonIsDisjoint(v, s)
    case (IsCondition(s), ComparisonCondition(_, v)) => comparisonIsDisjoint(v, s)

    // like() matches strings only; proven-non-overlapping patterns disjoint
    case (lc @ LikeCondition(_), rc @ LikeCondition(_)) => !likeOverlaps(lc, rc)
    case (LikeCondition(_), IsCondition(s)) => s != State.STRING && s != State.DEFINED
    case (IsCondition(s), LikeCondition(_)) => s != State.STRING && s != State.DEFINED

    // every like() match is >= its anchored prefix: disjoint from any upper
    // bound strictly below the prefix
    case (lc @ LikeCondition(_), ComparisonCondition(op, JString(v))) =>
      likeComparisonDisjoint(lc, op, v)
    case (ComparisonCondition(op, JString(v)), lc @ LikeCondition(_)) =>
      likeComparisonDisjoint(lc, op, v)

    case (NotCondition(a), b) => isSubset(b, a)
    case (a, NotCondition(b)) => isSubset(a, b)

    case (MapCondition(le), MapCondition(re)) =>
      // disjoint if some shared key's constraints are disjoint
      le.exists { case (k, lc) => re.get(k).exists(rc => isDisjoint(lc, rc)) }

    case (IntrinsicCondition(ln, lc), IntrinsicCondition(rn, rc)) =>
      ln == rn && isDisjoint(lc, rc)

    case _ => false
  }

  /** r matches exactly the values l does not (exact complement). */
  def isInverse(l: Condition, r: Condition): Boolean = (l, r) match {
    case (ConstantCondition(a), ConstantCondition(b)) => a != b
    case (IsCondition(State.UNDEFINED), IsCondition(State.DEFINED)) => true
    case (IsCondition(State.DEFINED), IsCondition(State.UNDEFINED)) => true
    case (NotCondition(a), b) => a == b
    case (a, NotCondition(b)) => a == b
    case (OrCondition(ls), AndCondition(rs)) => deMorgan(ls, rs)
    case (AndCondition(ls), OrCondition(rs)) => deMorgan(ls, rs)
    case _ => inverseOf(l).contains(r)
  }

  /**
   * The constructive inverse (InverseEvaluator.java:42-216): a condition `i`
   * guaranteeing `eval(c, v, intr) != eval(i, v, intr)` for EVERY value and
   * intrinsics, or None when no well-defined inverse exists as a Condition
   * (equal / in / contains / like — InverseEvaluator.java:195-215 returns
   * null for these rather than not(condition)).
   *
   * Key reference choices preserved: a typed is() inverts to the OR of every
   * OTHER concrete state (never DEFINED, which overlaps all of them); a
   * comparison inverts to (wrong-kind OR flipped-comparison), because the
   * evaluator returns false on kind mismatch so the inverse must return true
   * there; and/or/map push through De Morgan with not(sub) standing in for
   * non-invertible branches (InverseEvaluator.java:148-161,169-185).
   */
  def inverseOf(c: Condition): Option[Condition] = c match {
    case ConstantCondition(b) => Some(ConstantCondition(!b))
    case NotCondition(inner)  => Some(inner)
    case IsCondition(State.DEFINED)   => Some(IsCondition(State.UNDEFINED))
    case IsCondition(State.UNDEFINED) => Some(IsCondition(State.DEFINED))
    case IsCondition(s) =>
      Some(Conditions.or(State.values.toSeq.sorted
        .filter(v => v != s && v != State.DEFINED).map(IsCondition(_): Condition)))
    case ComparisonCondition(op, v) =>
      import Comparison._
      val flipped: Condition = op match {
        case GT => ComparisonCondition(LE, v)
        case GE => ComparisonCondition(LT, v)
        case LT => ComparisonCondition(GE, v)
        case LE => ComparisonCondition(GT, v)
      }
      val kind = if (JValue.isNumber(v)) State.NUM else State.STRING
      inverseOf(IsCondition(kind)).map(notKind => Conditions.or(Seq(notKind, flipped)))
    case IntrinsicCondition(name, inner) =>
      inverseOf(inner).map(IntrinsicCondition(name, _))
    case PartitionCondition(n, inner) =>
      inverseOf(inner).map(PartitionCondition(n, _))
    case AndCondition(cs) => Some(Conditions.or(cs.map(inverseOrNot)))
    case OrCondition(cs)  => Some(Conditions.and(cs.map(inverseOrNot)))
    case MapCondition(entries) =>
      // or(one single-key map per inverted entry, not-a-map): a map condition
      // is the AND of its key conditions plus is(object)
      val perKey = entries.toSeq.map { case (k, kc) =>
        MapCondition(Map(k -> inverseOrNot(kc))): Condition
      }
      inverseOf(IsCondition(State.OBJECT)).map(notMap =>
        Conditions.or(perKey :+ notMap))
    case _ => None // Equal, In, Contains, Like
  }

  private def inverseOrNot(c: Condition): Condition =
    inverseOf(c).getOrElse(Conditions.not(c))

  private def deMorgan(ls: Seq[Condition], rs: Seq[Condition]): Boolean =
    ls.size == rs.size && ls.zip(rs).forall { case (a, b) => isInverse(a, b) }

  // -------------------------------------------------------------- simplify

  /** Algebraic simplification: drop conjuncts implied by others, drop union
    * branches subsumed by others, collapse provable constants. */
  def simplify(c: Condition): Condition = c match {
    case AndCondition(cs) =>
      val simplified = cs.map(simplify)
      if (simplified.combinations(2).exists { case Seq(a, b) => isDisjoint(a, b) })
        Conditions.alwaysFalse
      else {
        // keep a conjunct only if no OTHER kept conjunct implies it
        val kept = simplified.zipWithIndex.filterNot { case (ci, i) =>
          simplified.zipWithIndex.exists { case (cj, j) =>
            j != i && isSubset(cj, ci) && !(isSubset(ci, cj) && j > i)
          }
        }.map(_._1)
        Conditions.and(kept)
      }
    case OrCondition(cs) =>
      val simplified = cs.map(simplify)
      // keep a branch only if no OTHER kept branch subsumes it
      val kept = simplified.zipWithIndex.filterNot { case (ci, i) =>
        simplified.zipWithIndex.exists { case (cj, j) =>
          j != i && isSubset(ci, cj) && !(isSubset(cj, ci) && j > i)
        }
      }.map(_._1)
      Conditions.or(kept)
    case NotCondition(inner) => Conditions.not(simplify(inner))
    case MapCondition(entries) =>
      MapCondition(entries.map { case (k, v) => k -> simplify(v) })
    case IntrinsicCondition(n, inner) => IntrinsicCondition(n, simplify(inner))
    case PartitionCondition(n, inner) => PartitionCondition(n, simplify(inner))
    case other => other
  }

  // ---------------------------------------------------------------- helpers

  /** True when the condition provably accepts every value incl. UNDEFINED. */
  private def matchesEverything(c: Condition): Boolean = c match {
    case ConstantCondition(true) => true
    case AndCondition(cs)        => cs.forall(matchesEverything)
    case OrCondition(cs)         => cs.exists(matchesEverything)
    case _                       => false
  }

  /** True when the condition provably never matches. */
  private def never(c: Condition): Boolean = c match {
    case ConstantCondition(false) => true
    case OrCondition(cs)          => cs.forall(never)
    case AndCondition(cs)         => cs.exists(never)
    case _                        => false
  }

  def referencesIntrinsics(c: Condition): Boolean = c match {
    case _: IntrinsicCondition | _: PartitionCondition => true
    case AndCondition(cs) => cs.exists(referencesIntrinsics)
    case OrCondition(cs)  => cs.exists(referencesIntrinsics)
    case NotCondition(i)  => referencesIntrinsics(i)
    case MapCondition(es) => es.values.exists(referencesIntrinsics)
    case _ => false
  }

  private def evalSafe(c: Condition, v: JValue): Option[Boolean] =
    try Some(ConditionEvaluator.eval(c, v)) catch { case _: Exception => None }

  /** Contains-family implication over value SETS (ConditionEvaluator
    * semantics: ALL = condValues within the list's set, ANY = intersection,
    * ONLY = set equality). */
  private def containsSubset(lv: Set[JValue], lc: Containment.Containment,
                             rv: Set[JValue], rc: Containment.Containment): Boolean = {
    import Containment._
    (lc, rc) match {
      case (ALL, ALL)   => rv.subsetOf(lv)
      case (ALL, ANY)   => lv.intersect(rv).nonEmpty
      case (ANY, ANY)   => lv.subsetOf(rv)
      case (ONLY, ONLY) => lv == rv
      case (ONLY, ALL)  => rv.subsetOf(lv)
      case (ONLY, ANY)  => lv.intersect(rv).nonEmpty
      case _            => false
    }
  }

  private def comparisonIsDisjoint(v: JValue, s: State.State): Boolean =
    if (v.isInstanceOf[JString]) s != State.STRING && s != State.DEFINED
    else if (JValue.isNumber(v)) s != State.NUM && s != State.DEFINED
    else false

  /** The literal prefix every match of the pattern starts with (None when
    * the pattern opens with a wildcard). */
  private def anchoredPrefix(lc: LikeCondition): Option[String] = {
    val (lead, _, segs) = LikeCondition.compile(lc.pattern)
    if (lead || segs.isEmpty) None else Some(segs.head)
  }

  private def likeComparisonDisjoint(lc: LikeCondition,
                                     op: Comparison.Comparison, v: String): Boolean =
    anchoredPrefix(lc) match {
      case Some(pre) if op == Comparison.LE => pre > v || (pre == v && !lc.matches(v))
      case Some(pre) if op == Comparison.LT => pre >= v
      case _ => false
    }

  /** Range inclusion for same-type comparisons: l's range within r's. */
  private def comparisonSubset(l: ComparisonCondition, r: ComparisonCondition): Boolean = {
    import Comparison._
    (comparableSameKind(l.value, r.value), l.op, r.op) match {
      case (false, _, _) => false
      case (_, GT, GT) => cmp(l.value, r.value) >= 0 // x>5 implies x>3
      case (_, GT, GE) => cmp(l.value, r.value) >= 0 // x>5 implies x>=5
      case (_, GE, GE) => cmp(l.value, r.value) >= 0
      case (_, GE, GT) => cmp(l.value, r.value) > 0  // x>=6 implies x>5
      case (_, LT, LT) => cmp(l.value, r.value) <= 0
      case (_, LT, LE) => cmp(l.value, r.value) <= 0
      case (_, LE, LE) => cmp(l.value, r.value) <= 0
      case (_, LE, LT) => cmp(l.value, r.value) < 0
      case _ => false
    }
  }

  private def comparisonDisjoint(l: ComparisonCondition, r: ComparisonCondition): Boolean = {
    import Comparison._
    if (!comparableSameKind(l.value, r.value)) return false
    def upper(c: ComparisonCondition) = c.op == LT || c.op == LE
    def lower(c: ComparisonCondition) = c.op == GT || c.op == GE
    // x < a disjoint x > b when a <= b (with equality edge on LE/GE)
    if (upper(l) && lower(r)) {
      val c0 = cmp(l.value, r.value)
      c0 < 0 || (c0 == 0 && (l.op == LT || r.op == GT))
    } else if (lower(l) && upper(r)) {
      val c0 = cmp(r.value, l.value)
      c0 < 0 || (c0 == 0 && (r.op == LT || l.op == GT))
    } else false
  }

  private def comparableSameKind(a: JValue, b: JValue): Boolean =
    (JValue.isNumber(a) && JValue.isNumber(b)) ||
      (a.isInstanceOf[JString] && b.isInstanceOf[JString])

  private def cmp(a: JValue, b: JValue): Int = JValue.CrossTypeOrdering.compare(a, b)

  /** Like-pattern implication, exact for all multi-segment globs
    * (LikeConditionImpl.isSubsetOf:173-179): replace every wildcard of l
    * with a char no literal can contain — l implies r iff r matches the
    * result, since r's segments can then only embed inside l's guaranteed
    * literal runs, respecting anchors. */
  private def likeSubset(l: LikeCondition, r: LikeCondition): Boolean = {
    if (l.pattern == r.pattern) return true
    val u = LikeCondition.unescape(l.pattern)
    val sb = new java.lang.StringBuilder(u.chars.length)
    var i = 0
    while (i < u.chars.length) {
      sb.append(if (u.isWildcard(i)) '\u0000' else u.chars(i))
      i += 1
    }
    r.matches(sb.toString)
  }

  /** May the two patterns match a common string?
    * (LikeConditionImpl.overlaps:151-170) Literal patterns check exact
    * membership; otherwise overlap depends only on the anchored prefixes
    * and suffixes (internal wildcard regions can always be made to agree).
    * `false` is definitive — used to prove disjointness. */
  private def likeOverlaps(l: LikeCondition, r: LikeCondition): Boolean = {
    val (lLead, lTrail, lSegs) = LikeCondition.compile(l.pattern)
    val (rLead, rTrail, rSegs) = LikeCondition.compile(r.pattern)
    val lLiteral = !lLead && !lTrail && lSegs.size <= 1
    val rLiteral = !rLead && !rTrail && rSegs.size <= 1
    if (lLiteral) return r.matches(lSegs.headOption.getOrElse(""))
    if (rLiteral) return l.matches(rSegs.headOption.getOrElse(""))
    val lPre = if (!lLead && lSegs.nonEmpty) lSegs.head else null
    val rPre = if (!rLead && rSegs.nonEmpty) rSegs.head else null
    val lSuf = if (!lTrail && lSegs.nonEmpty) lSegs.last else null
    val rSuf = if (!rTrail && rSegs.nonEmpty) rSegs.last else null
    (lPre == null || rPre == null || lPre.startsWith(rPre) || rPre.startsWith(lPre)) &&
      (lSuf == null || rSuf == null || lSuf.endsWith(rSuf) || rSuf.endsWith(lSuf))
  }
}
