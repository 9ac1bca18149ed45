package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Aho–Corasick multi-pattern containment (Aho & Corasick, CACM 1975) —
 * the scale path for large literal blocklists and canary suites: ONE pass
 * over each document regardless of pattern count, vs the O(patterns)
 * contains-chain. The automaton builds lazily once per executor from the
 * plan-literal pattern list (patterns are config, not data — the same
 * broadcast-free budget as the LSH plane matrix).
 *
 * Returns the DISTINCT indices of matched patterns, ascending — exactly
 * the `when(contains)` chain's semantics, differentially spec-pinned.
 */
case class MultiContainsExpr(child: Expression, patterns: Seq[String])
    extends UnaryExpression with CodegenFallback {

  require(patterns.nonEmpty, "empty pattern list")
  require(patterns.forall(_.nonEmpty), "empty pattern string")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"multi_contains needs a string column, got ${other.catalogString}")
    }

  @transient private lazy val automaton = new AhoCorasick(patterns)

  override def nullSafeEval(input: Any): Any = {
    val hits = automaton.matchedPatterns(input.asInstanceOf[UTF8String].toString)
    new GenericArrayData(hits.map(Int.box))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Classic goto/fail automaton over java chars (same code units
  * String.contains compares, so parity with a contains-chain is exact). */
private[pipeline] final class AhoCorasick(patterns: Seq[String]) extends Serializable {
  import scala.collection.mutable.ArrayBuffer

  private val children = ArrayBuffer(new java.util.HashMap[Character, Integer]())
  private val fail = ArrayBuffer(0)
  private val out = ArrayBuffer[List[Int]](Nil)

  // trie
  patterns.zipWithIndex.foreach { case (p, idx) =>
    var node = 0
    p.foreach { ch =>
      val next = children(node).get(ch)
      node = if (next != null) next.intValue
      else {
        children += new java.util.HashMap[Character, Integer]()
        fail += 0
        out += Nil
        val id = children.size - 1
        children(node).put(ch, id)
        id
      }
    }
    out(node) = idx :: out(node)
  }

  // BFS failure links; output sets absorb the fail target's outputs
  locally {
    val queue = new java.util.ArrayDeque[Integer]()
    children(0).forEach { (_, v) => queue.add(v); () }
    while (!queue.isEmpty) {
      val u = queue.poll().intValue
      children(u).forEach { (ch, v) =>
        queue.add(v)
        var f = fail(u)
        while (f != 0 && !children(f).containsKey(ch)) f = fail(f)
        val target = children(f).get(ch)
        val t = if (target != null && target.intValue != v.intValue) target.intValue else 0
        fail(v) = t
        out(v) = out(v) ++ out(t)
        ()
      }
    }
  }

  /** Distinct matched pattern indices, ascending. */
  def matchedPatterns(text: String): Array[Int] = {
    val seen = new java.util.TreeSet[Integer]()
    var node = 0
    var i = 0
    val n = text.length
    while (i < n) {
      val ch = text.charAt(i)
      while (node != 0 && !children(node).containsKey(ch)) node = fail(node)
      val next = children(node).get(ch)
      node = if (next != null) next.intValue else 0
      out(node).foreach(idx => { seen.add(idx); () })
      i += 1
    }
    val arr = new Array[Int](seen.size)
    var j = 0
    seen.forEach { v => arr(j) = v.intValue; j += 1 }
    arr
  }
}

object MultiContains {
  /** array<int> of the distinct pattern indices contained in `text`. */
  def matchedIndices(text: Column, patterns: Seq[String]): Column =
    GraftBridge.column(MultiContainsExpr(GraftBridge.expression(text), patterns))
}
