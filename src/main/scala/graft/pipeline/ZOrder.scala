package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Z-order (Morton-curve) multi-dimensional clustering for the storage
 * layout — the lakehouse data-skipping staple (Morton 1966; the OPTIMIZE
 * ZORDER pattern of public lakehouse engines).
 *
 * Why it matters at 100 TB: parquet scans skip row groups whose
 * column min/max excludes the predicate. A layout sorted by ONE column
 * gives perfect skipping on that column and none on any other; the
 * Z-curve interleaves the bits of several columns so rows close in the
 * curve are close in EVERY dimension — a multi-column box predicate then
 * prunes most files on each of the clustered columns simultaneously.
 *
 * Shape:
 *  1. one tiny min/max aggregate per clustered column (driver-side,
 *     parameter-sized — the same legitimacy class as centroid collects);
 *  2. each column scales to a `bits`-wide integer rank, scan-locally;
 *  3. [[ZOrderExpr]] interleaves the bit planes into one Long,
 *     codegen-capable so the z-value never leaves whole-stage codegen;
 *  4. `repartitionByRange(z)` + `sortWithinPartitions(z)` writes files
 *     whose per-column min/max windows are narrow → skipping.
 *
 * The z-value is layout-only: it never changes results, only which files
 * a predicate has to read (correctness is oracle-checked as plain filter
 * equivalence; the pruning benefit is spec-pinned by measuring per-file
 * min/max windows against a single-column sort).
 */
object ZOrder {

  /** Bit-interleave already-normalized non-negative int ranks (each
    * `< 2^bits`) into a Long Morton code. Up to 4 dims, with
    * `bits × dims <= 62` (so 4 dims cap at 15 bits, 3 at 20, 2 at 31). */
  def interleave(ranks: Seq[Column], bits: Int = 16): Column =
    GraftBridge.column(ZOrderExpr(ranks.map(GraftBridge.expression), bits))

  /** Morton code for raw numeric columns: scales each into [0, 2^bits)
    * by the column's (min, max) — gathered in ONE aggregate pass — then
    * interleaves. Returns the input plus `zCol`. NULL values rank at the
    * top of their dimension (the null-skipping `least` pins them to
    * maxRank), so all-null rows cluster together at the curve's end —
    * layout-only, results never change. */
  def withZValue(df: DataFrame, cols: Seq[String], zCol: String = "__z",
                 bits: Int = 16): DataFrame = {
    require(cols.nonEmpty && cols.size <= 4, "z-order takes 1..4 columns")
    require(bits * cols.size <= 62, s"bits=$bits × ${cols.size} dims overflows a Long")
    require(!df.columns.contains(zCol), s"column $zCol already exists")
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"__min_$c"),
      max(col(c).cast("double")).as(s"__max_$c")))
    val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    // empty or first-column-all-null input: no range to scale, constant z
    if (r.isNullAt(0)) return df.withColumn(zCol, lit(0L))
    val maxRank = (1L << bits) - 1
    val ranks = cols.zipWithIndex.map { case (c, i) =>
      // a later ALL-null column has no (min,max): degenerate range, every
      // row takes the null→maxRank rank — constant in that dim, no NPE
      val lo = if (r.isNullAt(2 * i)) 0.0 else r.getDouble(2 * i)
      val hi = if (r.isNullAt(2 * i + 1)) 0.0 else r.getDouble(2 * i + 1)
      val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
      least(lit(maxRank),
        floor((col(c).cast("double") - lit(lo)) / lit(span) * lit(maxRank + 1)))
        .cast("int")
    }
    df.withColumn(zCol, interleave(ranks, bits))
  }

  /** Write `df` as parquet clustered on the Z-curve of `cols`: range-
    * partitioned into `files` tasks by z, sorted within each — so every
    * output file covers a narrow window of EVERY clustered column and
    * parquet min/max stats prune multi-dimensional box predicates. */
  def writeClustered(df: DataFrame, path: String, cols: Seq[String],
                     files: Int, bits: Int = 16): Unit = {
    val z = withZValue(df, cols, bits = bits)
    z.repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file (min, max) window of `c` over a written dataset — the
    * skipping diagnostic: a predicate `c = v` must read only files whose
    * window contains v. */
  def fileWindows(df: DataFrame, c: String): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(min(col(c)).as("lo"), max(col(c)).as("hi"),
        count(lit(1)).as("rows"))
}

/**
 * Morton bit-interleave of `children` int ranks, each in [0, 2^bits):
 * result bit j·dims+i takes bit j of child i. Null if any child is null
 * (null ranks have no place on the curve — filter or default first).
 */
case class ZOrderExpr(children: Seq[Expression], bits: Int)
    extends Expression {
  require(children.nonEmpty && children.size <= 4, "z-order takes 1..4 dims")
  require(bits > 0 && bits * children.size <= 62, s"bits=$bits overflows")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (children.forall(_.dataType == IntegerType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"emo_zorder expects int ranks, got ${children.map(_.dataType).mkString(", ")}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "emo_zorder"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    var i = 0
    val dims = children.size
    var z = 0L
    while (i < dims) {
      val v = children(i).eval(input)
      if (v == null) return null
      z |= ZOrderExpr.spread(v.asInstanceOf[Int].toLong & ((1L << bits) - 1), dims, i)
      i += 1
    }
    z
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val evals = children.map(_.genCode(ctx))
    val dims = children.size
    val mask = (1L << bits) - 1
    val parts = evals.zipWithIndex.map { case (e, i) =>
      s"graft.pipeline.ZOrderExpr.spread(((long) ${e.value}) & ${mask}L, $dims, $i)"
    }.mkString(" | ")
    val nullChecks =
      if (nullable) evals.map(e => e.isNull.toString).mkString(" || ")
      else "false"
    val childCode = evals.map(_.code).reduce((a, b) =>
      code"""$a
$b""")
    ev.copy(code =
      code"""
$childCode
boolean ${ev.isNull} = $nullChecks;
long ${ev.value} = 0L;
if (!${ev.isNull}) {
  ${ev.value} = $parts;
}
""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

object ZOrderExpr {
  /** Spread `v`'s bits every `dims` positions, offset `i` (shared by
    * interpreted eval and generated code). */
  def spread(v: Long, dims: Int, i: Int): Long = {
    var z = 0L
    var j = 0
    var rest = v
    while (rest != 0L) {
      if ((rest & 1L) != 0L) z |= 1L << (j * dims + i)
      rest >>>= 1
      j += 1
    }
    z
  }
}
