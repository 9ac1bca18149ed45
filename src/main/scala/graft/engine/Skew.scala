package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Hot-key spreading for skewed aggregations and joins. Spark's partial
 * (map-side) aggregation and AQE's skew-join splitting cover most cases;
 * explicit salting is the fallback when one key's PARTIALS still swamp a
 * single reducer (extreme row counts, or aggregation states too wide to
 * combine map-side) or when AQE is unavailable (e.g. some streaming plans).
 */
object Skew {

  /** Deterministic salt in [0, salt): hashed from the given columns (use a
    * unique id for even spread; never a constant). */
  def saltColumn(salt: Int, from: Column*): Column =
    pmod(xxhash64(from: _*), lit(salt))

  /** Two-phase salted aggregation: stage 1 groups by (keys, salt) so a hot
    * key spreads over `salt` reducers; stage 2 merges the partials by key.
    * `aggs` maps output name -> (column, fn) with fn in
    * sum/count/min/max (algebraic merges: count partials re-merge by sum).
    * Output columns: keyCols ++ aggs.keys. */
  def saltedAgg(df: DataFrame, keyCols: Seq[String], saltFrom: Seq[String],
                salt: Int, aggs: Seq[(String, (String, String))]): DataFrame = {
    require(salt > 0, s"salt must be positive: $salt")
    val mergeOf = Map("sum" -> "sum", "count" -> "sum", "min" -> "min", "max" -> "max")
    aggs.foreach { case (_, (_, f)) =>
      require(mergeOf.contains(f), s"unsupported aggregate: $f") }
    val salted = df.withColumn("__salt",
      saltColumn(salt, saltFrom.map(col): _*))
    val stage1 = salted
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(aggs.head._2 match { case (c, f) => expr(s"$f($c)").as(aggs.head._1) },
        aggs.tail.map { case (name, (c, f)) => expr(s"$f($c)").as(name) }: _*)
    stage1
      .groupBy(keyCols.map(col): _*)
      .agg(aggs.head match { case (name, (_, f)) =>
          expr(s"${mergeOf(f)}($name)").as(name) },
        aggs.tail.map { case (name, (_, f)) =>
          expr(s"${mergeOf(f)}($name)").as(name) }: _*)
  }

  /** Salted equi-join for a skewed left side: the left takes a
    * deterministic salt from `saltFrom`, the (smaller) right replicates
    * each row `salt` times, and the join key becomes (key, salt) — a hot
    * left key spreads over `salt` reducers instead of one. Prefer
    * `broadcast(right)` when the right side fits; this is for the
    * in-between regime (right too big to broadcast, left too skewed to
    * shuffle-join). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltFrom: Seq[String], salt: Int): DataFrame = {
    require(salt > 0, s"salt must be positive: $salt")
    val l = left.withColumn("__salt", saltColumn(salt, saltFrom.map(col): _*))
    // right × {0..salt-1}: each right row must meet every possible salt
    val rReplicated = right.crossJoin(
      right.sparkSession.range(salt).withColumnRenamed("id", "__salt"))
    l.join(rReplicated, Seq(key, "__salt")).drop("__salt")
  }
}
