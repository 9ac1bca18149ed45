package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/**
 * Sequence packing for LLM pretraining: concatenate documents in a stable
 * global order and cut the token stream every `budget` tokens
 * ("concat-then-chunk", the packing GPT-style training loaders apply). A
 * document is assigned to the chunk containing its FIRST token, so the
 * assignment is a pure function of the global token prefix sum.
 *
 * The prefix sum is a distributed two-phase scan: range-partition by the
 * order key, per-partition token totals (ONE collect of numPartitions
 * longs), then a per-partition running sum seeded with the exclusive
 * partition offset. A plain `Window.orderBy(id)` cumsum would funnel the
 * whole table through one reducer — the classic prefix-sum scale trap this
 * module exists to avoid. The per-partition pass is genuine imperative
 * per-partition logic, the one place the RDD escape hatch is the right
 * tool.
 */
object Packing {

  /** Adds `start_offset`: the exclusive global prefix sum of `tokensCol`
    * in `idCol` order. Output columns: idCol, tokensCol (long),
    * start_offset. */
  def withStartOffsets(df: DataFrame, idCol: String, tokensCol: String,
                       numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val p = if (numPartitions > 0) numPartitions
            else spark.sessionState.conf.numShufflePartitions
    // persist AFTER the range exchange + sort: both scan phases must see
    // byte-identical partitions (range boundaries come from sampling, so
    // re-execution is not guaranteed to reproduce them)
    val parted = df.select(col(idCol),
        coalesce(col(tokensCol).cast("long"), lit(0L)).as(tokensCol))
      .repartitionByRange(p, col(idCol))
      .sortWithinPartitions(col(idCol))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // phase 1: per-partition totals — numPartitions rows to the driver
    val totals = parted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L
      it.foreach(r => s += r.getLong(1))
      Iterator((pid, s))
    }.collect().toMap
    val offsets = (0 until p).scanLeft(0L) { (acc, pid) =>
      acc + totals.getOrElse(pid, 0L)
    }.toArray
    val bOffsets = spark.sparkContext.broadcast(offsets)
    // phase 2: running sum per partition seeded with the exclusive offset
    val outSchema = StructType(
      parted.schema.fields :+ StructField("start_offset", LongType, nullable = false))
    val rows = parted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = bOffsets.value(pid)
      it.map { r =>
        val out = Row.fromSeq(r.toSeq :+ acc)
        acc += r.getLong(1)
        out
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  /** Chunk assignment: adds `seq_id` = floor(start_offset / budget). */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
                    budget: Long, numPartitions: Int = 0): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    withStartOffsets(df, idCol, tokensCol, numPartitions)
      .withColumn("seq_id", floor(col("start_offset") / budget))
  }

  /** Per-sequence packing stats: (seq_id, n_docs, n_tokens). n_tokens can
    * exceed `budget` only via the one document straddling the chunk edge. */
  def sequenceStats(df: DataFrame, idCol: String, tokensCol: String,
                    budget: Long, numPartitions: Int = 0): DataFrame =
    packSequences(df, idCol, tokensCol, budget, numPartitions)
      .groupBy("seq_id")
      .agg(count(lit(1)).as("n_docs"), sum(col(tokensCol)).as("n_tokens"))
}
