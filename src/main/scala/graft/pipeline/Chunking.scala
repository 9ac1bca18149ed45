package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Within-document chunking for LLM training and retrieval: split a long
 * document into overlapping token windows (max-sequence-length truncation
 * with stride, the scheme HF tokenizers call `return_overflowing_tokens` +
 * `stride`, and RAG indexers call sliding-window chunking).
 *
 * Distinct from [[Packing]]: packing concatenates SHORT documents into
 * fixed budgets across document boundaries; chunking cuts LONG documents
 * into windows within a single document. A real pretraining pipeline runs
 * chunking first (bound every doc by the context length), packing second.
 *
 * Scale shape: pure per-row column expressions (split → sequence → filter
 * → posexplode → slice) — scan-local, zero shuffles, stays inside
 * whole-stage codegen. Output size is input tokens × (size/stride)
 * amplification, linear in the corpus; no state, no driver collect.
 *
 * Window rule (pinned so the DuckDB oracle can reproduce it): starts are
 * multiples of `stride`; a start `s > 0` is emitted only while the
 * PREVIOUS window did not already reach the end of the document
 * (`s - stride + size < n`). This drops trailing windows that would be
 * pure suffixes of their predecessor, and guarantees every token appears
 * in at least one window (full coverage, property-tested).
 */
object Chunking {

  /** Whitespace tokens, case-preserving (chunk text must round-trip). */
  def rawTokens(textCol: Column): Column = split(trim(textCol), "\\s+")

  /** Token-window starts for a doc of `n` tokens: 0, stride, 2·stride, …
    * while the previous window falls short of the end. */
  private def starts(n: Column, size: Int, stride: Int): Column =
    filter(
      sequence(lit(0), greatest(n - 1, lit(0)), lit(stride)),
      s => (s === 0) || (s - stride + size < n))

  /**
   * Explode each document into overlapping token windows.
   *
   * Output: all input columns except `textCol`, plus
   *   chunk_idx    int    0-based window ordinal within the doc
   *   start_token  int    first token index (0-based) of the window
   *   chunk_tokens int    tokens in this window (≤ size; last may be short)
   *   chunk_text   string the window's tokens re-joined with single spaces
   *
   * `size` is the window length in whitespace tokens, `stride` the step
   * between window starts (overlap = size − stride). `stride == size`
   * gives disjoint windows. Empty / whitespace-only docs produce no rows.
   */
  def slidingWindows(df: DataFrame, idCol: String, textCol: String,
                     size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    val keep = df.columns.filterNot(_ == textCol).map(col)
    val toks = rawTokens(col(textCol))
    val n = size_(toks)
    df.where(length(trim(col(textCol))) > 0)
      .withColumn("_toks", toks)
      .withColumn("_n", n)
      .select(keep :+ col("_toks") :+ col("_n") :+
        posexplode(starts(col("_n"), size, stride)).as(Seq("chunk_idx", "start_token")): _*)
      .withColumn("chunk_tokens",
        least(lit(size), col("_n") - col("start_token")))
      .withColumn("chunk_text",
        concat_ws(" ", slice(col("_toks"), col("start_token") + 1, lit(size))))
      .drop("_toks", "_n")
  }

  // `size` the parameter shadows functions.size inside slidingWindows
  private def size_(c: Column): Column = org.apache.spark.sql.functions.size(c)
}
