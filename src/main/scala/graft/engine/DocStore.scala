package graft.engine

import graft.condition._
import graft.json.JLong
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/**
 * The partitioned resolved-document store — the storage layout of the
 * serving layer at scale (SURVEY §4.3 phase-2 item).
 *
 * The reference spreads each table over a fixed shard fan-out inside the
 * row key (RowKeyUtils.java:20-70, 16 shards for new tables) so scans
 * parallelize; the Spark-native analog is directory partitioning of the
 * resolved store by (table, part) where part = the condition DSL's
 * partition id, abs(murmur3_32(table ++ id)) % S + 1
 * (ConditionEvaluator.java:266-276). With that layout, two condition forms
 * map straight onto Catalyst partition pruning — no custom rule needed,
 * because the pruning predicates are ordinary filters on partition columns
 * and the parquet source turns them into PartitionFilters (verified in
 * EngineSpec by `.queryExecution.executedPlan` inspection):
 *
 *  - `intrinsic("~table":...)` -> a filter on the `table` partition column;
 *  - `partition(N:...)` with N dividing S -> `part IN (the S-partitions
 *    whose N-partition id satisfies the sub-condition)`.
 *
 * The pruning predicate is a sound WEAKENING of the full condition (rows
 * outside it cannot match); the exact condition is always applied on top,
 * so unprunable forms (NOT, body predicates, N not dividing S) stay
 * correct — they just scan more directories.
 *
 * At 100 TB: the store is the output of the streaming materializer or the
 * batch fold, rewritten periodically with compaction; S=16 directories per
 * table keeps file listing O(tables), and a scan for one partition of one
 * table reads 1/(16·|tables|) of the data.
 */
object DocStore {

  val PartCol = "part"

  /** Internal shuffle-salt column for slot-aligned writes; deliberately
    * namespaced so it cannot silently collide with (and overwrite) a
    * caller's data column — [[write]]/[[optimize]] assert its absence. */
  val SlotCol = "__graft_write_slot"

  /** Number of storage partitions per table (RowKeyUtils.java:21 fan-out). */
  val DefaultShards = 16

  /** Write resolved docs (DocRow columns) as the partitioned store.
    *
    * The shuffle is ALIGNED with the directory layout: rows repartition by
    * (table, part[, slot]) so each (table, part) directory receives AT MOST
    * `writeSlots` files no matter how the input was partitioned (hash
    * collisions in the shuffle-partition space or AQE coalescing can land
    * two slots of one directory in the same task, merging them — strictly
    * fewer files, never more) — an
    * unaligned write makes every upstream task open a writer per directory
    * it touches (P tasks × 16 parts = P·16 KB-sized files per table), and
    * every later listing/merge/scan pays for that fragmentation. Rows are
    * id-sorted within files so point-get / multiGet scans prune on parquet
    * min/max id stats — the same layout [[optimize]] restores after
    * streaming appends. `writeSlots` is the write-parallelism/file-size
    * knob: tasks = dirs × slots, bytes-per-file = dirBytes / slots; raise
    * it for huge tables (optimize later resizes by measured bytes). AQE
    * may coalesce slots of a SMALL directory back into one task — benign:
    * exactly the dirs that didn't need the extra files. */
  def write(docs: DataFrame, path: String, shards: Int = DefaultShards,
            writeSlots: Int = 1): Unit = {
    require(!docs.columns.contains(SlotCol),
      s"DocStore.write: input must not carry the internal column $SlotCol")
    val withPart = docs.withColumn(PartCol,
      expressions.emoPartition(col("table"), col("id"), shards))
    val aligned =
      if (writeSlots <= 1) withPart.repartition(col("table"), col(PartCol))
      else withPart
        .withColumn(SlotCol, pmod(xxhash64(col("id")), lit(writeSlots.toLong)))
        .repartition(col("table"), col(PartCol), col(SlotCol))
        .drop(SlotCol)
    aligned
      .sortWithinPartitions("table", PartCol, "id")
      .write
      .partitionBy("table", PartCol)
      .mode("overwrite")
      .parquet(path)
  }

  /** Write WITHOUT aligning the shuffle to the directory layout: `tasks`
    * writer tasks each open a file in every directory they touch — the
    * many-small-files accretion pattern a per-micro-batch streaming
    * materializer leaves behind. This is the fixture generator for the
    * maintenance path ([[optimize]] exists to repair exactly this layout);
    * production batch writes go through [[write]], which cannot fragment. */
  def writeFragmented(docs: DataFrame, path: String,
                      shards: Int = DefaultShards, tasks: Int = 8): Unit =
    docs
      .withColumn(PartCol, expressions.emoPartition(col("table"), col("id"), shards))
      .repartition(tasks)
      .write
      .partitionBy("table", PartCol)
      .mode("overwrite")
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Scan the store with a condition DSL predicate; partition/table forms
    * of the condition land on the partition columns => directory pruning.
    * When the pruning predicate is EXACT — the condition is built only of
    * table-intrinsic and partition() forms, which are pure functions of
    * the partition columns — the per-row condition re-filter is skipped
    * entirely: the directory selection already decides membership, and the
    * row-level partition-hash evaluation it replaces is the dominant
    * per-row cost of a pruned serving scan. */
  def scan(spark: SparkSession, path: String, conditionText: String,
           shards: Int = DefaultShards): DataFrame = {
    val df = read(spark, path)
    val cond = graft.delta.DslParser.parseCondition(conditionText)
    prunePredicateEx(cond, shards) match {
      case Some((p, true))  => df.where(p)
      case Some((p, false)) => df.where(p).where(EmoDocs.predicate(df, conditionText))
      case None             => df.where(EmoDocs.predicate(df, conditionText))
    }
  }

  /** Per-directory optimize report: files/bytes before and after. */
  case class OptimizeStats(dirs: Long, filesBefore: Long, filesAfter: Long,
                           bytes: Long)

  /** Root-relative directory key of an on-disk partition directory, with
    * Spark's partition-value escaping UNDONE ('%3A' -> ':') so it matches
    * the key [[optimize]] builds from the raw column values. Table names
    * cannot contain '%', so whole-string unescape cannot misfire. */
  private[graft] def storeDirKey(qualifiedDir: String, qualifiedRoot: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      .unescapePathName(qualifiedDir.stripPrefix(qualifiedRoot))

  /**
   * OPTIMIZE: small-file compaction of the partitioned store — the
   * maintenance pass every streaming-materialized lakehouse table needs.
   * The materializer appends a few rows per micro-batch, so a (table,
   * part) directory accretes thousands of KB-sized files; at 100 TB file
   * LISTING (one NameNode/object-store round trip per file) starts to
   * dominate scan setup, and per-file parquet footers defeat row-group
   * skipping. This rewrites each directory into
   * max(1, ceil(dirBytes/targetFileBytes)) files with rows ID-SORTED
   * within each file, so point-get/multiGet scans prune on parquet
   * min/max id stats.
   *
   * Scale shape: one shuffle keyed by (table, part, fileSlot) — the slot
   * salt caps per-task data at ~targetFileBytes so oversized directories
   * rewrite in parallel. The FILE split itself is enforced with
   * `maxRecordsPerFile` (target bytes / measured avg row bytes), which
   * holds under any task layout — AQE legitimately coalesces the tiny
   * shuffle partitions of a small store into few tasks, and file sizing
   * must not depend on that. The rewrite lands in a sibling temp dir and
   * swaps in via two FS renames (the swap window is two metadata ops,
   * not a data copy; readers between the renames retry — the same recipe
   * as the Stash `_LATEST` pointer flip). Content is layout-invariant
   * (spec-pinned identity).
   */
  def optimize(spark: SparkSession, path: String,
               targetFileBytes: Long = 128L << 20): OptimizeStats = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // per-directory (bytes, files) from one recursive listing
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(path), true)
    var filesBefore = 0L
    var totalBytes = 0L
    val dirBytes = scala.collection.mutable.Map.empty[String, Long]
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) {
        filesBefore += 1
        totalBytes += f.getLen
        val dir = storeDirKey(f.getPath.getParent.toString,
          fs.makeQualified(new org.apache.hadoop.fs.Path(path)).toString)
        dirBytes(dir) = dirBytes.getOrElse(dir, 0L) + f.getLen
      }
    }
    val slotsPerDir = dirBytes.map { case (d, b) =>
      d -> math.max(1L, (b + targetFileBytes - 1) / targetFileBytes)
    }
    val slotsLookup = typedLit(slotsPerDir.map { case (d, s) => (d, s) }.toMap)
    val df = read(spark, path)
    val dirKey = concat(lit("/table="), col("table"),
      lit(s"/$PartCol="), col(PartCol).cast(StringType))
    val slots = coalesce(element_at(slotsLookup, dirKey), lit(1L))
    val tmp = new org.apache.hadoop.fs.Path(path + ".optimize.tmp")
    val old = new org.apache.hadoop.fs.Path(path + ".optimize.old")
    // avg row bytes from parquet metadata (count() is footer-only) sizes
    // the per-file record cap
    val totalRows = df.count()
    val maxRecords =
      if (totalRows == 0L) Long.MaxValue
      else math.max(1L, (targetFileBytes.toDouble /
        math.max(1.0, totalBytes.toDouble / totalRows)).toLong)
    require(!df.columns.contains(SlotCol),
      s"DocStore.optimize: store must not carry the internal column $SlotCol")
    df.withColumn(SlotCol, pmod(xxhash64(col("id")), slots))
      .repartition(col("table"), col(PartCol), col(SlotCol))
      .sortWithinPartitions("table", PartCol, "id")
      .drop(SlotCol)
      .write.partitionBy("table", PartCol).mode("overwrite")
      .option("maxRecordsPerFile", maxRecords)
      .parquet(tmp.toString)
    // two-rename swap
    fs.delete(old, true)
    require(fs.rename(new org.apache.hadoop.fs.Path(path), old),
      s"optimize: could not move $path aside")
    require(fs.rename(tmp, new org.apache.hadoop.fs.Path(path)),
      s"optimize: could not install rewritten store (original at $old)")
    fs.delete(old, true)
    var filesAfter = 0L
    val it2 = fs.listFiles(new org.apache.hadoop.fs.Path(path), true)
    while (it2.hasNext) {
      val f = it2.next()
      if (!f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith("."))
        filesAfter += 1
    }
    OptimizeStats(dirBytes.size.toLong, filesBefore, filesAfter, totalBytes)
  }

  case class MergeStats(dirsRewritten: Long, upserts: Long, deletes: Long)

  /**
   * CDC MERGE: apply a batch of resolved-document changes (upserts +
   * tombstones) to the store by rewriting ONLY the affected (table, part)
   * directories — the incremental-materialization path that keeps a
   * 100 TB store fresh without the full rewrite [[optimize]] performs.
   * `changes` carries DocRow-shaped rows; rows with `deleted = true` are
   * tombstones (the document leaves the store), everything else replaces
   * the stored row with the same (table, id) — MERGE INTO ... WHEN
   * MATCHED UPDATE / NOT MATCHED INSERT / MATCHED AND deleted DELETE.
   *
   * Scale shape: the affected-directory list is parameter-sized (bounded
   * by tables × shards, NOT by |changes|); the store scan prunes to
   * affected directories via partition-column predicates (coarse IN
   * prune + exact pair semi-join), so untouched directories are never
   * read, let alone rewritten. Survivors anti-join the changes on
   * (table, id) — a shuffle bounded by the affected directories' data,
   * not the store. Rewritten directories land in a sibling tmp store and
   * swap in per-directory (rename per dir: each directory's flip is
   * atomic; cross-directory readers during the swap window see mixed
   * generations — same contract as the reference's eventually-consistent
   * multi-row reads).
   */
  def merge(spark: SparkSession, path: String, changes: DataFrame,
            shards: Int = DefaultShards): MergeStats = {
    val withPart = changes.withColumn(PartCol,
      expressions.emoPartition(col("table"), col("id"), shards))
    val dirs = withPart.select(col("table"), col(PartCol)).distinct()
      .collect().map(r => (r.getString(0), r.getInt(1)))
    require(dirs.nonEmpty, "merge: empty change batch")
    val tables = dirs.map(_._1).distinct.toSeq
    val parts = dirs.map(_._2).distinct.toSeq
    val store = read(spark, path)
    // coarse prune = partition-column IN lists (directory pruning);
    // the exact (table, part) pair filter rides on top scan-side
    val pairKeys = dirs.map { case (t, p) => s"$t/$p" }.toSet
    val current = store
      .where(col("table").isin(tables: _*) && col(PartCol).isin(parts: _*))
      .where(concat(col("table"), lit("/"), col(PartCol).cast(StringType))
        .isin(pairKeys.toSeq: _*))
    val survivors = current.join(withPart.select("table", "id"),
      Seq("table", "id"), "left_anti")
    val upserts = withPart.where(!col("deleted"))
    val merged = survivors.unionByName(
      upserts.select(survivors.columns.map(col).toIndexedSeq: _*))
    // count the batch BEFORE the swap: `changes` may itself read from the
    // store being merged (a counted-after lineage would re-read mutated
    // directories); one combined pass — the batch lineage can be expensive
    val statsRow = changes.agg(count(lit(1)).as("n"),
      coalesce(sum(when(col("deleted"), 1L).otherwise(0L)), lit(0L)).as("nd"))
      .head()
    val nDel = statsRow.getLong(1)
    val nUpsert = statsRow.getLong(0) - nDel
    val tmp = path + ".merge.tmp"
    merged.repartition(col("table"), col(PartCol))
      .sortWithinPartitions("table", PartCol, "id")
      .write.partitionBy("table", PartCol).mode("overwrite").parquet(tmp)
    // per-directory swap
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    dirs.foreach { case (t, p) =>
      // Spark escapes partition values in directory names (':' -> '%3A' —
      // legal in table names, e.g. the system table); the swap must
      // address the ESCAPED on-disk name or it would miss the real
      // directory (and a raw ':' in a relative Path is a URI parse error)
      val rel = s"table=${org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .escapePathName(t)}/$PartCol=$p"
      val dst = new org.apache.hadoop.fs.Path(path, rel)
      val src = new org.apache.hadoop.fs.Path(tmp, rel)
      fs.delete(dst, true)
      if (fs.exists(src)) { // a dir can empty out entirely (all deleted)
        fs.mkdirs(dst.getParent)
        require(fs.rename(src, dst), s"merge: could not install $rel")
      }
    }
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    MergeStats(dirs.length.toLong, nUpsert, nDel)
  }

  // ------------------------------------------------- snapshot generations

  /**
   * Versioned snapshot generations with a `_LATEST` pointer — time travel
   * and rollback for the resolved store (the parquet-side analog of the
   * Stash export's `_LATEST` flip, `common/stash/StashUtil` semantics).
   *
   * Layout: `root/v=N/` holds a complete store generation; `root/_LATEST`
   * holds the current version number. Publishing = write the new
   * generation fully, then flip the pointer (temp-file + rename: readers
   * see the old or the new generation, never a partial one). Rollback is
   * a pointer flip to an older live generation; vacuum deletes
   * generations past a retention count but never the pointed-at one.
   *
   * At 100 TB a full generation per snapshot is the BATCH cadence
   * (weekly Stash-style exports); the hourly freshness path is [[merge]]
   * against the latest generation — the two compose: merge mutates the
   * newest generation in place, snapshots pin the states training runs
   * need to reproduce.
   */
  object Snapshots {
    private def fsOf(spark: SparkSession, root: String) =
      new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)

    private def latestPath(root: String) =
      new org.apache.hadoop.fs.Path(root, "_LATEST")

    /** Versions present on disk (sorted ascending). */
    def versions(spark: SparkSession, root: String): Seq[Long] = {
      val fs = fsOf(spark, root)
      val p = new org.apache.hadoop.fs.Path(root)
      if (!fs.exists(p)) return Seq.empty
      fs.listStatus(p).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
        .map(_.getPath.getName.stripPrefix("v=").toLong).sorted
    }

    /** The `_LATEST`-pointed version, if published. */
    def latest(spark: SparkSession, root: String): Option[Long] = {
      val fs = fsOf(spark, root)
      if (!fs.exists(latestPath(root))) None
      else {
        val in = fs.open(latestPath(root))
        try Some(new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8).trim.toLong)
        finally in.close()
      }
    }

    private def flipPointer(spark: SparkSession, root: String, v: Long): Unit = {
      val fs = fsOf(spark, root)
      val tmp = new org.apache.hadoop.fs.Path(root, s"._LATEST.$v.tmp")
      val out = fs.create(tmp, true)
      try out.write(v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      fs.delete(latestPath(root), false)
      require(fs.rename(tmp, latestPath(root)), "snapshot: pointer flip failed")
    }

    /** Publish a new generation; returns its version number. */
    def write(docs: DataFrame, root: String,
              shards: Int = DefaultShards): Long = {
      val spark = docs.sparkSession
      val next = versions(spark, root).lastOption.getOrElse(0L) + 1L
      DocStore.write(docs, s"$root/v=$next", shards)
      flipPointer(spark, root, next)
      next
    }

    /** Read a generation (default: the `_LATEST`-pointed one). */
    def read(spark: SparkSession, root: String, version: Long = -1L): DataFrame = {
      val v = if (version >= 0) version
        else latest(spark, root).getOrElse(
          throw new IllegalStateException(s"no published snapshot under $root"))
      require(versions(spark, root).contains(v), s"snapshot v=$v not on disk")
      DocStore.read(spark, s"$root/v=$v")
    }

    /** Point `_LATEST` back at an older live generation. */
    def rollback(spark: SparkSession, root: String, to: Long): Unit = {
      require(versions(spark, root).contains(to), s"cannot roll back to absent v=$to")
      flipPointer(spark, root, to)
    }

    /** Delete generations beyond the newest `keep`, never the pointed-at
      * one; returns the versions removed. */
    def vacuum(spark: SparkSession, root: String, keep: Int): Seq[Long] = {
      require(keep >= 1, "vacuum must keep at least one generation")
      val fs = fsOf(spark, root)
      val all = versions(spark, root)
      val pinned = latest(spark, root)
      val drop = all.dropRight(keep).filterNot(pinned.contains)
      drop.foreach { v =>
        fs.delete(new org.apache.hadoop.fs.Path(root, s"v=$v"), true)
        ()
      }
      drop
    }
  }

  /** Write the store BUCKETED by document id (catalog table): repeated
    * joins and multiGets against a bucketed store are shuffle-free on the
    * store side — Spark matches the bucket hash partitioning instead of
    * exchanging, the single biggest shuffle saving for serving-layer joins
    * at 100 TB (verified no-ShuffleExchange in EngineSpec). The sortBy
    * gives within-bucket key order for efficient merge access. */
  def writeBucketed(docs: DataFrame, tableName: String,
                    buckets: Int = 64): Unit =
    docs.write
      .bucketBy(buckets, "id")
      .sortBy("id")
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(tableName)

  /** Sound weakening of `cond` onto the partition columns (None = no
    * pruning possible). Conjunctions prune on any prunable branch;
    * disjunctions need every branch prunable; negations never prune (the
    * negation of a weakening is not sound). */
  def prunePredicate(cond: Condition, shards: Int): Option[Column] =
    prunePredicateEx(cond, shards).map(_._1)

  /** [[prunePredicate]] plus an exactness flag: `true` means the pruning
    * predicate is EQUIVALENT to the condition (every pruned-in row
    * matches), not merely implied by it — table intrinsics and
    * partition() are pure functions of the partition columns, so a
    * condition composed only of those (under and/or) needs no row-level
    * re-check. A conjunction that drops unprunable branches is inexact by
    * construction; a disjunction must keep (and prove exact) every
    * branch. */
  def prunePredicateEx(cond: Condition, shards: Int): Option[(Column, Boolean)] = cond match {
    case ConstantCondition(false) => Some((lit(false), true))
    case PartitionCondition(n, sub) if n > 0 && shards % n == 0 =>
      // S-partition p maps to N-partition ((p-1) % N) + 1 when N | S:
      // both are (abs(hash) % k) + 1 over the same hash
      val keep = (1 to shards).filter { p =>
        ConditionEvaluator.eval(sub, JLong(((p - 1) % n) + 1L), null)
      }
      Some((col(PartCol).isin(keep: _*), true))
    case IntrinsicCondition(Intrinsic.Table, sub) =>
      // compiler rejection (UTF-8/UTF-16 order divergence) => skip pruning
      // for this branch (None) — the row-level condition still applies, so
      // the result stays exact, just unpruned
      try Some((ConditionCompiler.compileField(sub, col("table"), StringType), true))
      catch { case _: UnsupportedOperationException => None }
    case AndCondition(cs) =>
      val parts = cs.flatMap(prunePredicateEx(_, shards))
      if (parts.isEmpty) None
      else Some((parts.map(_._1).reduce(_ && _),
        parts.size == cs.size && parts.forall(_._2)))
    case OrCondition(cs) =>
      val parts = cs.map(prunePredicateEx(_, shards))
      if (parts.forall(_.isDefined))
        Some((parts.flatten.map(_._1).reduce(_ || _), parts.flatten.forall(_._2)))
      else None
    case _ => None
  }
}
