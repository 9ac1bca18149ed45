package graft.tools

import graft.engine.DocStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Dev tool: stress the store-MAINTENANCE surface (OPTIMIZE + CDC MERGE) at
 * 100× sf0.1 — the 4 most expensive bench operators get the same scale
 * check CurationStress gives the content operators. Asserts the structural
 * contracts that must hold at 100 TB, not just the timings:
 *
 *  - OPTIMIZE on a deliberately fragmented store (unaligned 64-task write,
 *    the streaming-accretion layout): filesAfter ≈ Σ_dir max(1,
 *    ceil(dirBytes/target)) — the rewrite actually resizes by measured
 *    bytes (tolerance covers maxRecordsPerFile's avg-row-size estimate);
 *  - MERGE with a batch touching ~1% of directories: exactly the affected
 *    directories rewritten, every untouched directory BYTE-IDENTICAL
 *    (name+length+mtime), and runtime a small fraction of the full
 *    rewrite's — the freshness path must not degrade into an optimize.
 */
object StoreStress {
  def main(args: Array[String]): Unit = {
    val mult = if (args.nonEmpty) args(0).toInt else 100
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.1"
    val nTables = 7 // × 16 parts = 112 directories, so one dir ≈ 1% of dirs

    val docs0 = graft.engine.Tables.read(spark, sf, "documents")
      .select("doc_id", "text")
    val reps = spark.range(mult).withColumnRenamed("id", "rep")
    val docs = docs0.crossJoin(reps)
      .select((col("doc_id") * mult + col("rep")).as("did"), col("text"))
      .select(concat(lit("t"), pmod(col("did"), lit(nTables))).as("table"),
        col("did").cast("string").as("id"),
        lit(1L).as("version"), col("text").as("body"))
    val store = System.getProperty("java.io.tmpdir") + "/store_stress"
    val nRows = docs.count()

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    // ---------------------------------------------------------- fragment
    val (_, writeSecs) = timed {
      DocStore.writeFragmented(docs, store, tasks = 64)
    }
    println(f"STORE_STRESS fragment rows=$nRows secs=$writeSecs%.1f rows_per_sec=${nRows / writeSecs}%.0f")

    // ---------------------------------------------------------- optimize
    val target = 256L << 10 // small target so multi-file dirs are the norm
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def listFiles(): Seq[(String, Long, Long)] = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(store), true)
      val b = Seq.newBuilder[(String, Long, Long)]
      while (it.hasNext) {
        val f = it.next()
        if (!f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith("."))
          b += ((f.getPath.toString.stripPrefix(
            fs.makeQualified(new org.apache.hadoop.fs.Path(store)).toString),
            f.getLen, f.getModificationTime))
      }
      b.result()
    }
    // per-directory bytes for the expectation (dir = path minus file name)
    val perDir = listFiles().groupBy(f => f._1.take(f._1.lastIndexOf('/')))
      .view.mapValues(_.map(_._2).sum).toMap
    val expectedFiles = perDir.values.map(b => math.max(1L, (b + target - 1) / target)).sum
    val (st, optSecs) = timed { DocStore.optimize(spark, store, target) }
    println(f"STORE_STRESS optimize dirs=${st.dirs} files ${st.filesBefore} -> ${st.filesAfter} " +
      f"(expected ~$expectedFiles) secs=$optSecs%.1f rows_per_sec=${nRows / optSecs}%.0f")
    require(st.filesBefore > st.filesAfter * 5,
      s"fixture not fragmented enough to exercise optimize (${st.filesBefore} -> ${st.filesAfter})")
    // maxRecordsPerFile uses the store-wide avg row size, so skewed dirs
    // can split into one file more/fewer than the byte-exact expectation
    require(st.filesAfter >= expectedFiles * 6 / 10 &&
      st.filesAfter <= expectedFiles * 15 / 10 + st.dirs,
      s"optimize file sizing off: ${st.filesAfter} vs expected ~$expectedFiles")

    // ------------------------------------------------------------- merge
    // batch touches ONE (table, part) directory = ~1% of the 112 dirs:
    // version-bump half the ids and tombstone a tenth, all from one dir
    val part1 = DocStore.read(spark, store)
      .where(col("table") === "t0" && col(DocStore.PartCol) === 1)
      .select("table", "id", "version", "body")
    val changes = part1
      .withColumn("deleted", pmod(xxhash64(col("id")), lit(10L)) === 0L)
      .where(pmod(xxhash64(col("id")), lit(2L)) === 0L || col("deleted"))
      .withColumn("version", col("version") + 1L)
      .persist()
    val nChanges = changes.count()
    val before = listFiles()
    val (ms, mergeSecs) = timed { DocStore.merge(spark, store, changes) }
    val after = listFiles()
    println(f"STORE_STRESS merge dirs_rewritten=${ms.dirsRewritten} upserts=${ms.upserts} " +
      f"deletes=${ms.deletes} changes=$nChanges secs=$mergeSecs%.1f " +
      f"merge_vs_optimize=${mergeSecs / optSecs}%.2f")
    require(ms.dirsRewritten == 1, s"expected 1 rewritten dir, got ${ms.dirsRewritten}")
    // every file outside the affected directory is bit-untouched
    val affected = s"/table=t0/${DocStore.PartCol}=1/"
    val beforeUntouched = before.filterNot(_._1.startsWith(affected)).toSet
    val afterUntouched = after.filterNot(_._1.startsWith(affected)).toSet
    require(beforeUntouched == afterUntouched,
      s"untouched directories changed: ${(beforeUntouched diff afterUntouched).take(3)} / " +
        s"${(afterUntouched diff beforeUntouched).take(3)}")
    // the freshness path must cost a fraction of the full rewrite
    require(mergeSecs < optSecs,
      f"merge ($mergeSecs%.1fs) not cheaper than full optimize ($optSecs%.1fs)")
    println("STORE_STRESS all contracts hold")
    spark.stop()
  }
}
