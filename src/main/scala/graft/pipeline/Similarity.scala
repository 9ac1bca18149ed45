package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (array<float>), for training-data curation at scale.
 *
 *  - bruteForceTopK: exact cosine top-k via a join + window rank. The
 *    baseline and the verifier. O(Q*N) — fine when one side is small or
 *    broadcastable.
 *  - lshTopK: the scale path — random-hyperplane LSH buckets (sign sketch,
 *    same family as SimHash) so only vectors sharing a bucket are compared.
 *    With b bands of w bits, recall is tunable; candidate generation is an
 *    equi-join on bucket keys — no cross join ever materializes.
 *
 * All arithmetic in double precision via codegen'd higher-order functions
 * (zip_with + aggregate); no UDFs.
 */
object Similarity {

  /** Cosine similarity of two array<float/double> columns, computed in
    * double, summing in index order (deterministic). A zero-norm vector
    * (a failed/empty embedder output — they happen in large corpora)
    * scores 0.0 against anything: the unguarded division is a
    * DIVIDE_BY_ZERO error under ANSI (Spark 4 default) and would abort
    * the whole job on one bad row. */
  def cosine(a: Column, b: Column): Column =
    // single-pass expression, bit-identical to the zip_with/aggregate
    // formulation (see CosineSimExpr): one loop per row instead of three
    // interpreted higher-order-function traversals + an intermediate array
    sketches.cosineSim(a, b)

  /** Scale-safe per-query top-k rank. A plain
    * `Window.partitionBy(query)` funnels every corpus row for a query
    * through ONE reducer — a corpus-sized sort per query at scale — and
    * even a (query, partition) pre-rank window still EXCHANGES the whole
    * scored stream once to group it. Instead phase 1 is a shuffle-free
    * bounded selection: a size-`k` worst-first heap per query inside each
    * arriving partition (mapPartitions — genuine per-partition imperative
    * state, the documented last-resort case), so nothing leaves the scan
    * stage except <= k rows per (query, partition). The global rank then
    * windows only the k × numPartitions survivors. The result is invariant
    * (any global top-k row is top-k of its own partition); ties break by
    * `tieCol` asc in both phases so the output is deterministic under any
    * partitioning. Per-partition memory is (#queries seen × k) rows —
    * bounded by the same "queries are the small side" budget that lets the
    * ANN paths collect/broadcast the query set.
    * Adds a `rank` column and filters to rank <= k. */
  private[pipeline] def rankTopKPerQuery(df: DataFrame, queryCol: String,
                                         scoreCol: String, tieCol: String,
                                         k: Int): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    val schema = df.schema
    val qi = schema.fieldIndex(queryCol)
    val si = schema.fieldIndex(scoreCol)
    val ti = schema.fieldIndex(tieCol)
    // worst-first so the heap head is the eviction candidate: lowest score
    // first, and among equal scores the LARGEST tie value (so the kept set
    // prefers small tie values, matching the (score desc, tie asc) rank).
    // Null-safe: a null tie sorts SMALLEST (matching Spark's asc
    // nulls-first in the phase-2 window) instead of NPE-ing the comparator
    val worstFirst = new java.util.Comparator[Row] with Serializable {
      private def cmpTie(a: Any, b: Any): Int =
        if (a == null && b == null) 0
        else if (a == null) -1
        else if (b == null) 1
        else a.asInstanceOf[Comparable[Any]].compareTo(b)
      def compare(a: Row, b: Row): Int = {
        val c = java.lang.Double.compare(a.getDouble(si), b.getDouble(si))
        if (c != 0) c else cmpTie(b.get(ti), a.get(ti))
      }
    }
    val survivors = df.mapPartitions { it =>
      val heaps = new java.util.HashMap[Any, java.util.PriorityQueue[Row]]()
      it.foreach { r =>
        // a null score is non-rankable (a null embedding or ragged dims
        // upstream makes cosine null): skip the row rather than NPE in
        // getDouble — parity with the phase-2 rank, which would push
        // nulls past every real score anyway
        if (!r.isNullAt(si)) {
          val h = heaps.computeIfAbsent(r.get(qi),
            _ => new java.util.PriorityQueue[Row](k + 1, worstFirst))
          h.add(r)
          if (h.size > k) h.poll()
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values.asScala.iterator.flatMap(_.iterator().asScala)
    }(Encoders.row(schema))
    val w = Window.partitionBy(col(queryCol))
      .orderBy(col(scoreCol).desc, col(tieCol).asc)
    survivors.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Exact top-k cosine neighbors of each query vector.
    * Returns (queryIdCol, rank, neighbor id, score). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int, broadcastQueries: Boolean = true): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val qSide = if (broadcastQueries) broadcast(q) else q
    val scored = c.join(qSide, col("query_id") =!= col("neighbor_id"))
      .withColumn("score", cosine(col("qv"), col("cv")))
      .select("query_id", "neighbor_id", "score")
    rankTopKPerQuery(scored, "query_id", "score", "neighbor_id", k)
      .select("query_id", "rank", "neighbor_id", "score")
  }

  /**
   * Hard-negative mining for contrastive training (the DPR / SimCSE
   * retrieval recipe): per query, the top-k most similar corpus vectors
   * whose cosine falls in `[minSim, maxSim]` — below `maxSim` to exclude
   * positives/near-duplicates (which would poison the negative set), above
   * `minSim` to exclude easy negatives the model already separates.
   *
   * Output: (query_id, rank, neighbor_id) ranked by cosine desc within the
   * band, ties to the smaller neighbor id.
   *
   * Scale shape: identical to [[bruteForceTopK]] — queries broadcast, the
   * similarity band filters candidates scan-side BEFORE the bounded
   * per-partition heaps, so the rank stage sees at most k × partitions
   * rows per query and no corpus-sized partition exists. An LSH/IVF
   * candidate generator can replace the scan when queries stop being
   * broadcast-sized.
   */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, k: Int, minSim: Double = 0.0,
                    maxSim: Double = 0.95): DataFrame = {
    require(minSim <= maxSim, s"need minSim <= maxSim: $minSim > $maxSim")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("score", cosine(col("qv"), col("cv")))
      .where(col("score") >= minSim && col("score") <= maxSim)
      .select("query_id", "neighbor_id", "score")
    rankTopKPerQuery(scored, "query_id", "score", "neighbor_id", k)
      .select("query_id", "rank", "neighbor_id")
  }

  /** Deterministic pseudo-random hyperplane component for (plane p, dim i):
    * a fixed hash mapped to [-1, 1). Shared by all rows — equivalent to a
    * broadcast random matrix without needing an RNG at plan time. */
  private def planeComponent(p: Int, i: Column): Column =
    (pmod(xxhash64(concat_ws(":", lit("plane"), lit(p), i)), lit(1000003L))
      .cast("double") / 500001.5) - 1.0

  /** Sign-sketch bucket keys: `planes` hyperplane signs grouped into one
    * long key. Vectors in the same bucket are ANN candidates. */
  def lshBucket(vecCol: Column, planes: Int): Column = {
    val dims = size(vecCol)
    val bits = (0 until planes).map { p =>
      val idxs = sequence(lit(0), dims - 1)
      val dot = aggregate(
        zip_with(vecCol, idxs, (v, i) => v.cast("double") * planeComponent(p, i)),
        lit(0.0), (acc, v) => acc + v)
      when(dot >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** ANN top-k via LSH buckets with `bands` independent sketches: compare
    * only within matching buckets, union candidates, exact-rank them.
    * Bucket keys come from the single-pass [[sketches.hyperplaneSketch]]
    * expression (same keys as the builtin [[lshBucketBand]] formulation).
    *
    * Scale shape (same as [[knnGraph]]/[[embeddingNearDuplicates]]): ids
    * ONLY travel through the band join and the candidate distinct —
    * vectors are the wide payload (~kBs each at 384+ dims), so they
    * re-join by id after dedup instead of riding every candidate pair
    * through the exchange. Corpus buckets above `maxBucketSize` are
    * skipped (a degenerate bucket of B rows contributes B candidates per
    * query per band — oversized buckets are duplicate CLUSTERS, handled
    * by cluster assignment, not pairwise scoring). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, planes: Int = 12, bands: Int = 4,
              maxBucketSize: Int = 1000): DataFrame = {
    def bucketed(df: DataFrame, idAs: String): DataFrame = {
      df.select(col(idCol).as(idAs),
          posexplode(sketches.hyperplaneSketch(col(vecCol), planes, bands)))
        .withColumnRenamed("pos", "band")
        .withColumnRenamed("col", "bucket")
    }
    val c = bucketed(corpus, "neighbor_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) // session-cached (see Dedup band table): size agg + band join
    val sized = c.groupBy("band", "bucket").agg(count(lit(1)).as("bucket_n"))
    val capped = c.join(
      sized.where(col("bucket_n") <= maxBucketSize).select("band", "bucket"),
      Seq("band", "bucket"), "left_semi")
    val q = bucketed(queries, "query_id")
    val idPairs = capped.join(q, Seq("band", "bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
      .distinct()
    val scored = idPairs
      .join(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")),
        Seq("query_id"))
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")),
        Seq("neighbor_id"))
      .withColumn("score", cosine(col("qv"), col("cv")))
      .select("query_id", "neighbor_id", "score")
    rankTopKPerQuery(scored, "query_id", "score", "neighbor_id", k)
      .select("query_id", "rank", "neighbor_id", "score")
  }

  /** Approximate k-NN GRAPH: every corpus row gets its k nearest
    * neighbors (the input to graph-based curation — connected-component
    * dedup over similarity edges, graph diversity sampling). Candidates
    * come from the LSH bucket self-join (ids-only through the shuffle,
    * vectors re-join by id); because every row is a query here (the
    * unbounded-Q case [[rankTopKPerQuery]]'s contract warns about), the
    * rank is a plain window — Spark's WindowGroupLimit pushes a
    * spillable partial top-k below the single query-keyed exchange.
    * Returns (id, rank, neighbor_id, score); rows whose buckets yield no
    * candidates are absent (isolated points have no edges). */
  def knnGraph(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
               planes: Int = 12, bands: Int = 4,
               maxBucketSize: Int = 1000): DataFrame = {
    val base = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val bucketed = base.select(col("id"),
        posexplode(sketches.hyperplaneSketch(col("vec"), planes, bands)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) // session-cached, see Dedup band table
    val sized = bucketed.groupBy("band", "bucket").agg(count(lit(1)).as("n"))
    val capped = bucketed.join(
      sized.where(col("n") <= maxBucketSize).select("band", "bucket"),
      Seq("band", "bucket"), "left_semi")
    val idPairs = capped.as("l").join(capped.as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
        col("l.id") =!= col("r.id"))
      .select(col("l.id").as("query_id"), col("r.id").as("neighbor_id"))
      .distinct()
    val scored = idPairs
      .join(base.select(col("id").as("query_id"), col("vec").as("qv")), "query_id")
      .join(base.select(col("id").as("neighbor_id"), col("vec").as("cv")), "neighbor_id")
      .withColumn("score", cosine(col("qv"), col("cv")))
      .select("query_id", "neighbor_id", "score")
    // Q = N here ("every row is a query"), which breaks
    // [[rankTopKPerQuery]]'s small-Q heap contract: per-partition heap
    // maps would retain up to a whole partition's rows as JVM objects, and
    // the grouped variant (repartition(query_id) first) pays a full-stream
    // exchange just to bound them. The plain rank window is the better
    // plan in this regime — Catalyst plans it as Sort +
    // WindowGroupLimit(Partial) BELOW the shuffle (a spillable,
    // codegen'd streaming top-k that sends only <= k rows per
    // (query, partition) into the exchange), then WindowGroupLimit(Final)
    // + Window above it: exactly one query-keyed exchange, Tungsten rows
    // throughout, no heap-map state. Spec-pinned in CurationOpsSpec (one
    // hashpartitioning(query_id) exchange, partial group-limit below it).
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("query_id").as("id"), col("rank"), col("neighbor_id"), col("score"))
  }

  /** Embedding-cosine near-duplicate pairs (id1 < id2) with similarity >=
    * threshold — the embedding-space dedup mode.
    *
    * Path selection is automatic and scale-safe by default: inputs above
    * `allPairsMaxRows` go through LSH pre-bucketing (candidates restricted
    * to vectors sharing a hyperplane-sketch bucket — an equi-join, never a
    * cross join); tiny inputs use the exact all-pairs comparison, which is
    * also the verifier for the bucketed path in tests. Pass
    * `preBucket=Some(b)` to force a path. */
  def embeddingNearDuplicates(df: DataFrame, idCol: String, vecCol: String,
                              threshold: Double, preBucket: Option[Boolean] = None,
                              planes: Int = 16, bands: Int = 8,
                              allPairsMaxRows: Long = 10000L,
                              maxBucketSize: Int = 1000): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
    // one cheap count action beats planning an O(N^2) join on a large input;
    // at corpus scale the caller knows the answer and forces the path
    val bucketed0 = preBucket.getOrElse(base.count() > allPairsMaxRows)
    val pairs =
      if (!bucketed0) {
        base.as("l").join(base.as("r"), col("l.id") < col("r.id"))
          .select(col("l.id").as("id1"), col("r.id").as("id2"),
            col("l.vec").as("v1"), col("r.vec").as("v2"))
      } else {
        // ids only through the band join and the distinct: vectors are the
        // wide payload, so candidate dedup shuffles bare (id1, id2) pairs
        // and the vectors re-join by id afterwards (two hash joins on the
        // id key — cheap at any scale, vs shuffling vector pairs)
        val bucketed = base.select(col("id"),
            posexplode(sketches.hyperplaneSketch(col("vec"), planes, bands)))
          .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) // session-cached, see Dedup band table
        // cap degenerate buckets (same guard as the minhash/simhash paths):
        // a bucket of B near-identical vectors contributes B^2/2 pairs;
        // oversized buckets are duplicate CLUSTERS — handle them by cluster
        // assignment (all members mutually near-dup), not pairwise
        val sized = bucketed.groupBy("band", "bucket")
          .agg(count(lit(1)).as("bucket_n"))
        val capped = bucketed.join(
          sized.where(col("bucket_n") <= maxBucketSize).select("band", "bucket"),
          Seq("band", "bucket"), "left_semi")
        val idPairs = capped.as("l").join(capped.as("r"),
            col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
            col("l.id") < col("r.id"))
          .select(col("l.id").as("id1"), col("r.id").as("id2"))
          .distinct()
        idPairs
          .join(base.select(col("id").as("id1"), col("vec").as("v1")), Seq("id1"))
          .join(base.select(col("id").as("id2"), col("vec").as("v2")), Seq("id2"))
      }
    pairs.withColumn("cosine", cosine(col("v1"), col("v2")))
      .where(col("cosine") >= threshold)
      .select("id1", "id2", "cosine")
  }

  /**
   * IVF (inverted-file) ANN index — the classic coarse-quantizer scale path:
   * deterministic centroid selection (hash-sampled corpus points refined by
   * `iters` Lloyd steps), assignment of every vector to its nearest
   * centroid, and search probing only the `nProbe` closest cells per query.
   * All stages are DataFrame ops; centroids are collected (they are tiny:
   * nCells vectors) and broadcast into the assignment expression.
   */
  /** `nCells <= 0` sizes the cell count as ceil(sqrt(N)) (bounded to
    * [16, 65536]) — the standard IVF rule that keeps BOTH the centroid
    * table (driver/broadcast side) and the per-cell candidate lists
    * growing as sqrt of the corpus, so neither side becomes the
    * bottleneck as N scales. */
  def ivfBuild(corpus: DataFrame, idCol: String, vecCol: String,
               nCells: Int, iters: Int = 2): (Seq[Seq[Double]], DataFrame) = {
    val base = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val cells =
      if (nCells > 0) nCells
      else math.min(65536, math.max(16, math.ceil(math.sqrt(base.count().toDouble)).toInt))
    // deterministic seed centroids: the nCells corpus rows with smallest id-hash
    var centroids: Seq[Seq[Double]] = seedPool(base, cells).map(_.toSeq).toSeq
    centroids = lloydRefine(base, centroids, iters)
    val index = base.withColumn("cell", nearestCentroid(col("vec"), centroids))
    (centroids, index)
  }

  /** Exact Lloyd refinement passes over driver-held centroids (shared by
    * [[ivfBuild]] and [[kmeans]]): assign every row to its max-cosine
    * centroid, recompute per-centroid dimension means, repeat. Decimal
    * accumulation — exact and associative, so the mean (and hence every
    * centroid) is identical under ANY partitioning; double `avg` wobbles
    * with float summation order across hosts. Empty cells keep their old
    * centroid. One scan + one (cell, pos)-keyed aggregate per iteration;
    * driver state is k × dims doubles. */
  private def lloydRefine(base: DataFrame, seeds: Seq[Seq[Double]],
                          iters: Int): Seq[Seq[Double]] = {
    var centroids = seeds
    var it = 0
    while (it < iters) {
      val assigned = base.withColumn("cell", nearestCentroid(col("vec"), centroids))
      // one-pass exact per-cell means (no posexplode, no N×dims shuffle, no
      // second collect_list aggregate): same decimal(38,15) cast-and-sum,
      // division in Catalyst — bit-identical means (see VecDimStatsAgg).
      // Null embeddings get cell = null (nearestCells is null-safe); the
      // posexplode formulation silently dropped them, so drop the null-cell
      // group here too rather than NPE-ing on getInt of a null key
      val means = assigned
        .where(col("cell").isNotNull)
        .groupBy("cell").agg(sketches.vecDimStats(col("vec")).as("st"))
        .select(col("cell"), sketches.vecDimMeans(col("st")).as("centroid"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toMap
      // a cell whose members all have EMPTY vectors yields a present-but-
      // empty (or short) means entry; keep the old centroid in that case —
      // the posexplode formulation produced a missing key there, and an
      // empty centroid would poison nearestCells on the next iteration
      centroids = centroids.indices.map { i =>
        means.get(i).filter(_.length == centroids(i).length).getOrElse(centroids(i))
      }
      it += 1
    }
    centroids
  }

  /**
   * Lloyd k-means over an embedding column — the data-map / corpus-atlas
   * clustering operator (topic balance audits, per-cluster quality
   * profiles, SemDeDup cell structure exposed as a first-class result).
   * Deterministic end-to-end: farthest-point (Gonzalez) seeding over a
   * hash-sampled candidate pool — on separated data this guarantees one
   * seed per natural cluster, unlike [[ivfBuild]]'s raw hash seeding,
   * which may double-seed a cluster (IVF keeps hash seeding because its
   * k can reach 65536, where O(pool × k) driver seeding is real money; a
   * data map's k is tens-to-hundreds) — then decimal-exact Lloyd means
   * (partitioning-invariant) and max-cosine assignment.
   *
   * Returns (centroids, assignments (id, vec, cluster)). Scale shape:
   * centroids are parameter-sized driver state (k × dims); each
   * iteration is one scan + one (cell, pos)-keyed map-side-combinable
   * aggregate; assignment is a single scan-local expression pass.
   */
  def kmeans(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
             iters: Int = 2, seedSample: Int = 8): (Seq[Seq[Double]], DataFrame) = {
    val base = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val pool = seedPool(base, math.max(k, seedSample * k))
    require(pool.length >= k, s"kmeans: ${pool.length} rows < k=$k")
    val seeds = farthestPointSeeds(pool, k).map(_.toSeq).toSeq
    val centroids = lloydRefine(base, seeds, iters)
    (centroids, base.withColumn("cluster", nearestCentroid(col("vec"), centroids)))
  }

  /** Column: index of the nearest centroid (max cosine) for a vector —
    * single-pass expression, no literal-per-centroid codegen blowup. */
  private def nearestCentroid(vec: Column, centroids: Seq[Seq[Double]]): Column =
    sketches.nearestCells(vec, centroids, 1).getItem(0)

  /** IVF search: probe the nProbe nearest cells per query, exact-rank within. */
  def ivfTopK(centroids: Seq[Seq[Double]], index: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int, nProbe: Int = 2): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val probed = q
      .select(col("query_id"), col("qv"),
        explode(sketches.nearestCells(col("qv"), centroids, nProbe)).as("cell"))
    val scored = probed.join(index, Seq("cell"))
      .where(col("query_id") =!= col("id"))
      .withColumn("score", cosine(col("qv"), col("vec")))
      .select(col("query_id"), col("id").as("neighbor_id"), col("score"))
    rankTopKPerQuery(scored, "query_id", "score", "neighbor_id", k)
      .select("query_id", "rank", "neighbor_id", "score")
  }

  /**
   * Product-quantization codebook training (Jégou et al., TPAMI 2011 — the
   * standard billion-scale ANN compression): the D-dim space is split into
   * `m` equal coordinate blocks and each block gets its own `k`-centroid
   * codebook trained by Lloyd steps.
   *
   * Deterministic throughout, under ANY partitioning:
   *  - seeds: `seedSample*k` hash-sampled rows are collected (tiny — driver
   *    state is seedSample*k vectors) and each subspace picks k seeds by
   *    farthest-point traversal (Gonzalez 1985 k-center init) — spread-out
   *    seeds, no RNG, no dependence on row order;
   *  - Lloyd means accumulate in decimal (exact, associative), so float
   *    summation order across partitions cannot wobble the centroids.
   * Each Lloyd step is one distributed pass — encode via
   * [[sketches.pqEncode]] then per-(subspace, code, dim) means. Collected
   * state is m*k*subDim doubles (tiny); the corpus is never collected.
   *
   * Quality knobs: `iters` (Lloyd steps; 2 suffices for planted-copy
   * exactness, 3-4 lift natural-corpus recall) and `seedSample` (seed
   * candidate pool multiplier for the farthest-point init).
   */
  def pqTrain(corpus: DataFrame, idCol: String, vecCol: String,
              m: Int = 8, k: Int = 16, iters: Int = 2,
              seedSample: Int = 8): Seq[Seq[Seq[Double]]] = {
    val base = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
    // candidate seed pool: the seedSample*k smallest-id-hash rows; dims come
    // from the pool itself (one collected action instead of a separate
    // head() job — the pool is non-empty whenever the corpus is)
    val pool = seedPool(base, math.max(k, seedSample * k))
    pqTrainFromPool(base, pool, m, k, iters)
  }

  /** [[pqTrain]] body over an already-collected seed pool — shared with the
    * fused builds below so the pool collect happens once per query. The
    * pool must be (a prefix-extension of) `seedPool(base, max(k,
    * seedSample*k))`; farthest-point seeding and the Lloyd passes are
    * unchanged, so codebooks are bit-identical to the unfused path. */
  private def pqTrainFromPool(base: DataFrame, pool: Array[Array[Double]],
                              m: Int, k: Int, iters: Int): Seq[Seq[Seq[Double]]] = {
    require(pool.nonEmpty, "pqTrain: empty corpus")
    val dims = pool.head.length
    require(dims % m == 0, s"vector dims $dims not divisible by m=$m subspaces")
    val subDim = dims / m
    var books: Seq[Seq[Seq[Double]]] = (0 until m).map { s =>
      val blocks = pool.map(v => v.slice(s * subDim, (s + 1) * subDim))
      farthestPointSeeds(blocks, k).map(_.toSeq).toSeq
    }
    var it = 0
    while (it < iters) {
      // one pass: explode SUBSPACES only (m rows per vec, not dims), slice
      // the block, and take exact per-dimension sums in one aggregate — the
      // same decimal(38,15) cast-and-sum per element as the previous
      // (sub, code, d)-keyed posexplode formulation (exact arithmetic makes
      // the grouping order irrelevant), division in Catalyst: bit-identical
      // codebooks (see VecDimStatsAgg)
      val assigned = base.withColumn("codes", sketches.pqEncode(col("vec"), books))
      val means = assigned
        .select(posexplode(col("codes")).as(Seq("sub", "code")), col("vec"))
        .select(col("sub"), col("code"),
          slice(col("vec"), col("sub") * subDim + 1, lit(subDim)).as("block"))
        .groupBy("sub", "code")
        .agg(sketches.vecDimStats(col("block")).as("st"))
        .select(col("sub"), col("code"), sketches.vecDimMeans(col("st")).as("mean"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Any](2))
        .toMap
      books = (0 until m).map { s =>
        (0 until k).map { c =>
          val old = books(s)(c)
          val ms = means.getOrElse((s, c), null)
          (0 until subDim).map { d =>
            val v = if (ms != null && d < ms.length) ms(d) else null
            if (v == null) old(d) else v.asInstanceOf[Double]
          }
        }
      }
      it += 1
    }
    books
  }

  /** Deterministic farthest-point (Gonzalez) seed selection: start from the
    * pool's first point, then repeatedly add the candidate farthest from the
    * chosen set (squared L2; ties → lowest index). Driver-local over a
    * bounded pool. Duplicates in the pool collapse to distinct picks as long
    * as the pool has k distinct points; otherwise remaining slots reuse the
    * last pick (harmless — Lloyd reassigns). */
  private def farthestPointSeeds(pool: Array[Array[Double]], k: Int): Array[Array[Double]] = {
    require(pool.nonEmpty, "empty seed pool")
    val chosen = new Array[Array[Double]](k)
    chosen(0) = pool(0)
    val minD = Array.fill(pool.length)(Double.MaxValue)
    var c = 1
    while (c < k) {
      var bestI = 0
      var bestD = -1.0
      var i = 0
      while (i < pool.length) {
        val prev = chosen(c - 1)
        var d2 = 0.0
        var d = 0
        while (d < prev.length) { val diff = pool(i)(d) - prev(d); d2 += diff * diff; d += 1 }
        if (d2 < minD(i)) minD(i) = d2
        if (minD(i) > bestD) { bestD = minD(i); bestI = i }
        i += 1
      }
      chosen(c) = pool(bestI)
      c += 1
    }
    chosen
  }

  /** Encode every corpus vector to its PQ codes — the compressed index.
    * At m=8 the 64-float payload becomes 8 small ints; the raw vector is kept
    * alongside only for the exact re-rank join (drop it to scan pure codes). */
  def pqIndex(corpus: DataFrame, idCol: String, vecCol: String,
              codebooks: Seq[Seq[Seq[Double]]]): DataFrame = {
    // same guard as pqTrain — externally supplied codebooks with mismatched
    // block width would otherwise silently drop trailing dimensions
    pqIndexWithDims(corpus, idCol, vecCol, codebooks,
      corpus.select(size(col(vecCol))).head().getInt(0))
  }

  /** [[pqIndex]] with the dims guard fed from an already-known dimension
    * count (the fused builds take it from the seed pool) — skips the
    * head() probe job; the projection is identical. */
  private def pqIndexWithDims(corpus: DataFrame, idCol: String, vecCol: String,
                              codebooks: Seq[Seq[Seq[Double]]], dims: Int): DataFrame = {
    val m = codebooks.size
    require(dims % m == 0, s"vector dims $dims not divisible by m=$m codebooks")
    require(codebooks.forall(_.forall(_.size == dims / m)),
      s"codebook centroid width != dims/m = ${dims / m}")
    corpus.select(col(idCol).as("id"), col(vecCol).as("vec"),
      sketches.pqEncode(col(vecCol), codebooks).as("codes"))
  }

  /**
   * Fused PQ build: codebooks + encoded index from ONE shared seed-pool
   * collect. Identical outputs to `pqTrain` followed by `pqIndex` — the
   * pool is the same deterministic hash-sampled set, and the `pqIndex`
   * dims guard reads the pool instead of a separate head() probe — with
   * two plan-time driver actions fewer per query (the pool collect and the
   * dims probe were each their own job).
   */
  def pqBuild(corpus: DataFrame, idCol: String, vecCol: String,
              m: Int = 8, k: Int = 16, iters: Int = 2, seedSample: Int = 8)
      : (Seq[Seq[Seq[Double]]], DataFrame) = {
    val base = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val pool = seedPool(base, math.max(k, seedSample * k))
    require(pool.nonEmpty, "pqTrain: empty corpus")
    val books = pqTrainFromPool(base, pool, m, k, iters)
    (books, pqIndexWithDims(corpus, idCol, vecCol, books, pool.head.length))
  }

  /**
   * Fused IVF+PQ build: coarse centroids, PQ codebooks and the encoded
   * index from ONE shared seed-pool collect (`seedPool` is a deterministic
   * total order — orderBy(hash, id) + limit returns rows IN that order —
   * so the first `nCells` rows of the larger pool ARE `seedPool(base,
   * nCells)`, and the first `max(k, seedSample*k)` rows ARE pqTrain's
   * pool). Centroids, codebooks and index are bit-identical to
   * `ivfBuild` + `pqTrain` + `ivfPqIndex`; the fused build collapses four
   * plan-time driver actions (two seed-pool collects and two dims probes)
   * into one. The Lloyd and PQ refinement passes are unchanged.
   */
  def ivfPqBuild(corpus: DataFrame, idCol: String, vecCol: String,
                 nCells: Int, m: Int = 8, k: Int = 16, iters: Int = 2,
                 seedSample: Int = 8)
      : (Seq[Seq[Double]], Seq[Seq[Seq[Double]]], DataFrame) = {
    require(nCells > 0, "ivfPqBuild: pass an explicit nCells (the sqrt-N " +
      "auto-sizing would cost the count() action this fused build removes)")
    val base = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val pqPool = math.max(k, seedSample * k)
    val pool = seedPool(base, math.max(nCells, pqPool))
    require(pool.nonEmpty, "ivfPqBuild: empty corpus")
    // validate BEFORE spawning any concurrent work: a dims/m mismatch must
    // fail on the calling thread with nothing left running in background
    val dims = pool.head.length
    require(dims % m == 0, s"vector dims $dims not divisible by m=$m subspaces")
    // the Lloyd refinement and the PQ codebook training are independent
    // passes over `base` with independent driver state — overlap them
    // (guide §2.6: actions are only sequential because the driver calls
    // them sequentially), so the coarse quantizer's jobs back-fill the PQ
    // pass's stragglers. Results are unchanged: each pass is exact and
    // deterministic on its own. If the foreground PQ pass fails, the
    // centroid future is still awaited so no orphaned jobs outlive the call.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    val fCentroids = Future(lloydRefine(base,
      pool.take(nCells).map(_.toSeq).toSeq, iters))
    val books =
      try pqTrainFromPool(base, pool.take(pqPool), m, k, iters)
      catch { case t: Throwable =>
        try Await.result(fCentroids, scala.concurrent.duration.Duration.Inf)
        catch { case _: Throwable => () } // the primary failure wins
        throw t
      }
    val centroids = Await.result(fCentroids,
      scala.concurrent.duration.Duration.Inf)
    val index = ivfPqIndexWithDims(corpus, idCol, vecCol, centroids, books, dims)
    (centroids, books, index)
  }

  /**
   * PQ ANN top-k with asymmetric-distance (ADC) candidate generation and
   * exact-cosine re-rank. Queries are collected (they are the bounded side —
   * same plan-literal budget as IVF centroids) and their per-subspace
   * lookup tables ride in a single [[sketches.pqAdcScores]] expression, so
   * candidate scoring is ONE pass over the compressed codes: M adds per
   * (row, query) instead of D multiplies against raw floats. The top
   * `rerank` ADC candidates per query are re-scored with exact cosine, which
   * restores exactness whenever the true neighbor survives candidate
   * generation — with rerank >= corpus size the result EQUALS
   * [[bruteForceTopK]] (every row survives and the re-rank is exact), which
   * is the operator's hard guarantee independent of codebook quality.
   *
   * Scale shape: only (query_id, neighbor_id, adc) flows through candidate
   * ranking — raw vectors re-join by neighbor_id for the <= rerank
   * survivors — and ranking is the two-phase [[rankTopKPerQuery]], so no
   * reducer ever sorts the whole corpus for one query. Query ids may be any
   * orderable type (int/long/string/...), not just long.
   */
  def pqTopK(codebooks: Seq[Seq[Seq[Double]]], index: DataFrame, queries: DataFrame,
             idCol: String, vecCol: String, k: Int, rerank: Int = 64): DataFrame = {
    val candidates = pqAdcCandidates(codebooks, index, queries, idCol, vecCol, rerank)
      .select("query_id", "neighbor_id")
    // raw vectors re-join for the <= Q*rerank survivors only
    val withVec = candidates.join(
      index.select(col("id").as("neighbor_id"), col("vec").as("cv")), Seq("neighbor_id"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val exact = withVec.join(broadcast(q), Seq("query_id"))
      .withColumn("score", cosine(col("qv"), col("cv")))
      .select("query_id", "neighbor_id", "score")
    rankTopKPerQuery(exact, "query_id", "score", "neighbor_id", k)
      .select("query_id", "rank", "neighbor_id", "score")
  }

  /** The ADC candidate-generation half of [[pqTopK]], with the ADC rank
    * exposed: (query_id, neighbor_id, rank), rank 1 = best approximate
    * score, rank <= rerank. Split out so harnesses can assert a planted
    * neighbor's survival MARGIN (rank well under rerank, i.e. headroom
    * against denser corpora), not merely that it survived — a fixture
    * whose planted copy scrapes in at rank = rerank flips silently on the
    * next scale-up. */
  def pqAdcCandidates(codebooks: Seq[Seq[Seq[Double]]], index: DataFrame,
                      queries: DataFrame, idCol: String, vecCol: String,
                      rerank: Int): DataFrame = {
    val t = adcTables(codebooks, queries, idCol, vecCol)
    // ids-only through the N×Q explode and both rank shuffles: the wide raw
    // vector stays out of the candidate stream entirely
    val scored = index
      .withColumn("adc", sketches.pqAdcScores(col("codes"), t.luts, t.norm2, t.qNorms))
      .select(col("id").as("neighbor_id"), posexplode(col("adc")))
      .withColumn("query_id", element_at(t.qIdLit, col("pos") + 1))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("col").as("adc"))
    rankTopKPerQuery(scored, "query_id", "adc", "neighbor_id", rerank)
      .select("query_id", "neighbor_id", "rank")
  }

  /** Deterministic hash-sampled candidate pool shared by the seeding
    * paths (IVF cells, k-means, PQ codebooks): the n smallest-id-hash
    * rows' vectors — id as a tie-break makes the order total even on
    * hash collisions, so seeding is identical under any partitioning. */
  private def seedPool(base: DataFrame, n: Int): Array[Array[Double]] =
    // null embeddings are not seedable points: skip them (previously an
    // NPE on collect when one landed in the pool window)
    base.where(col("vec").isNotNull)
      .withColumn("h", xxhash64(col("id")))
      .orderBy(col("h"), col("id")).limit(n)
      .select("vec").collect()
      .map(_.getSeq[Any](0).map(v => v.asInstanceOf[Number].doubleValue).toArray)

  /** Driver-computed ADC lookup tables for a bounded query set:
    * luts(q)(s)(c) = dot(q's block s, codebook s centroid c), plus the
    * centroid/query norms the cosine denominator needs and the query-id
    * array literal that maps a query index back to its id. */
  private case class AdcTables(qIdLit: Column, luts: Seq[Seq[Seq[Double]]],
                               norm2: Seq[Seq[Double]], qNorms: Seq[Double])

  private def adcTables(codebooks: Seq[Seq[Seq[Double]]], queries: DataFrame,
                        idCol: String, vecCol: String): AdcTables = {
    val m = codebooks.size
    val qRows = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")).collect()
    val qIds = qRows.map(_.get(0))
    val qVecs = qRows.map(_.getSeq[Any](1).map(v => v.asInstanceOf[Number].doubleValue).toArray)
    val subDim = codebooks.head.head.size
    val luts: Seq[Seq[Seq[Double]]] = qVecs.toSeq.map { qv =>
      require(qv.length == m * subDim,
        s"query dims ${qv.length} != codebook dims ${m * subDim}")
      (0 until m).map { s =>
        codebooks(s).map { cent =>
          var dot = 0.0
          var d = 0
          while (d < subDim) { dot += qv(s * subDim + d) * cent(d); d += 1 }
          dot
        }
      }
    }
    val norm2: Seq[Seq[Double]] = codebooks.map(_.map(_.map(x => x * x).sum))
    val qNorms: Seq[Double] = qVecs.toSeq.map(v => math.sqrt(v.map(x => x * x).sum))
    AdcTables(array(qIds.map(lit(_)).toIndexedSeq: _*), luts, norm2, qNorms)
  }

  /** Encode the corpus for [[ivfPqTopK]]: (id, vec, cell, codes) — the
    * coarse-quantizer cell AND the PQ codes in one pass. */
  def ivfPqIndex(corpus: DataFrame, idCol: String, vecCol: String,
                 centroids: Seq[Seq[Double]],
                 codebooks: Seq[Seq[Seq[Double]]]): DataFrame =
    ivfPqIndexWithDims(corpus, idCol, vecCol, centroids, codebooks,
      corpus.select(size(col(vecCol))).head().getInt(0))

  /** [[ivfPqIndex]] with the dims guard fed from an already-known dimension
    * count — skips the head() probe job; the projection is identical. */
  private def ivfPqIndexWithDims(corpus: DataFrame, idCol: String, vecCol: String,
                                 centroids: Seq[Seq[Double]],
                                 codebooks: Seq[Seq[Seq[Double]]], dims: Int): DataFrame = {
    val m = codebooks.size
    require(dims % m == 0, s"vector dims $dims not divisible by m=$m codebooks")
    corpus.select(col(idCol).as("id"), col(vecCol).as("vec"),
      nearestCentroid(col(vecCol), centroids).as("cell"),
      sketches.pqEncode(col(vecCol), codebooks).as("codes"))
  }

  /**
   * IVF-PQ composed ANN top-k — the billion-scale shape (Jégou et al.
   * TPAMI 2011 §V; FAISS IndexIVFPQ): the coarse quantizer restricts each
   * query to its `nProbe` nearest cells, PQ ADC scores ONLY the rows in
   * probed cells (one m-add chain per surviving pair via the pair-scoring
   * expression — scoring all Q queries per row would throw away the probe
   * pruning), and exact cosine re-ranks the top `rerank` survivors.
   *
   * Scale shape: probed (query, cell) pairs are a Q × nProbe broadcast;
   * candidate generation is a broadcast equi-join on `cell` (the corpus
   * never shuffles — with the store partitioned by cell it prunes to
   * nProbe/nCells of the data); the candidate stream carries only
   * (query_id, neighbor_id, adc) through the bounded-heap rank; raw
   * vectors re-join for <= Q × rerank survivors. Probe cells are computed
   * with the SAME expression that assigned index cells, so an identical
   * vector is guaranteed to be probed (the planted-fixture exactness the
   * oracle pins — no driver-vs-executor float divergence).
   */
  def ivfPqTopK(centroids: Seq[Seq[Double]], codebooks: Seq[Seq[Seq[Double]]],
                index: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, k: Int, nProbe: Int = 4,
                rerank: Int = 64): DataFrame = {
    val t = adcTables(codebooks, queries, idCol, vecCol)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val probed = q.select(col("query_id"),
        explode(sketches.nearestCells(col("qv"), centroids, nProbe)).as("cell"))
      .withColumn("qidx", (array_position(t.qIdLit, col("query_id")) - 1).cast("int"))
      .select("cell", "query_id", "qidx")
    val scored = index.join(broadcast(probed), Seq("cell"))
      .where(col("query_id") =!= col("id"))
      .withColumn("adc",
        sketches.pqAdcPairScore(col("codes"), col("qidx"), t.luts, t.norm2, t.qNorms))
      .select(col("query_id"), col("id").as("neighbor_id"), col("adc"))
    val candidates = rankTopKPerQuery(scored, "query_id", "adc", "neighbor_id", rerank)
      .select("query_id", "neighbor_id")
    val withVec = candidates.join(
      index.select(col("id").as("neighbor_id"), col("vec").as("cv")), Seq("neighbor_id"))
    val exact = withVec.join(broadcast(q), Seq("query_id"))
      .withColumn("score", cosine(col("qv"), col("cv")))
      .select("query_id", "neighbor_id", "score")
    rankTopKPerQuery(exact, "query_id", "score", "neighbor_id", k)
      .select("query_id", "rank", "neighbor_id", "score")
  }

  /**
   * Johnson–Lindenstrauss random projection: compress `vecCol` to
   * `outDims` components with a deterministic hash-derived ±uniform
   * matrix (no RNG at plan time, no broadcast needed — every executor
   * regenerates the same rows). Distances and cosines are approximately
   * preserved (JL lemma); exact equality IS preserved (identical inputs
   * project identically), which is what the planted-fixture oracle pins.
   * Scan-local single-pass expression — safe inside the parquet
   * projection at any scale. Method: Johnson & Lindenstrauss (1984);
   * database-side treatment in Achlioptas, "Database-friendly random
   * projections" (2001).
   */
  def randomProject(vecCol: Column, outDims: Int): Column =
    sketches.randomProject(vecCol, outDims)

  /**
   * Compressed-domain top-k: score ALL corpus rows against each query in
   * the `outDims`-wide projected space (cheap — outDims ≪ dims), keep
   * `rerank` candidates per query via the shuffle-free bounded-heap rank,
   * then re-score only those survivors with exact cosine on the raw
   * vectors. Same candidates-then-exact shape as [[pqTopK]], with the JL
   * projection standing in for the PQ codes: ids-only through the
   * candidate shuffle, raw vectors re-join for the <= Q*rerank survivors.
   * With a planted exact copy in the corpus the copy's projected cosine
   * is exactly 1 — it always survives candidate generation, so recall of
   * planted duplicates is 1 by construction at any scale.
   */
  def projectedTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, k: Int, outDims: Int = 16,
                    rerank: Int = 64): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      randomProject(col(vecCol), outDims).as("pv"))
    val q = queries.select(col(idCol).as("query_id"),
      randomProject(col(vecCol), outDims).as("qpv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("pscore", cosine(col("qpv"), col("pv")))
      .select("query_id", "neighbor_id", "pscore")
    val candidates = rankTopKPerQuery(scored, "query_id", "pscore", "neighbor_id", rerank)
      .select("query_id", "neighbor_id")
    val withVec = candidates.join(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")), Seq("neighbor_id"))
    val qRaw = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val exact = withVec.join(broadcast(qRaw), Seq("query_id"))
      .withColumn("score", cosine(col("qv"), col("cv")))
      .select("query_id", "neighbor_id", "score")
    rankTopKPerQuery(exact, "query_id", "score", "neighbor_id", k)
      .select("query_id", "rank", "neighbor_id")
  }

  /**
   * Recall@k of an approximate ANN result against the exact result — the
   * standard audit every approximate index (IVF/LSH/PQ/projected) ships
   * with: before trusting an ANN variant at corpus scale, measure what
   * fraction of the TRUE top-k it returns on a probe query set.
   *
   * Both inputs are (query_id, rank, neighbor_id) frames as produced by
   * every topK operator here; rows with rank > k are ignored, so a
   * k'=100 result can be audited at k=10 without recomputation. Output is
   * one row per query with ALL-INTEGER fields — (query_id, n_exact,
   * n_hit), recall = n_hit / n_exact — so an external oracle reproduces
   * the audit bit-exactly (the no-raw-doubles rule); queries with an
   * empty exact top-k are absent (recall of nothing is undefined).
   *
   * Scale shape: both sides are (queries × k)-sized — orders of magnitude
   * below the corpus by construction — and the hit test is one semi-join
   * keyed by (query_id, neighbor_id) plus two query-keyed aggregates.
   * Nothing corpus-sized appears anywhere.
   */
  def recallAtK(exact: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val e = exact.where(col("rank") <= k).select("query_id", "neighbor_id")
    // distinct keeps semi-join parity on a (malformed) duplicate-bearing
    // approx side: a left join would multiply matched e-rows, a semi never
    val a = approx.where(col("rank") <= k).select("query_id", "neighbor_id")
      .distinct().withColumn("__hit", lit(1))
    // one join + one aggregate (was: semi-join + two aggregates + join):
    // n_exact counts e-rows per query, n_hit counts those with a match —
    // count(col) skips nulls, so unmatched rows contribute 0, exactly the
    // coalesce(n_hit, 0) of the former outer join
    e.join(a, Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_exact"), count(col("__hit")).as("n_hit"))
  }

  /** One band's bucket key via builtins (cross-check formulation):
    * planes [band*planes, (band+1)*planes). */
  def lshBucketBand(vecCol: Column, planes: Int, band: Int): Column = {
    val dims = size(vecCol)
    val bits = (0 until planes).map { p =>
      val plane = band * planes + p
      val idxs = sequence(lit(0), dims - 1)
      val dot = aggregate(
        zip_with(vecCol, idxs, (v, i) => v.cast("double") * planeComponent(plane, i)),
        lit(0.0), (acc, v) => acc + v)
      when(dot >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }
}
