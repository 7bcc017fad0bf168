package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.kg.expr.SignBands.signBands
import graft.kg.expr.SignBandsAlgo
import graft.kg.expr.VectorExprs.{dotProduct, l2Norm}

/** Approximate-nearest-neighbor similarity search over the `embeddings`
  * table (`Array[Float]` column, computed in double).
  *
  * Two plans for the same query:
  *  - [[bruteForceTopK]] — exact baseline: one pass, per-row dot product
  *    against a broadcast query vector, global top-k. At 10^12 rows this is a
  *    full scan: correct but the slow path; it is also the verify oracle for
  *    the ANN plan.
  *  - [[ivfTopK]] — IVF: vectors are pre-assigned to coarse centroids (seed
  *    vectors, or k-means-trained via [[KMeans]]) by [[ivfAssign]], the
  *    assignment is MATERIALIZED as a cell-partitioned table ([[materializedIndex]]
  *    — built once, reused by every query), and a query probes only its
  *    nProbe nearest cells, so the scan is partition-pruned to
  *    ~nProbe/nCells of the data. Recall measured in OpsSpec; exactness of
  *    the mechanics checked by the sim_ivf_topk DuckDB oracle.
  *
  * Query-vector discipline: a query is identified by `queryVecId` for the
  * harness API, but the id is resolved to its vector with EXACTLY ONE point
  * lookup per query ([[queryVector]]); every internal stage takes the vector,
  * never the id — at 10^12 rows a repeated `where(vec_id = q)` lookup would
  * be a second full scan (OpsSpec "ivfTopK construction runs exactly 2
  * driver jobs" pins the job count).
  */
object Similarity {

  private def embCol = expr("transform(embedding, x -> cast(x as double))")

  /** (vec_id, emb, norm) with double components. */
  def prepared(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id").cast("long").as("vec_id"), embCol.as("emb"))
      .withColumn("norm", l2Norm(col("emb")))

  /** The one point lookup that resolves a query id to its (vector, norm).
    * On a real deployment the embeddings table is bucketed/partition-pruned by
    * vec_id so this is a metadata-scale read; either way it runs ONCE per
    * query — every downstream stage receives the vector.
    */
  def queryVector(embeddings: DataFrame, queryVecId: Long): (Seq[Double], Double) = {
    val q = prepared(embeddings).where(col("vec_id") === queryVecId)
      .select(col("emb"), col("norm")).head()
    (q.getSeq[Double](0), q.getDouble(1))
  }

  /** Exact cosine top-k against the embedding of `queryVecId`.
    * Output: (vec_id, rank), rank 1..k, query itself excluded.
    */
  def bruteForceTopK(embeddings: DataFrame, queryVecId: Long = 0L, k: Int = 10): DataFrame = {
    val (qv, qn) = queryVector(embeddings, queryVecId)
    bruteForceTopKVec(embeddings, qv, qn, excludeId = Some(queryVecId), k = k)
  }

  /** [[bruteForceTopK]] for callers that already hold the query vector (no
    * id lookup — the scale API shape).
    */
  def bruteForceTopKVec(embeddings: DataFrame, qv: Seq[Double], qn: Double,
      excludeId: Option[Long] = None, k: Int = 10): DataFrame = {
    val p = prepared(embeddings)
    val base = excludeId.map(id => p.where(col("vec_id") =!= id)).getOrElse(p)
    rankTopK(
      base.withColumn("qv", typedLit(qv))
        .withColumn("cos", dotProduct(col("emb"), col("qv")) / (col("norm") * lit(qn))), k)
  }

  /** Distributed top-k then rank: `orderBy.limit(k)` plans as
    * TakeOrderedAndProject (per-partition heaps + driver merge), and the
    * ranking window only ever sees k rows — never a global one-task sort
    * over the full relation.
    */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.orderBy(col("cos").desc, col("vec_id").asc)
    scored
      .orderBy(col("cos").desc, col("vec_id").asc).limit(k)
      .withColumn("rank", row_number().over(w))
      .select(col("vec_id"), col("rank").cast("long").as("rank"))
  }

  /** Batched exact top-k: one scan scores ALL query vectors at once (queries
    * broadcast; N×Q scored rows), then a TWO-LEVEL ranking keeps k per query:
    * a first window partitioned by (query_id, salt) — salt =
    * pmod(xxhash64(vec_id), salts), so no task ever sorts more than
    * ~N/salts rows — keeps k per (query, salt), and the final window ranks
    * the surviving salts·k rows per query. A single per-query window would
    * put ALL N scored rows of one query in one task at scale; the global
    * top-k is fully contained in the union of per-salt top-ks, so the
    * two-level plan is result-identical (same DuckDB oracle).
    * Output: (query_id, vec_id, rank), rank 1..k per query.
    */
  def batchTopK(embeddings: DataFrame, queryIds: Seq[Long] = 0L until 5L,
      k: Int = 5, salts: Int = 16): DataFrame = {
    val p = prepared(embeddings)
    val q = p.where(col("vec_id").isin(queryIds.map(x => x: Any): _*))
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"), col("norm").as("q_norm"))
    val ord = Seq(col("cos").desc, col("vec_id").asc)
    val wSalted = Window.partitionBy(col("query_id"), col("salt")).orderBy(ord: _*)
    val wFinal = Window.partitionBy(col("query_id")).orderBy(ord: _*)
    p.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos",
        dotProduct(col("emb"), col("q_emb")) / (col("norm") * col("q_norm")))
      .withColumn("salt", pmod(xxhash64(col("vec_id")), lit(salts)).cast("int"))
      .withColumn("prerank", row_number().over(wSalted))
      .where(col("prerank") <= k)
      .withColumn("rank", row_number().over(wFinal))
      .where(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("rank").cast("long").as("rank"))
  }

  /** The IVF index relation: every vector assigned to its nearest of the
    * given cells. One broadcast of the cells + a single max_by hash-agg:
    * top-1-per-key is an aggregation, not a sort — no ranking window (same
    * R11 rationale as the pipeline argmax), and the assignment sub-plan
    * exists exactly once.
    * Output: (vec_id, emb, norm, cell_id).
    */
  def ivfAssignTo(embeddings: DataFrame, cells: DataFrame): DataFrame = {
    val p = prepared(embeddings)
    p.crossJoin(broadcast(cells)) // intentional: n x nCells scoring fan-out
      .withColumn("cell_cos",
        dotProduct(col("emb"), col("cell_emb")) / (col("norm") * col("cell_norm")))
      .groupBy(col("vec_id"))
      .agg(max_by(
        struct(col("emb"), col("norm"), col("cell_id")),
        // ties: highest cos, then lowest cell_id (mirrors the SQL oracle)
        struct(col("cell_cos"), (-col("cell_id")).as("nc"))).as("best"))
      .select(col("vec_id"), col("best.emb").as("emb"), col("best.norm").as("norm"),
        col("best.cell_id").cast("int").as("cell_id"))
  }

  /** Deterministic seed cells: the embeddings of vec_id < nCells — the
    * k-means-free baseline ([[graft.ops.KMeans]] is the trained path).
    * Output: (cell_id, cell_emb, cell_norm).
    */
  def seedCells(embeddings: DataFrame, nCells: Int = 16): DataFrame =
    prepared(embeddings).where(col("vec_id") < nCells)
      .select(col("vec_id").as("cell_id"), col("emb").as("cell_emb"),
        col("norm").as("cell_norm"))

  def ivfAssign(embeddings: DataFrame, nCells: Int = 16): DataFrame =
    ivfAssignTo(embeddings, seedCells(embeddings, nCells))

  /** Fixed index schema (never inferred — SURVEY.md §1.2; also means the
    * probe read never touches a data-file footer outside the probed
    * partitions). cell_id is the partition column.
    */
  val indexSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("emb", ArrayType(DoubleType, containsNull = false), nullable = false),
      StructField("norm", DoubleType, nullable = false),
      StructField("cell_id", IntegerType, nullable = false)))
  }

  /** Bump when the index layout or assignment mechanics change: a cached dir
    * built by older code must never be silently reused.
    */
  val IndexVersion: Int = 2

  private val materializedIdx = scala.collection.concurrent.TrieMap.empty[String, String]

  /** Build-once IVF index: [[ivfAssign]] written as parquet PARTITIONED BY
    * cell_id (per JVM, keyed by `tag` + [[IndexVersion]]). At cluster scale
    * this is a real materialized index table (TableIO/Iceberg layout);
    * queries never rebuild the assignment, and the probe scan
    * partition-prunes to the probed cells. The cached entry is REVALIDATED on
    * every lookup (`_SUCCESS` must still exist — long-lived JVMs outlive tmp
    * cleaners) and rebuilt if stale.
    */
  def materializedIndex(spark: SparkSession, embeddings: DataFrame, tag: String,
      nCells: Int = 16): String = {
    def valid(dir: String): Boolean =
      java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "_SUCCESS"))
    def build(): String = {
      val dir = java.nio.file.Files.createTempDirectory("graft-ivf-index").toString
      ivfAssign(embeddings, nCells).write.mode("overwrite")
        .partitionBy("cell_id").parquet(dir)
      dir
    }
    val key = s"$tag/$nCells/v$IndexVersion"
    val cached = materializedIdx.getOrElseUpdate(key, build())
    if (valid(cached)) cached
    else {
      val fresh = build()
      materializedIdx.put(key, fresh)
      fresh
    }
  }

  private val materializedKmIdx =
    scala.collection.concurrent.TrieMap.empty[String, (String, Seq[(Int, Seq[Long])])]

  /** Build-once k-means IVF index: centroids trained by [[KMeans.train]]
    * (integer Lloyd, driver-held k·d state), every vector assigned to its
    * nearest centroid by integer squared-Euclidean distance in ONE
    * broadcast+min_by pass, written partitioned by cell_id. Returns
    * (indexDir, centroids) — the centroids are the probe structure, so
    * probing is a pure driver computation (zero Spark jobs). Same
    * revalidation discipline as [[materializedIndex]].
    */
  def materializedKmeansIndex(spark: SparkSession, embeddings: DataFrame,
      tag: String, nCells: Int = 16, iters: Int = 3): (String, Seq[(Int, Seq[Long])]) = {
    def valid(dir: String): Boolean =
      java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "_SUCCESS"))
    def build(): (String, Seq[(Int, Seq[Long])]) = {
      val cents = KMeans.train(embeddings, nCells, iters)
      val dir = java.nio.file.Files.createTempDirectory("graft-ivf-km-index").toString
      writeAssigned(embeddings, cents, dir, "overwrite")
      (dir, cents)
    }
    val key = s"$tag/$nCells/$iters/km-v$IndexVersion"
    val cached = materializedKmIdx.getOrElseUpdate(key, build())
    if (valid(cached._1)) cached
    else {
      val fresh = build()
      materializedKmIdx.put(key, fresh)
      fresh
    }
  }

  /** Assign `embeddings` to FROZEN `cents` (one broadcast + min_by pass) and
    * write the (vec_id, emb, norm, cell_id) rows to `dir` partitioned by
    * cell_id — shared by the initial index build and [[appendToKmeansIndex]].
    */
  private def writeAssigned(embeddings: DataFrame, cents: Seq[(Int, Seq[Long])],
      dir: String, mode: String): Unit = {
    val rel = prepared(embeddings).withColumn("qv", KMeans.quantize("emb"))
    KMeans.assignTo(rel, cents, carry = Seq("emb", "norm"))
      .write.mode(mode).partitionBy("cell_id").parquet(dir)
  }

  /** Incremental index MAINTENANCE — the daily-shard path for the similarity
    * family (the ANN mirror of [[graft.ops.IncrementalDedup.commitIncrement]]):
    * assign a batch of new vectors to the index's FROZEN centroids and append
    * them into the existing cell partitions. Work is batch-sized (one
    * broadcast-assign pass + a partitioned append); the stored index is never
    * rewritten, probes see base ∪ batch immediately, and OpsSpec pins that
    * the appended index is row-identical to assigning everything against the
    * same centroids from scratch. Centroids stay frozen between retrains —
    * the standard production IVF discipline (drift is handled by periodic
    * full retrain+rebuild, a deliberate offline event, not by mutating cell
    * geometry under live probes).
    */
  def appendToKmeansIndex(batch: DataFrame, cents: Seq[(Int, Seq[Long])],
      indexDir: String): Unit =
    writeAssigned(batch, cents, indexDir, "append")

  /** Compressed-index schema of [[materializedSqIndex]]: the residual CODES
    * (one int8 per dimension) replace the raw `array<double>` embedding —
    * 64-dim ≈ 76 B/vector logical (64×1 B codes + 8 B id + 4 B cell) vs
    * ≈ 532 B raw, a 7× cut; at 10^12 rows that is the difference between an
    * unscannable ~0.5 PB index and ~76 TB, partition-pruned to nProbe/nCells
    * of it per query. Norms and raw embeddings are NOT stored — the exact
    * re-rank fetches originals by id (see [[ivfSqTopK]]).
    */
  val sqIndexSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("code", ArrayType(ByteType, containsNull = false), nullable = false),
      StructField("cell_id", IntegerType, nullable = false)))
  }

  private val materializedSqIdx =
    scala.collection.concurrent.TrieMap.empty[String, (String, Seq[(Int, Seq[Long])], Long)]

  /** Build-once scalar-quantized (int8-residual) IVF index — the compressed
    * variant of [[materializedKmeansIndex]], the standard public
    * IVF+quantized-residual construction: coarse centroids from the integer
    * Lloyd trainer, per-vector residual r = qv − centroid in the quantized
    * integer space, one GLOBAL int8 step s = max(1, ceil(max|r| / 127))
    * (one metadata-scale agg → a driver long), codes c_j = floor(r_j / s) ∈
    * [−127, 127] by construction (|r_j| ≤ 127·s), stored as `array<tinyint>`
    * partitioned by cell_id. Everything that decides a code is integer
    * arithmetic, so the DuckDB oracle reproduces the index bit-exactly (same
    * rationale as [[KMeans]]). Returns (indexDir, centroids, s); centroids +
    * s are the driver-held probe/decode structure (k·d + 1 longs). Same
    * revalidation discipline as [[materializedIndex]].
    */
  def materializedSqIndex(spark: SparkSession, embeddings: DataFrame,
      tag: String, nCells: Int = 16, iters: Int = 3): (String, Seq[(Int, Seq[Long])], Long) = {
    def valid(dir: String): Boolean =
      java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "_SUCCESS"))
    def build(): (String, Seq[(Int, Seq[Long])], Long) = {
      val session = spark
      import session.implicits._
      val cents = KMeans.train(embeddings, nCells, iters)
      val rel = prepared(embeddings).withColumn("qv", KMeans.quantize("emb"))
      val assigned = KMeans.assignTo(rel, cents, carry = Seq("qv"))
        .join(broadcast(cents.toDF("cell_id", "cv")), "cell_id")
        .withColumn("rv", expr("zip_with(qv, cv, (x, y) -> x - y)"))
      // global max |residual component|: ONE aggregate collapsing to a
      // driver long — metadata-scale, like the k-means centroid state
      val maxAbs = assigned
        .select(expr("aggregate(rv, 0L, (acc, x) -> greatest(acc, abs(x)))").as("m"))
        .agg(max(col("m"))).head().getLong(0)
      val s = math.max(1L, (maxAbs + 126L) / 127L)
      val dir = java.nio.file.Files.createTempDirectory("graft-ivf-sq-index").toString
      assigned
        // floor division via pmod (exact-multiple dividend), matching the
        // oracle's ((r % s) + s) % s construction; |r| <= 127*s makes the
        // result int8-safe without a clamp
        .withColumn("code",
          expr(s"cast(transform(rv, r -> (r - pmod(r, ${s}L)) div ${s}L) as array<tinyint>)"))
        .select(col("vec_id"), col("code"), col("cell_id"))
        .write.mode("overwrite").partitionBy("cell_id").parquet(dir)
      (dir, cents, s)
    }
    val key = s"$tag/$nCells/$iters/sq-v$IndexVersion"
    val cached = materializedSqIdx.getOrElseUpdate(key, build())
    if (valid(cached._1)) cached
    else {
      val fresh = build()
      materializedSqIdx.put(key, fresh)
      fresh
    }
  }

  /** ANN top-k over the compressed index: driver-side integer probe (zero
    * Spark jobs, as [[ivfKmeansTopK]]), a partition-pruned scan of the CODES
    * (the only per-vector data read), integer asymmetric-distance ranking
    * d2a = Σ (qq_j − (cv_j + code_j·s))² against the decoded residuals, a
    * distributed top-`rerank` (TakeOrderedAndProject — per-partition heaps,
    * never a global sort), then an EXACT double-cosine re-rank of those
    * `rerank` survivors against their original embeddings. The re-rank join
    * broadcasts the candidate ids; at deployment the vector store is
    * bucketed by vec_id so fetching `rerank` originals is a point-lookup
    * read, not a scan (same discipline as [[queryVector]]). All ranking
    * below the final cosine is integer → the DuckDB oracle replicates the
    * full mechanics (training loop + codes + probe + re-rank).
    * Output: (vec_id, rank), rank 1..k.
    */
  def ivfSqTopK(spark: SparkSession, indexDir: String,
      cents: Seq[(Int, Seq[Long])], s: Long, embeddings: DataFrame,
      queryVecId: Long = 0L, k: Int = 10, nProbe: Int = 4,
      rerank: Int = 50): DataFrame = {
    val session = spark
    import session.implicits._
    val (qv, qn) = queryVector(embeddings, queryVecId)
    val qq = KMeans.quantizeLocal(qv)
    val probeIds = cents
      .map { case (cid, cv) => (cid, KMeans.dist2Local(qq, cv)) }
      .sortBy { case (cid, d) => (d, cid) }
      .take(nProbe).map(_._1)
    val idx = spark.read.schema(sqIndexSchema).parquet(indexDir)
      .where(col("cell_id").isin(probeIds.map(x => x: Any): _*))
      .where(col("vec_id") =!= queryVecId)
      .join(broadcast(cents.toDF("cell_id", "cv")), "cell_id")
      .withColumn("qq", typedLit(qq))
      .withColumn("d2a", expr(
        s"aggregate(zip_with(qq, zip_with(cv, code, (c, d) -> c + cast(d as bigint) * ${s}L), " +
          "(x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v)"))
    val cands = idx.orderBy(col("d2a").asc, col("vec_id").asc).limit(rerank)
      .select(col("vec_id"))
    rankTopK(
      prepared(embeddings).join(broadcast(cands), "vec_id")
        .withColumn("qvv", typedLit(qv))
        .withColumn("cos", dotProduct(col("emb"), col("qvv")) / (col("norm") * lit(qn))), k)
  }

  private val materializedPqIdx = scala.collection.concurrent.TrieMap
    .empty[String, (String, Seq[(Int, Seq[Long])], Seq[(Int, Int, Seq[Long])])]

  /** Build-once PRODUCT-QUANTIZED IVF index (Jégou et al. 2011, "Product
    * Quantization for Nearest Neighbor Search" — the construction behind
    * FAISS's IVFPQ): the residual space is split into `m` subspaces of
    * dim/m components; each subspace gets its own `nCode`-entry codebook,
    * and a vector's payload is just its m codeword ids — here m=8 codes of
    * 4 bits (nCode=16): **4 B of codes + 8 B id + 4 B cell ≈ 16 B/vector
    * logical vs ≈ 76 B for the int8 scalar quantizer and ≈ 532 B raw — at
    * 10^12 rows, a ~16 TB index** (vs ~76 TB SQ / ~0.5 PB raw), still
    * partition-pruned to nProbe/nCells per query.
    *
    * Codebooks are SEEDED (the residual sub-vectors of vec_id < nCode — the
    * same seeding discipline as [[seedCells]]; a Lloyd refinement per
    * subspace would slot into the same relation through [[KMeans]]'s loop).
    * The codebook is m·nCode·(dim/m) = dim·nCode longs — driver-held
    * metadata, like the centroids. Encoding is one explode-to-(vec, u) pass
    * against the BROADCAST codebook: argmin codeword per subspace
    * (integer d², cid tie-break), i.e. per vector m·nCode 8-component
    * integer distances — the published encode cost. Everything deciding a
    * code is integer arithmetic → the DuckDB oracle rebuilds the index
    * bit-exactly. Returns (indexDir, centroids, codebook) with codebook
    * rows (u, cid, codeword). Same revalidation discipline as
    * [[materializedIndex]]; stored rows follow [[sqIndexSchema]] (codes are
    * an array<tinyint> of length m).
    */
  def materializedPqIndex(spark: SparkSession, embeddings: DataFrame,
      tag: String, nCells: Int = 16, iters: Int = 3, m: Int = 8,
      nCode: Int = 16): (String, Seq[(Int, Seq[Long])], Seq[(Int, Int, Seq[Long])]) = {
    def valid(dir: String): Boolean =
      java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "_SUCCESS"))
    def build(): (String, Seq[(Int, Seq[Long])], Seq[(Int, Int, Seq[Long])]) = {
      val session = spark
      import session.implicits._
      val cents = KMeans.train(embeddings, nCells, iters)
      val rel = prepared(embeddings).withColumn("qv", KMeans.quantize("emb"))
      val assigned = KMeans.assignTo(rel, cents, carry = Seq("qv"))
        .join(broadcast(cents.toDF("cell_id", "cv")), "cell_id")
        .withColumn("rv", expr("zip_with(qv, cv, (x, y) -> x - y)"))
      val sub = cents.head._2.length / m
      // codebook seeds: nCode residual vectors — one metadata-scale collect
      // (nCode·dim longs), the PQ analogue of the driver-held centroids
      val seeds = assigned.where(col("vec_id") < nCode)
        .select(col("vec_id"), col("rv")).collect()
        .map(r => (r.getLong(0).toInt, r.getSeq[Long](1)))
      val cb: Seq[(Int, Int, Seq[Long])] = for {
        (cid, rv) <- seeds.toSeq
        u <- 0 until m
      } yield (u, cid, rv.slice(u * sub, (u + 1) * sub))
      val cbDf = cb.toDF("u", "cid", "cw")
      val dir = java.nio.file.Files.createTempDirectory("graft-ivf-pq-index").toString
      assigned
        .select(col("vec_id"), col("cell_id"),
          posexplode(expr(
            s"transform(sequence(0, ${m - 1}), u -> slice(rv, u * $sub + 1, $sub))"))
            .as(Seq("u", "rsub")))
        .join(broadcast(cbDf), "u")
        .withColumn("d2", expr(
          "aggregate(zip_with(rsub, cw, (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v)"))
        .groupBy(col("vec_id"), col("cell_id"), col("u"))
        .agg(min_by(col("cid"), struct(col("d2"), col("cid"))).as("cu"))
        .groupBy(col("vec_id"), col("cell_id"))
        .agg(collect_list(struct(col("u"), col("cu"))).as("cs"))
        .withColumn("code", expr("transform(array_sort(cs), s -> cast(s.cu as tinyint))"))
        .select(col("vec_id"), col("code"), col("cell_id"))
        .write.mode("overwrite").partitionBy("cell_id").parquet(dir)
      (dir, cents, cb)
    }
    val key = s"$tag/$nCells/$iters/$m/$nCode/pq-v$IndexVersion"
    val cached = materializedPqIdx.getOrElseUpdate(key, build())
    if (valid(cached._1)) cached
    else {
      val fresh = build()
      materializedPqIdx.put(key, fresh)
      fresh
    }
  }

  /** ANN top-k over the product-quantized index via ASYMMETRIC DISTANCE
    * COMPUTATION — the published IVFPQ probe: because the query is not
    * quantized, the distance from the query residual to EVERY codeword is
    * precomputed once per (probed cell, subspace, codeword) — nProbe·m·nCode
    * integers, built ON THE DRIVER from the held centroids + codebook (zero
    * Spark jobs, like [[ivfKmeansTopK]]'s probe) — and a vector's
    * approximate distance is just the SUM OF m TABLE LOOKUPS on its codes.
    * The scan reads codes only (partition-pruned), the lookup is a broadcast
    * equi-join of the exploded (vec, u, code) rows against the 512-row
    * table, one hash-agg sums per vector, a distributed top-`rerank` cut
    * (TakeOrderedAndProject), then the exact double-cosine re-rank of the
    * survivors — identical re-rank discipline to [[ivfSqTopK]], but with a
    * 2× deeper default pool (100 vs 50): 4-bit ADC ranks coarser than the
    * int8 scalar quantizer, and deepening the exact re-rank is the published
    * compression/recall lever (the pool is still metadata-scale). All
    * ranking below the final cosine is integer → full-mechanics DuckDB
    * oracle. Output: (vec_id, rank), rank 1..k.
    */
  def ivfPqTopK(spark: SparkSession, indexDir: String,
      cents: Seq[(Int, Seq[Long])], cb: Seq[(Int, Int, Seq[Long])],
      embeddings: DataFrame, queryVecId: Long = 0L, k: Int = 10,
      nProbe: Int = 4, rerank: Int = 100): DataFrame = {
    val session = spark
    import session.implicits._
    val (qv, qn) = queryVector(embeddings, queryVecId)
    val qq = KMeans.quantizeLocal(qv)
    val probeIds = cents
      .map { case (cid, cv) => (cid, KMeans.dist2Local(qq, cv)) }
      .sortBy { case (cid, d) => (d, cid) }
      .take(nProbe).map(_._1)
    val centMap = cents.toMap
    val m = cb.map(_._1).max + 1
    val sub = cents.head._2.length / m
    // the ADC table: d²(query residual in this cell, codeword) per
    // (cell, subspace, codeword) — driver arithmetic over held metadata
    val dtab: Seq[(Int, Int, Int, Long)] = for {
      cell <- probeIds
      qr = qq.zip(centMap(cell)).map { case (a, b) => a - b }
      (u, cid, cw) <- cb
    } yield (cell, u, cid,
      qr.slice(u * sub, u * sub + sub).zip(cw)
        .map { case (x, y) => (x - y) * (x - y) }.sum)
    val dtabDf = dtab.toDF("cell_id", "u", "cid", "d2u")
    val idx = spark.read.schema(sqIndexSchema).parquet(indexDir)
      .where(col("cell_id").isin(probeIds.map(x => x: Any): _*))
      .where(col("vec_id") =!= queryVecId)
      .select(col("vec_id"), col("cell_id"),
        posexplode(col("code")).as(Seq("u", "c")))
      .withColumn("cid", col("c").cast("int"))
      .join(broadcast(dtabDf), Seq("cell_id", "u", "cid"))
      .groupBy(col("vec_id")).agg(sum(col("d2u")).as("d2a"))
    val cands = idx.orderBy(col("d2a").asc, col("vec_id").asc).limit(rerank)
      .select(col("vec_id"))
    rankTopK(
      prepared(embeddings).join(broadcast(cands), "vec_id")
        .withColumn("qvv", typedLit(qv))
        .withColumn("cos", dotProduct(col("emb"), col("qvv")) / (col("norm") * lit(qn))), k)
  }

  /** IVF ANN top-k over the k-means index: ONE point lookup resolves the
    * query vector; the probe is a DRIVER-side integer distance sort over the
    * k local centroids (no job at all — the probe structure is k·d longs);
    * the index scan carries the static cell_id partition filter; final
    * scoring is exact double cosine within the probed cells.
    * Output: (vec_id, rank), rank 1..k.
    */
  def ivfKmeansTopK(spark: SparkSession, indexDir: String,
      cents: Seq[(Int, Seq[Long])], embeddings: DataFrame,
      queryVecId: Long = 0L, k: Int = 10, nProbe: Int = 4): DataFrame = {
    val (qv, qn) = queryVector(embeddings, queryVecId)
    val qq = KMeans.quantizeLocal(qv)
    val probeIds = cents
      .map { case (cid, cv) => (cid, KMeans.dist2Local(qq, cv)) }
      .sortBy { case (cid, d) => (d, cid) }
      .take(nProbe).map(_._1)
    val idx = spark.read.schema(indexSchema).parquet(indexDir)
      .where(col("cell_id").isin(probeIds.map(x => x: Any): _*))
    rankTopK(
      idx.where(col("vec_id") =!= queryVecId)
        .withColumn("qv", typedLit(qv))
        .withColumn("cos", dotProduct(col("emb"), col("qv")) / (col("norm") * lit(qn))), k)
  }

  /** The nProbe cell ids nearest the query VECTOR (cos desc, cell_id asc) —
    * an nCells-row job, metadata-scale; public so tests can assert which
    * partitions a query is ALLOWED to touch. `cells` is any
    * (cell_id, cell_emb, cell_norm) relation ([[seedCells]] or trained
    * centroids).
    */
  def probeCellsVec(cells: DataFrame, qv: Seq[Double], qn: Double,
      nProbe: Int = 4): Seq[Long] =
    cells
      .withColumn("qv", typedLit(qv))
      .withColumn("cos", dotProduct(col("cell_emb"), col("qv")) / (col("cell_norm") * lit(qn)))
      .orderBy(col("cos").desc, col("cell_id").asc).limit(nProbe)
      .select(col("cell_id").cast("long")).collect().toSeq.map(_.getLong(0))

  /** Id-keyed convenience used by tests (ONE lookup + one probe job). */
  def probeCells(embeddings: DataFrame, queryVecId: Long = 0L,
      nCells: Int = 16, nProbe: Int = 4): Seq[Long] = {
    val (qv, qn) = queryVector(embeddings, queryVecId)
    probeCellsVec(seedCells(embeddings, nCells), qv, qn, nProbe)
  }

  /** IVF ANN top-k over a materialized index: ONE point lookup resolves the
    * query id to its vector ([[queryVector]]); cell probing scores nCells
    * rows (metadata scale) and collects nProbe cell ids, so the index scan
    * carries a STATIC `cell_id IN (...)` partition filter — at 10^12 rows
    * only nProbe/nCells of the index is read (pruning asserted by
    * PlanShapeSpec; behaviorally proven by OpsSpec's corrupted-cell test).
    * Output: (vec_id, rank), rank 1..k.
    */
  def ivfTopK(spark: SparkSession, indexDir: String, embeddings: DataFrame,
      queryVecId: Long = 0L, k: Int = 10, nCells: Int = 16, nProbe: Int = 4,
      cells: Option[DataFrame] = None): DataFrame = {
    val (qv, qn) = queryVector(embeddings, queryVecId)
    val probeIds = probeCellsVec(cells.getOrElse(seedCells(embeddings, nCells)),
      qv, qn, nProbe)
    // int literals to match the partition column's type exactly — a cast
    // around cell_id would defeat static partition pruning
    val idx = spark.read.schema(indexSchema).parquet(indexDir)
      .where(col("cell_id").isin(probeIds.map(_.toInt: Any): _*))
    rankTopK(
      idx.where(col("vec_id") =!= queryVecId)
        .withColumn("qv", typedLit(qv))
        .withColumn("cos", dotProduct(col("emb"), col("qv")) / (col("norm") * lit(qn))), k)
  }

  /** Deterministic k-NN-join corpus: originals plus, for every 3rd vector,
    * THREE near-dup variants (vec_id + m·1_000_000, component 0 scaled by
    * 1.0m, m = 1..3) — each planted group of 4 vectors is mutually at cosine
    * ≥ 0.999, so every group member has exactly three thresholded neighbors
    * and the rank column is meaningfully exercised (the in-group cosines
    * differ at the 1e-4 scale — far above double noise, so the ordering is
    * deterministic on both sides). Scale factors are written as decimal
    * LITERALS so Spark and the DuckDB oracle parse the identical double.
    */
  def derivedKnnEmbeddings(embeddings: DataFrame): DataFrame = {
    val base = embeddings.select(col("vec_id").cast("long").as("vec_id"),
      expr("transform(embedding, x -> cast(x as double))").as("emb"))
    (1 to 3).foldLeft(base) { (acc, m) =>
      acc.unionByName(base.where(col("vec_id") % 3 === 0)
        .select((col("vec_id") + m * 1000000L).as("vec_id"),
          expr(s"transform(emb, (x, i) -> case when i = 0 then x * 1.0$m else x end)")
            .as("emb")))
    }
  }

  /** All-pairs k-NN JOIN, thresholded: for EVERY vector, its k nearest
    * neighbors among those at cosine ≥ `threshold` — the per-document "find
    * my near-duplicates/translations" primitive, where [[bruteForceTopK]] is
    * one query and this is all of them at once. Never all-pairs: candidates
    * come from the same random-hyperplane sign-band collisions as
    * [[graft.ops.Dedup.embeddingNearDups]] (equi-join on (band, key)); only
    * candidates pay the exact cosine; the undirected verified pairs are then
    * symmetrized (each cosine computed ONCE) and ranked with the two-level
    * salted window of [[batchTopK]] so no task ever sorts more than
    * ~neighbors/salts rows per vector. Shares the brute-force DuckDB oracle
    * by the [[graft.ops.Dedup.embeddingNearDups]] recall argument.
    * The planted variants scale ONE component (not the whole vector), so a
    * hyperplane's dot-product sign CAN flip between group members — candidacy
    * is probabilistic, not structural: in-group cosines are >= 0.999
    * (θ/π <= 0.0143), so a pair misses a single 12-row band with p <=
    * 1-(1-0.0143)^12 ≈ 0.159 and all 24 bands with p <= 0.159^24 < 1e-19 —
    * negligible against the brute-force oracle, but a corpus/geometry change
    * must re-derive this bound rather than assume near-exactness.
    * Output: (vec_id, nbr_id, rank), rank 1..k per vec_id.
    */
  def knnJoin(derived: DataFrame, threshold: Double = 0.95, k: Int = 3,
      bands: Int = 24, rows: Int = 12, dim: Int = 64, seed: Long = 42L,
      salts: Int = 8): DataFrame = {
    val planes = SignBandsAlgo.planes(bands, rows, dim, seed)
    val keyed = derived.select(col("vec_id"),
      posexplode(signBands(col("emb"), planes, bands, rows)).as(Seq("band", "key")))
    val cands = keyed.as("x").join(keyed.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"))
      .distinct()
    val withNorm = derived.select(col("vec_id"), col("emb"), l2Norm(col("emb")).as("norm"))
    val verified = cands
      .join(withNorm.select(col("vec_id").as("a"), col("emb").as("ea"), col("norm").as("na")), "a")
      .join(withNorm.select(col("vec_id").as("b"), col("emb").as("eb"), col("norm").as("nb")), "b")
      .withColumn("cos", dotProduct(col("ea"), col("eb")) / (col("na") * col("nb")))
      .where(col("cos") >= threshold)
      .select(col("a"), col("b"), col("cos"))
    val directed = verified.select(col("a").as("vec_id"), col("b").as("nbr_id"), col("cos"))
      .unionByName(verified.select(col("b").as("vec_id"), col("a").as("nbr_id"), col("cos")))
    val ord = Seq(col("cos").desc, col("nbr_id").asc)
    val wSalted = Window.partitionBy(col("vec_id"), col("salt")).orderBy(ord: _*)
    val wFinal = Window.partitionBy(col("vec_id")).orderBy(ord: _*)
    directed
      .withColumn("salt", pmod(xxhash64(col("nbr_id")), lit(salts)).cast("int"))
      .withColumn("prerank", row_number().over(wSalted))
      .where(col("prerank") <= k)
      .withColumn("rank", row_number().over(wFinal))
      .where(col("rank") <= k)
      .select(col("vec_id"), col("nbr_id"), col("rank").cast("long").as("rank"))
  }
}
