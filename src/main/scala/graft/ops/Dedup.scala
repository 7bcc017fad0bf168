package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.kg.expr.VectorExprs.{dotProduct, l2Norm}

/** Deduplication operators for a large-scale training-data pipeline: exact
  * (hash key), n-gram Jaccard (blocked shingle self-join), MinHash+LSH
  * (signature → band buckets → candidate join → exact verify), SimHash
  * (bit-majority signature → banded hamming join), and embedding-cosine
  * near-dup.
  *
  * Scale notes (the point of each design):
  *  - exact: one hash-agg, no comparison is ever pairwise.
  *  - ngram-jaccard: the only pairwise step is the equi-join on shingles, so
  *    cost tracks shared-shingle pairs, not n².
  *  - minhash-lsh: candidate generation is an equi-join on (band, bucket) —
  *    at 10^12 docs this is the only sub-quadratic near-dup path; band/row
  *    counts (16×2 over k=32) put P(candidate | J=0.7) > 0.9999.
  *  - simhash: 4×16-bit bands make hamming<=3 candidate generation EXACT by
  *    pigeonhole, still equi-join shaped.
  *  - embedding: per-block brute force; blocks bound the quadratic term.
  */
object Dedup {

  /** Deterministic near-dup test corpus derived from `documents` (the driver
    * tables contain no duplicates): A = originals; B = doc_id+1_000_000 with
    * every 10th token rewritten (near-dups, token-Jaccard ≈ 0.5–0.8); C =
    * doc_id+2_000_000 exact copies of every 5th doc. Mirrored 1:1 by the
    * DuckDB oracles.
    */
  def derivedCorpus(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val mutated = base.where(col("doc_id") % 2 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        expr("array_join(transform(split(text, ' '), (t, i) -> " +
          "case when i % 10 = 0 then 'xdup' else t end), ' ')").as("text"))
    val copies = base.where(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
    base.unionByName(mutated).unionByName(copies)
  }

  /** Exact dedup: group by content hash, keep the smallest doc_id. */
  def exact(corpus: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("md5"))
    corpus.select(col("doc_id"), md5(col("text")).as("md5"))
      .withColumn("keep_id", min(col("doc_id")).over(w))
      .select(col("doc_id"), col("keep_id"),
        when(col("doc_id") =!= col("keep_id"), 1L).otherwise(0L).as("is_dup"))
  }

  /** Distinct 3-gram token shingles: (doc_id, s). */
  def shingles(corpus: DataFrame, n: Int = 3): DataFrame =
    corpus.select(col("doc_id"), explode(expr(
      s"transform(sequence(1, greatest(size(split(text, ' ')) - ${n - 1}, 0)), " +
        s"i -> array_join(slice(split(text, ' '), i, $n), ' '))")).as("s"))
      .distinct()

  /** Exact pairwise n-gram Jaccard >= numer/denom via shingle equi-join;
    * integer arithmetic only (denom*common >= numer*union).
    * Output: (a, b, common, union_) with a < b.
    */
  def ngramJaccard(corpus: DataFrame, numer: Int = 1, denom: Int = 5): DataFrame = {
    val sh = shingles(corpus)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val common = sh.as("x").join(sh.as("y"),
        col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("n", "na"), "a")
      .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("n", "nb"), "b")
      .withColumn("union_", col("na") + col("nb") - col("common"))
      .where(col("common") * denom >= col("union_") * numer)
      .select(col("a"), col("b"), col("common"), col("union_"))
  }

  /** MinHash signatures: k independent permutations approximated by seeded
    * xxhash64; one hash-agg per doc (no per-doc loops).
    */
  def minhashSignatures(corpus: DataFrame, k: Int = 32): DataFrame =
    minhashSignaturesFrom(shingles(corpus), k)

  private def minhashSignaturesFrom(sh: DataFrame, k: Int): DataFrame = {
    val aggs = (0 until k).map(j => min(xxhash64(col("s"), lit(j))).as(s"h$j"))
    sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash+LSH near-dup pairs, exact-verified at token-3-gram Jaccard >=
    * numer/denom. Candidates come from equality of any (band, bucket):
    * bucket = hash of the band's `rows` signature slots.
    *
    * Band geometry: precision is always exact (verify step), so the only
    * tunable is recall-vs-candidate-noise. Default (bands=32, rows=1) makes a
    * J>=0.5 pair's miss probability (1-J)^32 <= 2.4e-10 — effectively exact,
    * which is what lets this query share the brute-force DuckDB oracle. At
    * larger corpus scale with lower-J cutoffs, (16, 2) halves candidate noise
    * for a 1e-4-ish miss rate — pass it explicitly.
    * Output: (a, b, common, union_), a < b.
    */
  def minhashLsh(corpus: DataFrame, numer: Int = 1, denom: Int = 2,
      bands: Int = 32, rows: Int = 1): DataFrame = {
    // the shingle relation feeds signature building, sizes, and the verify
    // join (4 subtree uses) — persist so it is computed once
    val sh0 = shingles(corpus)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sigs = minhashSignaturesFrom(sh0, bands * rows)
    val bandCols: Seq[Column] = (0 until bands).map { b =>
      val slots = (0 until rows).map(r => col(s"h${rows * b + r}"))
      struct(lit(b).as("band"), xxhash64(slots: _*).as("bucket"))
    }
    val buckets = sigs.select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val cands = buckets.as("x").join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    // exact verify: intersect shingle sets only for candidate pairs
    val sh = sh0
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    cands
      .join(sh.withColumnRenamed("doc_id", "a").withColumnRenamed("s", "sa"), "a")
      .join(sh.withColumnRenamed("doc_id", "b").withColumnRenamed("s", "sb"), "b")
      .where(col("sa") === col("sb"))
      .groupBy("a", "b").agg(count(lit(1)).as("common"))
      .join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("n", "na"), "a")
      .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("n", "nb"), "b")
      .withColumn("union_", col("na") + col("nb") - col("common"))
      .where(col("common") * denom >= col("union_") * numer)
      .select(col("a"), col("b"), col("common"), col("union_"))
  }

  /** 64-bit SimHash per doc: bit i is the majority of bit i over the token
    * hash multiset. One explode + one hash-agg (64 sums packed from a
    * per-token ±1 vector), no UDAF.
    */
  def simhashSignatures(corpus: DataFrame): DataFrame = {
    val tok = corpus.select(col("doc_id"),
      explode(split(col("text"), " ")).as("t"))
      .withColumn("h", xxhash64(col("t")))
    val bitSums = (0 until 64).map { i =>
      sum(shiftright(col("h"), i).bitwiseAND(1L) * 2 - 1).as(s"b$i")
    }
    val agg = tok.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map { i =>
      when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(0L)
    }.reduce(_ bitwiseOR _) // OR, not +: bit 63 would overflow a signed add
    agg.select(col("doc_id"), sig.as("sig"))
  }

  /** SimHash near-dup pairs with hamming distance <= maxHamming (default 3).
    * Band join on 4x16-bit slices is EXACT for <=3 by pigeonhole.
    * Output: (a, b, hamming).
    */
  def simhashPairs(corpus: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sigs = simhashSignatures(corpus)
    val bandCols = (0 until 4).map { k =>
      struct(lit(k).as("band"),
        shiftrightunsigned(col("sig"), 16 * k).bitwiseAND(0xFFFFL).as("key"))
    }
    val bands = sigs.select(col("doc_id"), col("sig"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("sig"), col("bb.band").as("band"), col("bb.key").as("key"))
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        bit_count(col("x.sig").bitwiseXOR(col("y.sig"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Deterministic near-dup embedding corpus: originals plus vec_id+1_000_000
    * with the first component scaled 1.01x for every 3rd vector
    * (cosine ≈ 0.9999 to its source). Mirrored by the DuckDB oracle.
    */
  def derivedEmbeddings(embeddings: DataFrame): DataFrame = {
    val base = embeddings.select(col("vec_id").cast("long").as("vec_id"),
      expr("transform(embedding, x -> cast(x as double))").as("emb"))
    val mutated = base.where(col("vec_id") % 3 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        expr("transform(emb, (x, i) -> case when i = 0 then x * 1.01 else x end)").as("emb"))
    base.unionByName(mutated)
  }

  /** Embedding-cosine near-dup pairs (cosine >= threshold), brute-force
    * pairwise; at scale the identical predicate runs inside LSH/IVF blocks
    * (see Similarity) — this is the verify kernel.
    * Output: (a, b), a < b.
    */
  def embeddingNearDups(derived: DataFrame, threshold: Double = 0.95): DataFrame = {
    val withNorm = derived.withColumn("norm", l2Norm(col("emb")))
    val dot = dotProduct(col("x.emb"), col("y.emb"))
    withNorm.as("x").join(withNorm.as("y"), col("x.vec_id") < col("y.vec_id"))
      .where(dot >= lit(threshold) * col("x.norm") * col("y.norm"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"))
  }
}
