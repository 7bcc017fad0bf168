package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Similarity}

/** Correctness of the non-SQL-expressible training-data ops (rows-only in the
  * driver's oracle check): LSH vs brute force, banded SimHash exactness, IVF
  * recall.
  */
class OpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private lazy val corpus =
    Dedup.derivedCorpus(spark.read.parquet(s"$sf/documents.parquet")).cache()

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash LSH (32x1 bands) finds exactly the brute-force J>=0.5 pairs") {
    val brute = pairs(Dedup.ngramJaccard(corpus, 1, 2))
    val lsh = pairs(Dedup.minhashLsh(corpus, 1, 2))
    // precision is exact by construction (verify step); with 32x1 bands the
    // per-pair miss probability at J>=0.5 is <= (0.5)^32, so set equality is
    // the expected outcome on any input
    assert(lsh == brute, s"missing=${(brute -- lsh).take(5)} spurious=${(lsh -- brute).take(5)}")
    assert(brute.nonEmpty, "test corpus must contain planted near-dups")
    // the scale-tuned geometry (16x2) must still catch every strong near-dup
    // (planted exact copies, J = 1)
    val lsh16 = pairs(Dedup.minhashLsh(corpus, 1, 2, bands = 16, rows = 2))
    val copies = corpus.where(col("doc_id") >= 2000000L)
      .select((col("doc_id") - 2000000L).as("a"), col("doc_id").as("b"))
    assert(pairs(copies).subsetOf(lsh16))
  }

  test("banded simhash candidate join is exact for hamming <= 3") {
    val sigs = Dedup.simhashSignatures(corpus).cache()
    val bruteForce = sigs.as("x").join(sigs.as("y"), col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        bit_count(col("x.sig").bitwiseXOR(col("y.sig"))).as("h"))
      .where(col("h") <= 3)
      .select("a", "b")
    val banded = Dedup.simhashPairs(corpus).select("a", "b")
    assert(pairs(banded) == pairs(bruteForce))
    // exact copies (doc_id+2_000_000) are hamming 0 and must all be found
    val copies = corpus.where(col("doc_id") >= 2000000L)
      .select((col("doc_id") - 2000000L).as("a"), col("doc_id").as("b"))
    assert(pairs(copies).subsetOf(pairs(banded)))
    sigs.unpersist()
  }

  test("embedding near-dups: exactly the planted pairs") {
    val derived = Dedup.derivedEmbeddings(spark.read.parquet(s"$sf/embeddings.parquet"))
    val got = pairs(Dedup.embeddingNearDups(derived))
    val planted = derived.where(col("vec_id") >= 1000000L)
      .select((col("vec_id") - 1000000L).as("a"), col("vec_id").as("b"))
    assert(pairs(planted) == got)
  }

  test("IVF top-k recall@10 vs brute force") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val brute = Similarity.bruteForceTopK(e).select("vec_id").collect()
      .map(_.getLong(0)).toSet
    val ivf = Similarity.ivfTopK(spark, e).select("vec_id").collect()
      .map(_.getLong(0)).toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall@10 = $recall (ivf probes 4/16 cells)")
  }

  test("exact dedup flags exactly the planted copies") {
    val d = Dedup.exact(corpus)
    val dups = d.where(col("is_dup") === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val planted = corpus.where(col("doc_id") >= 2000000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(dups == planted)
  }
}
