package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.kg.expr.VectorExprs.{dotProduct, l2Norm}

/** Approximate-nearest-neighbor similarity search over the `embeddings`
  * table (`Array[Float]` column, computed in double).
  *
  * Two plans for the same query:
  *  - [[bruteForceTopK]] — exact baseline: one pass, per-row dot product
  *    against a broadcast query vector, global top-k. At 10^12 rows this is a
  *    full scan: correct but the slow path; it is also the verify oracle for
  *    the ANN plan.
  *  - [[ivfTopK]] — IVF: vectors are pre-assigned to coarse centroids (here:
  *    deterministic seed vectors; k-means at scale), the query probes only
  *    the nProbe nearest cells, so the scan touches ~nProbe/nCells of the
  *    data. Recall measured in SimilaritySpec.
  */
object Similarity {

  private def embCol = expr("transform(embedding, x -> cast(x as double))")

  /** (vec_id, emb, norm) with double components. */
  def prepared(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id").cast("long").as("vec_id"), embCol.as("emb"))
      .withColumn("norm", l2Norm(col("emb")))

  private def dotWith(q: Seq[Double]) = {
    val qLit = typedLit(q)
    dotProduct(col("emb"), col("qv")) -> qLit
  }

  /** Exact cosine top-k against the embedding of `queryVecId`.
    * Output: (vec_id, rank), rank 1..k, query itself excluded.
    */
  def bruteForceTopK(embeddings: DataFrame, queryVecId: Long = 0L, k: Int = 10): DataFrame = {
    val p = prepared(embeddings)
    val q = p.where(col("vec_id") === queryVecId)
      .select(col("emb"), col("norm")).head()
    val qv = q.getSeq[Double](0)
    val qn = q.getDouble(1)
    val (dot, qLit) = dotWith(qv)
    rankTopK(
      p.where(col("vec_id") =!= queryVecId)
        .withColumn("qv", qLit)
        .withColumn("cos", dot / (col("norm") * lit(qn))), k)
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

  /** IVF ANN: coarse cells = the embeddings of vec_id < nCells (deterministic
    * stand-in for trained centroids); every vector assigned to its nearest
    * cell once (a materialized index at scale); query probes nProbe cells.
    */
  def ivfTopK(spark: SparkSession, embeddings: DataFrame, queryVecId: Long = 0L,
      k: Int = 10, nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val p = prepared(embeddings)
    val cells = p.where(col("vec_id") < nCells)
      .select(col("vec_id").as("cell_id"), col("emb").as("cell_emb"), col("norm").as("cell_norm"))
    val cellDot = dotProduct(col("emb"), col("cell_emb"))
    val assignW = Window.partitionBy(col("vec_id"))
      .orderBy(col("cell_cos").desc, col("cell_id").asc)
    val assigned = p.crossJoin(broadcast(cells))
      .withColumn("cell_cos", cellDot / (col("norm") * col("cell_norm")))
      .withColumn("rn", row_number().over(assignW))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("emb"), col("norm"), col("cell_id"))
    val q = assigned.where(col("vec_id") === queryVecId).head()
    val qv = q.getSeq[Double](1)
    val qn = q.getDouble(2)
    // probe cells: nProbe nearest cells to the query vector
    val (qDotCell, qLit0) = (dotProduct(col("cell_emb"), col("qv")), typedLit(qv))
    val probeCells = cells.withColumn("qv", qLit0)
      .withColumn("cos", qDotCell / (col("cell_norm") * lit(qn)))
      .orderBy(col("cos").desc, col("cell_id").asc)
      .limit(nProbe)
      .select(col("cell_id"))
    val (dot, qLit) = dotWith(qv)
    rankTopK(
      assigned
        .join(broadcast(probeCells), "cell_id")
        .where(col("vec_id") =!= queryVecId)
        .withColumn("qv", qLit)
        .withColumn("cos", dot / (col("norm") * lit(qn))), k)
  }
}
