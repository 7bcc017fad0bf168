package graft.kg.link

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew salting for hot-key joins (SURVEY.md §2.2, BASELINE.json:6/14).
  *
  * Hot gazetteer keys (e.g. "Java", "Englisch" — a few surfaces receive a
  * large share of all mentions) would concentrate one join key's rows in one
  * task at cluster scale. The standard remedy for a *broadcast* join is free
  * (no shuffle by key exists), but for shuffle-based equi-joins — which is
  * what a non-broadcastable dimension forces — the fact side is salted:
  * replicate the dimension S ways and spread fact rows across the S replicas
  * by a hash of a high-cardinality fact column, so each hot key fans out over
  * S tasks. Correctness: every fact row still meets exactly one replica of
  * each matching dim row, so the join result is identical (asserted by the
  * salted and unsalted plans sharing one DuckDB oracle).
  */
object Salting {

  /** Prep-pass salt-factor measurement (SURVEY.md §4: "S chosen from
    * key-frequency stats computed in a prep pass"): choose S so the hottest
    * key's rows spread down to roughly an average shuffle partition's share —
    * S = ceil(maxKeyRows * partitions / totalRows), clamped to [1, maxSalts].
    * One aggregation over the fact side, run once per (fact shape, key) in
    * the prep pass — never per plan build.
    */
  def measuredSalts(fact: DataFrame, factKey: String, partitions: Int,
      maxSalts: Int = 64): Int = {
    val row = fact.groupBy(col(factKey)).agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("mx"), sum(col("n")).as("tot")).head()
    if (row.isNullAt(0)) 1
    else {
      val mx = row.getLong(0)
      val tot = row.getLong(1)
      math.max(1, math.min(maxSalts, math.ceil(mx.toDouble * partitions / tot).toInt))
    }
  }

  /** Salted equi-join of `fact` with `dim` on `fact(factKey) == dim(dimKey)`.
    *
    * @param spreadBy high-cardinality fact column whose hash spreads rows
    *                 (e.g. doc_id)
    * @param salts    replication factor S
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      spreadBy: String,
      salts: Int): DataFrame = {
    val saltedDim = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    val saltedFact = fact
      .withColumn("__salt", pmod(xxhash64(col(spreadBy)), lit(salts)).cast("int"))
    saltedFact
      .join(saltedDim,
        saltedFact(factKey) === saltedDim(dimKey) &&
          saltedFact("__salt") === saltedDim("__salt"))
      .drop("__salt")
  }
}
