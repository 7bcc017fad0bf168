package graft

import org.apache.spark.sql.functions._
import graft.kg.expr.functions.kmin_values
import graft.kg.query.TripleStore

/** The KMV sketch aggregate: bottom-k semantics, dedup, merge-path
  * invariance, and the estimator wrapper. The sf0.01 DuckDB oracle
  * (kg_predicate_card_sketch) is the end-to-end bit-exactness gate; these
  * pin the aggregate's mechanics.
  */
class KMinValuesSpec extends SparkTestBase {

  test("kmin_values: k smallest distinct values, ascending, duplicates collapse") {
    import spark.implicits._
    val df = Seq(9L, 3L, 7L, 3L, 1L, 8L, 1L, 5L).toDF("h")
    val r = df.agg(kmin_values(col("h"), 3)).collect()(0).getSeq[Long](0)
    assert(r === Seq(1L, 3L, 5L))
  }

  test("kmin_values: fewer than k distinct values returns them all") {
    import spark.implicits._
    val r = Seq(4L, 2L, 4L).toDF("h")
      .agg(kmin_values(col("h"), 8)).collect()(0).getSeq[Long](0)
    assert(r === Seq(2L, 4L))
  }

  test("kmin_values: partition-count invariant (merge path == single buffer)") {
    import spark.implicits._
    val vals = (0 until 500).map(i => ((i * 7919L) % 1000, i % 4))
    val df = vals.toDF("h", "g")
    def run(parts: Int) = df.repartition(parts)
      .groupBy(col("g")).agg(kmin_values(col("h"), 10).as("km"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toList).toMap
    assert(run(1) === run(13))
  }

  test("kmin_values: plan runs partial aggregation (sketch-sized shuffle)") {
    import spark.implicits._
    val plan = Seq((1, 2L)).toDF("g", "h").groupBy(col("g"))
      .agg(kmin_values(col("h"), 4)).queryExecution.executedPlan.toString
    // TypedImperativeAggregate plans as ObjectHashAggregate with a
    // partial_kmin_values stage BELOW the exchange — the property that
    // makes the shuffle carry <= k longs per (task, group) instead of
    // every distinct value
    assert(plan.contains("ObjectHashAggregate"), plan.take(1500))
    assert(plan.contains("partial_kmin_values"), plan.take(1500))
  }

  test("mergeKminSketches: merge of shard sketches == from-scratch sketch") {
    import spark.implicits._
    val t = (0 until 600).map(i => (s"D$i", if (i % 5 == 0) "P" else "Q", s"o$i"))
      .toDF("subj", "pred", "obj")
    // deterministic split; "R" exists only in the shard side
    val base = t.where(expr("pmod(xxhash64(subj), 2) = 0"))
    val shard = t.where(expr("pmod(xxhash64(subj), 2) = 1"))
      .union(Seq(("DX", "R", "ox")).toDF("subj", "pred", "obj"))
    val full = t.union(Seq(("DX", "R", "ox")).toDF("subj", "pred", "obj"))
    def collectEst(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val merged = collectEst(TripleStore.estimateFromSketches(
      TripleStore.mergeKminSketches(
        TripleStore.predicateKminSketches(base),
        TripleStore.predicateKminSketches(shard))))
    val scratch = collectEst(TripleStore.predicateCardSketch(full))
    assert(merged === scratch)
    assert(merged.contains("R")) // one-sided pred survives the full-outer merge
  }

  test("predicateCardSketch: exact below k, bounded-error estimate at k") {
    import spark.implicits._
    // pred A: 3 distinct objects (< kObj=8 -> exact); pred B: 2000 distinct
    // (estimate path). Subjects: 2000 distinct on both (kSubj=64 estimate).
    val t = (0 until 2000).flatMap { i =>
      Seq((s"D$i", "A", s"o${i % 3}"), (s"D$i", "B", s"x$i"))
    }.toDF("subj", "pred", "obj")
    val r = TripleStore.predicateCardSketch(t).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(r("A")._2 === 3L)
    // KMV expected relative error ~ 1/sqrt(k-2) — at kObj=8 that's ~41%
    // with a heavy right tail (this fixed md5 draw lands at 2.0x truth:
    // 4022), so the k=8 band is order-of-magnitude; kSubj=64 (~13%) gets
    // a real band. Deterministic given the fixed hash — pins, not gambles.
    val estObjB = r("B")._2
    assert(estObjB > 500 && estObjB < 8000, s"est_obj(B) = $estObjB")
    val estSubjA = r("A")._1
    assert(estSubjA > 1400 && estSubjA < 2900, s"est_subj(A) = $estSubjA")
  }
}
