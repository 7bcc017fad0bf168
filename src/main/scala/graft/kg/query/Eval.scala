package graft.kg.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Extraction-quality evaluation at corpus scale — the BASELINE.json
  * acceptance metric (triple-level P/R vs reference extractions) as a
  * first-class operator, so a production run can score itself against a
  * gold slice continuously instead of only in unit tests.
  *
  * All ratios are integer fixed-point (e6, floor) — bit-exact DuckDB
  * pairing, no float drift in a monitoring metric.
  */
object Eval {

  /** Per-predicate precision / recall / F1 of `predicted` against `gold`
    * (both (subj, pred, obj) relations; extra columns pruned, duplicates
    * collapsed — triple-SET semantics).
    *
    * Shape: two distincts, ONE left-semi equi-join on the full triple key
    * for the true positives, three per-pred hash-aggs joined on the
    * metadata-sized predicate key. Never pairwise, never a driver
    * collect — gold can be corpus-scale (e.g. yesterday's accepted
    * extraction as the reference for today's).
    * Output: (pred, n_pred, n_gold, tp, p_e6, r_e6, f1_e6).
    */
  def triplePR(predicted: DataFrame, gold: DataFrame): DataFrame = {
    def triples(df: DataFrame) =
      df.select(col("subj"), col("pred"), col("obj")).distinct()
    val p = triples(predicted)
    val g = triples(gold)
    val tp = p.join(g, Seq("subj", "pred", "obj"), "left_semi")
      .groupBy(col("pred")).agg(count(lit(1)).as("tp"))
    val np = p.groupBy(col("pred")).agg(count(lit(1)).as("n_pred"))
    val ng = g.groupBy(col("pred")).agg(count(lit(1)).as("n_gold"))
    np.join(ng, Seq("pred"), "full_outer")
      .join(tp, Seq("pred"), "left")
      .select(col("pred"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("n_gold"), lit(0L)).as("n_gold"),
        coalesce(col("tp"), lit(0L)).as("tp"))
      .withColumn("p_e6",
        when(col("n_pred") > 0, expr("(tp * 1000000) div n_pred"))
          .otherwise(lit(0L)))
      .withColumn("r_e6",
        when(col("n_gold") > 0, expr("(tp * 1000000) div n_gold"))
          .otherwise(lit(0L)))
      .withColumn("f1_e6",
        when(col("p_e6") + col("r_e6") > 0,
          expr("(2 * p_e6 * r_e6) div (p_e6 + r_e6)")).otherwise(lit(0L)))
  }
}
