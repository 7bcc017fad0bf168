package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch operator-level profiler for the round-7 optimization pass
  * (guide §1.4: noop-sink isolation). Times each sub-relation of the
  * heaviest registered queries in isolation so stage-level wall can be
  * attributed to operators (AQE hides callsites from stage names).
  * Not part of the driver contract.
  */
object MicroProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(df: => DataFrame): Unit = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[micro] $name%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val corpus = Dedup.derivedCorpus(docs)

    // warm codegen/classloading
    try corpus.count() catch { case _: Throwable => () }

    {
      val (reps, _) = Dedup.exactCollapse(corpus)
      val repsDocs = reps.select(col("rep_id").as("doc_id"), col("text"))
      val sh0 = Dedup.shingles(repsDocs)
      println(s"[count] reps=${reps.count()} shingles=${sh0.count()}")
      val bb = Dedup.bandBuckets(sh0, 32, 1, portable = false)
      val bs = bb.groupBy("band", "bucket").count()
      bs.select(expr("max(count)").as("mx"), expr("percentile(count, 0.99)").as("p99"),
          expr("sum(count * (count - 1) / 2)").as("pairRows"), expr("count(1)").as("nBuckets"))
        .show(false)
      val cands = Dedup.lshCandidates(sh0, 32, 1, portable = false, 1000)
      println(s"[count] cands32x1=${cands.count()}")
      // collision-count distribution: how many bands does each candidate share
      val bj = bb.as("x").join(bb.as("y"),
          col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
            col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id"), col("y.doc_id")).count()
      bj.groupBy(col("count")).agg(expr("count(1)").as("pairs"))
        .orderBy("count").show(40, false)
    }

    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      t("derivedCorpus")(corpus)
      val (reps, members) = Dedup.exactCollapse(corpus)
      t("exactCollapse.reps")(reps)
      t("exactCollapse.members")(members)
      val repsDocs = reps.select(col("rep_id").as("doc_id"), col("text"))
      t("shingles(reps)")(Dedup.shingles(repsDocs))
      val sh = Dedup.shingles(repsDocs)
      // label says incl.shingles: minhashSignatures re-derives the shingle
      // relation internally, so this row = shingles + the 32-hash agg (the
      // agg alone ≈ this row minus the row above)
      t("sig32(incl. shingles)")(Dedup.minhashSignatures(repsDocs))
      t("lshCandidates32x1")(
        Dedup.lshCandidates(sh, 32, 1, portable = false, 1000))
      t("verify(cands)")(Dedup.verifyJaccard(
        Dedup.lshCandidates(sh, 32, 1, portable = false, 1000), sh, 1, 2))
      t("dupClusters(corpus)")(Dedup.dupClusters(corpus))
      t("minhashLsh(corpus)")(Dedup.minhashLsh(corpus))
      // curate decomposition
      t("curate.quality")(TextOps.quality(corpus))
      t("curate.predLang")(TextOps.predLang(corpus))
      val stats = TextOps.quality(corpus).select("doc_id", "n_tokens", "quality_e4")
      val lang = TextOps.predLang(corpus).select("doc_id", "pred_lang")
      val kept = corpus.select(col("doc_id").cast("long").as("doc_id"), col("text"))
        .join(stats, "doc_id")
        .join(lang, Seq("doc_id"), "left")
        .withColumn("pred_lang", coalesce(col("pred_lang"), lit("unknown")))
        .where(col("quality_e4") >= 7000L && col("pred_lang").isin("en"))
      t("curate.kept")(kept)
      t("curate.dupClusters(kept)")(
        Dedup.dupClusters(kept.select(col("doc_id"), col("text"))))
      t("curate(full)")(TextOps.curate(docs))
    }
    spark.stop()
  }
}
