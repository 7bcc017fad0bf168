package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Scratch profiler for the dupClusters sub-steps (dev diagnostic, not part
  * of the library surface).
  */
object DedupProf {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val repl = sys.env.getOrElse("SPARK_GRAFT_REPL", "12").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus * 4)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // PROF_DIR: profile the exact parquet corpus the scaling bench reads
    // (no localCheckpoint — identical scan shape); else derive in-memory
    val corpus = sys.env.get("PROF_DIR")
      .map(spark.read.parquet(_))
      .getOrElse(ScalingBench.dedupStressCorpus(spark, "/root/testdata/sf0.1", repl, 64)
        .localCheckpoint())
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.1f s  rows=$n")
    }
    val (reps, members) = Dedup.exactCollapse(corpus)
    t("exactCollapse(members)") { members.count() }
    val repDocs = reps.select(col("rep_id").as("doc_id"), col("text"))
    val sh = Dedup.shingles(repDocs)
    t("shingles") { sh.count() }
    t("signatures") { Dedup.minhashSignatures(repDocs).count() }
    t("lshCandidates") { Dedup.lshCandidates(sh, sys.env.getOrElse("PROF_BANDS", "16").toInt, sys.env.getOrElse("PROF_ROWS", "2").toInt, portable = false, maxBucket = 1000).count() }
    t("lshRepPairs(verify)") { Dedup.lshRepPairs(corpus, bands = sys.env.getOrElse("PROF_BANDS", "16").toInt, rows = sys.env.getOrElse("PROF_ROWS", "2").toInt).count() }
    t("dupClusters(full)") { Dedup.dupClusters(corpus, bands = sys.env.getOrElse("PROF_BANDS", "16").toInt, rows = sys.env.getOrElse("PROF_ROWS", "2").toInt).count() }
    spark.stop()
  }
}
