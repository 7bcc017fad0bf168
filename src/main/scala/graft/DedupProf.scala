package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
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
      // mirror the scaling bench's dedup-phase split sizing (small corpus)
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAXPART", "4m"))
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
    // PROF_STAGES=1: per-stage CPU-vs-wall attribution for dupClusters only —
    // separates per-task slowdown (shared-hardware contention: sum of task
    // run times inflates with cores) from scheduling/wave loss (flat sum,
    // lagging wall)
    if (sys.env.get("PROF_STAGES").contains("1")) {
      val runTime = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null)
            runTime.merge(e.stageId, e.taskMetrics.executorRunTime, (a: Long, b: Long) => a + b)
        override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
          val si = e.stageInfo
          val wall = (for { s <- si.submissionTime; c <- si.completionTime }
            yield (c - s) / 1000.0).getOrElse(-1.0)
          val m = si.taskMetrics
          val gb = 1024.0 * 1024 * 1024
          println(f"[stage] id=${si.stageId}%4d tasks=${si.numTasks}%4d " +
            f"wall=$wall%7.1f s run=${runTime.getOrDefault(si.stageId, 0L) / 1000.0}%8.1f s " +
            f"in=${m.inputMetrics.bytesRead / gb}%5.2fG " +
            f"sr=${m.shuffleReadMetrics.totalBytesRead / gb}%5.2fG " +
            f"sw=${m.shuffleWriteMetrics.bytesWritten / gb}%5.2fG")
        }
      })
      val df = Dedup.dupClusters(corpus,
        bands = sys.env.getOrElse("PROF_BANDS", "16").toInt,
        rows = sys.env.getOrElse("PROF_ROWS", "2").toInt)
      t("dupClusters(full)") { df.count() }
      val plan = df.queryExecution.executedPlan.toString
      println(s"[plan] Exchange=${plan.linesIterator.count(_.contains("Exchange hashpartitioning"))} " +
        s"ReusedExchange=${plan.linesIterator.count(_.contains("ReusedExchange"))} " +
        s"final=${plan.contains("isFinalPlan=true")}")
      spark.stop()
      return
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
