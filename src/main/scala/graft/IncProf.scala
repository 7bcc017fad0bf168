package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, IncrementalDedup}

/** Scratch profiler for the incremental-dedup shard step (dev diagnostic,
  * not part of the library surface): decomposes the `dedup_incremental`
  * bench row (base state prebuilt, step-only) into its phases under the
  * exact Bench session config.
  */
object IncProf {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, Long, Long, Int, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for { a <- si.completionTime; b <- si.submissionTime } yield a - b).getOrElse(0L)
        stages.add((si.stageId, wall, si.taskMetrics.executorRunTime,
          si.taskMetrics.shuffleReadMetrics.totalBytesRead,
          si.taskMetrics.shuffleWriteMetrics.bytesWritten,
          si.numTasks, si.rddInfos.sortBy(_.id)
            .map(r => r.scope.map(_.name).getOrElse("") + "[" + r.callSite + "]")
            .distinct.mkString(" > ").take(400)))
      }
    })
    def time[T](name: String)(f: => T): T = {
      stages.clear()
      val t0 = System.nanoTime(); val r = f
      println(f"[incprof] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      if (sys.env.contains("INCPROF_JOBS")) {
        // listener events are delivered async; give the bus a beat so tail
        // StageCompleted events land in this block, not the next (dev
        // diagnostic — best-effort, not a correctness surface)
        Thread.sleep(300)
        import scala.jdk.CollectionConverters._
        stages.asScala.toSeq.sortBy(_._1).foreach { case (id, wall, run, sr, sw, nt, d) =>
          if (wall >= 100)
            println(f"[incprof]    stage $id%4d wall=${wall / 1e3}%6.2f cpu=${run / 1e3}%7.2f tasks=$nt%3d " +
              f"sRd=${sr / 1e6}%6.1fM sWr=${sw / 1e6}%6.1fM  $d")
        }
      }
      r
    }
    val corpus = Dedup.derivedCorpus(
      spark.read.parquet(s"$sfDir/documents.parquet"))
    val state = time("commitState (excluded in bench)")(
      IncrementalDedup.materializedState(
        spark, corpus.where(pmod(col("doc_id"), lit(7)) =!= 0), tag = sfDir))
    val shard = corpus.where(pmod(col("doc_id"), lit(7)) === 0)
    // decision over stored state only — isolates the CC + decide tail
    (1 to 2).foreach { i =>
      time(s"decisionAsOf (CC+decide) #$i")(
        IncrementalDedup.decisionAsOf(spark, state).count())
    }
    // the full bench row
    (1 to 3).foreach { i =>
      time(s"incrementalClusters #$i")(
        IncrementalDedup.incrementalClusters(spark, state, shard).count())
    }
    spark.stop()
  }
}
