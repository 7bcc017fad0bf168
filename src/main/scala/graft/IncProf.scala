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
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[incprof] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
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
