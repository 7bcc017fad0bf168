package graft

import org.apache.spark.sql.SparkSession

/** Scratch JFR-target loop: runs one registered query repeatedly under the
  * Bench session config so `jfr print` can attribute the per-task CPU.
  * Usage: SPARK_GC_OPTS="-XX:StartFlightRecording=..." sbt "runMain graft.QProf <query> <reps>"
  */
object QProf {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("kg_all_triples")
    val reps = args.lift(1).map(_.toInt).getOrElse(8)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    SparkEntry.prestage(spark, sfDir)
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      println(f"[qprof] $name #$i ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
