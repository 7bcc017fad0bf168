package graft
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.kg.Pipeline
import graft.kg.emit.TableIO
object Prof {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-24s ${(System.nanoTime()-t0)/1e9}%8.2f s"); r
    }
    val docs = ScalingBench.replicatedDocs(spark, "/root/testdata/sf0.1", 400, cpus * 2)
    val pDir = Files.createTempDirectory("prof-postings").toString
    graft.kg.io.SyntheticCorpus.fromDocuments(docs).write.mode("overwrite").parquet(pDir)
    val gaz = Pipeline.defaultGazetteers(spark)
    val postings = spark.read.parquet(pDir)
    (1 to 3).foreach { i =>
      time(s"allTriples.count #$i")(Pipeline.allTriples(postings, gaz).count())
      val out = Files.createTempDirectory("prof-out").toString
      val triples = Pipeline.allTriples(postings, gaz)
      time(s"writeTriples #$i")(TableIO.writeTriples(spark, triples, out))
      TableIO.deleteTree(out)
    }
    spark.stop()
  }
}
