package graft
import org.apache.spark.sql.SparkSession
import graft.kg.{Pipeline}
import graft.kg.io.SyntheticCorpus
import graft.kg.extract.Extractors
object Prof {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s"); r
    }
    val docs = ScalingBench.replicatedDocs(spark, "/root/testdata/sf0.1", 100, cpus * 2)
    time("docs.count")(docs.count())
    val postings = SyntheticCorpus.fromDocuments(docs)
    time("postings.count")(postings.count())
    val gaz = Pipeline.defaultGazetteers(spark)
    val spans = Extractors.textSpans(postings)
    time("spans.count")(spans.count())
    time("workload")(Pipeline.workloadTriples(Extractors.textSpans(postings)).count())
    time("skills")(Pipeline.skillTriples(Extractors.textSpans(postings), gaz.skills).count())
    time("languages")(Pipeline.languageTriples(Extractors.textSpans(postings), gaz.languages).count())
    time("locations")(Pipeline.locationTriples(Extractors.textSpans(postings), gaz.locations).count())
    time("company")(Pipeline.companyTriples(Extractors.textSpans(postings), gaz.companies).count())
    time("title")(Pipeline.titleTriples(Extractors.textSpans(postings), gaz.titles).count())
    time("allTriples")(Pipeline.allTriples(postings, gaz).count())
    spark.catalog.clearCache()
    time("canonical")(Pipeline.canonicalSurfaces(Extractors.textSpans(postings), gaz.titles).count())
    val out = java.nio.file.Files.createTempDirectory("prof-out").toString
    val triples = Pipeline.allTriples(postings, gaz)
    time("writeTriples")(graft.kg.emit.TableIO.writeTriples(spark, triples, out))
    graft.kg.emit.TableIO.deleteTree(out)
    spark.stop()
  }
}
