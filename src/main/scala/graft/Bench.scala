package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // the sf tables are single small parquet files; default 128m split size
      // would scan (and run every pre-shuffle stage) on one task
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up codegen/classloading so the first timed query isn't charged
    // session startup (it was absorbing ~7s regardless of the query)
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // build the one-time artifacts (derived postings, triple store, edge
    // table, ANN indexes, dedup base state) OUTSIDE the timed rows: they are
    // standing tables at production, and charging them to whichever query
    // ran first made rows incomparable across rounds. Reported separately.
    val tp = System.nanoTime()
    // failure is an explicit boolean field, NOT a sign flip: the elapsed
    // time stays positive (so averages/comparisons stay meaningful) and a
    // failed prestage — after which timed rows silently re-absorb
    // first-touch artifact builds — is machine-visible in the JSON
    val prestageOk =
      try { SparkEntry.prestage(spark, sfDir); true }
      catch { case e: Throwable =>
        System.err.println(s"[bench] prestage FAILED: ${e.getMessage}")
        false
      }
    val prestageSec = (System.nanoTime() - tp) / 1e9
    val results = SparkEntry.queries.map { case (name, fn) =>
      spark.catalog.clearCache() // queries persist intermediates; isolate timings
      val t0 = System.nanoTime()
      // a failed query must be VISIBLE in the JSON itself (negative seconds),
      // not just on stderr — a fast failure must never read as a fast success
      val sign = try { fn(spark, sfDir).count(); 1.0 } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          -1.0
      }
      name -> sign * (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""prestage_sec":$prestageSec,"prestage_ok":$prestageOk,"sf":"$sfDir"}""")
    spark.stop()
  }
}
