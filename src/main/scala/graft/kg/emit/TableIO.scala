package graft.kg.emit

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iceberg-shaped table IO over partitioned Parquet (BASELINE.json:14 targets
  * Iceberg; this sandbox ships no Iceberg runtime jar — SURVEY.md §1.3 — so
  * the layout substitutes: partition columns on disk + a per-partition
  * lineage/metrics manifest playing the role of Iceberg's manifest files.
  * State this substitution next to any reported number.)
  *
  * Layout for the `triples` table:
  * {{{
  *   <root>/pred=<p>/bucket=<b>/part-....parquet   data, hash-bucketed by subj
  *   <root>/_manifests/<p>_<b>.json              commit record (atomic rename)
  * }}}
  *
  * A partition is COMMITTED iff its manifest exists; manifests are written
  * after the data (temp file + atomic move), so a crash between data and
  * manifest leaves an uncommitted partition that a resume run simply
  * rewrites — exactly-once per partition (SURVEY.md §7.4.5).
  *
  * Resume = `left_anti` join of new triples against the committed (pred,
  * bucket) set — no Structured Streaming state, per SURVEY.md §2.2.
  */
object TableIO {

  val BucketsDefault = 16

  /** Deterministic bucket column for (pred-partitioned, subj-bucketed) output. */
  def bucketCol(buckets: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(col("subj")), lit(buckets)).cast("int")

  private def manifestDir(root: String): Path = Paths.get(root, "_manifests")

  /** Committed (pred, bucket) pairs from existing manifests. */
  def committed(root: String): Seq[(String, Int)] = {
    val dir = manifestDir(root)
    if (!Files.isDirectory(dir)) return Seq.empty
    Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.endsWith(".json"))
      .map { n =>
        val stem = n.stripSuffix(".json")
        val i = stem.lastIndexOf('_')
        (stem.substring(0, i), stem.substring(i + 1).toInt)
      }
      .toSeq
  }

  /** Drop triples belonging to already-committed partitions (resume filter). */
  def resumeFilter(spark: SparkSession, triples: DataFrame, root: String,
      buckets: Int = BucketsDefault): DataFrame = {
    val done = committed(root)
    if (done.isEmpty) triples.withColumn("bucket", bucketCol(buckets))
    else {
      import spark.implicits._
      val doneDf = done.toDF("pred_done", "bucket_done")
      triples.withColumn("bucket", bucketCol(buckets))
        .join(broadcast(doneDf),
          col("pred") === col("pred_done") && col("bucket") === col("bucket_done"),
          "left_anti")
    }
  }

  private def dropUncommitted(root: String): Unit = {
    val rootPath = Paths.get(root)
    if (!Files.isDirectory(rootPath)) return
    val done = committed(root).toSet
    Files.list(rootPath).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("pred="))
      .foreach { predDir =>
        val pred = predDir.getFileName.toString.stripPrefix("pred=")
        Files.list(predDir).iterator().asScala
          .filter(_.getFileName.toString.startsWith("bucket="))
          .filterNot(b =>
            done((pred, b.getFileName.toString.stripPrefix("bucket=").toInt)))
          .foreach(deleteRecursively)
      }
  }

  /** Recursive delete (bench cleanup). */
  def deleteTree(root: String): Unit = deleteRecursively(Paths.get(root))

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).iterator().asScala.foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }

  /** Write (or resume-write) the triples table. Returns per-partition metrics
    * of THIS run's newly committed partitions.
    */
  def writeTriples(spark: SparkSession, triples: DataFrame, root: String,
      buckets: Int = BucketsDefault, inputLineage: String = ""): Seq[PartitionManifest] = {
    val t0 = System.nanoTime()
    // crash hygiene: data directories without a manifest are uncommitted
    // leftovers of an interrupted run — drop them before re-writing, else
    // append-mode would duplicate their rows
    dropUncommitted(root)
    val pending = resumeFilter(spark, triples, root, buckets)
      // one output file per partition dir keeps the file count bounded at
      // high bucket counts; at cluster scale raise buckets, not files/bucket
      .repartition(col("pred"), col("bucket"))
    pending.write
      .mode("append")
      .partitionBy("pred", "bucket")
      .parquet(root)
    // lineage/metrics per freshly written partition (read back what we wrote:
    // the manifest must describe the bytes on disk, not the plan)
    val hasData = Files.isDirectory(Paths.get(root)) &&
      Files.list(Paths.get(root)).iterator().asScala
        .exists(_.getFileName.toString.startsWith("pred="))
    if (!hasData) return Seq.empty
    val already = committed(root).toSet
    val stats = spark.read.parquet(root)
      .groupBy(col("pred"), col("bucket"))
      .agg(count(lit(1)).as("rows"),
        coalesce(sum(hash(col("subj"), col("obj")).cast("long")), lit(0L)).as("checksum"))
      .collect()
      .map(r => ((r.getString(0), r.getInt(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    val wallSec = (System.nanoTime() - t0) / 1e9
    val fresh = stats.keySet.filterNot(already).toSeq.sorted
    val manifests = fresh.map { case (pred, bucket) =>
      val (rows, checksum) = stats((pred, bucket))
      PartitionManifest(pred, bucket, rows, checksum, wallSec, inputLineage)
    }
    Files.createDirectories(manifestDir(root))
    manifests.foreach { m =>
      val tmp = manifestDir(root).resolve(s".${m.pred}_${m.bucket}.json.tmp")
      val fin = manifestDir(root).resolve(s"${m.pred}_${m.bucket}.json")
      Files.write(tmp, m.json.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, fin,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    manifests
  }

  /** Read the committed triples back (partition-pruned by `pred` filters). */
  def readTriples(spark: SparkSession, root: String): DataFrame = {
    val done = committed(root).toSet
    val all = spark.read.parquet(root)
    if (done.isEmpty) all
    else {
      import spark.implicits._
      val doneDf = done.toSeq.toDF("pred_done", "bucket_done")
      all.join(broadcast(doneDf),
        col("pred") === col("pred_done") && col("bucket") === col("bucket_done"),
        "left_semi")
    }
  }
}

/** One partition's commit record: lineage + metrics. */
case class PartitionManifest(
    pred: String, bucket: Int, rows: Long, checksum: Long,
    wallSec: Double, inputLineage: String) {
  def json: String =
    s"""{"pred": "$pred", "bucket": $bucket, "rows": $rows,
       | "checksum": $checksum, "wall_sec": $wallSec,
       | "input": "$inputLineage",
       | "format": "parquet-iceberg-shaped"}""".stripMargin
}
