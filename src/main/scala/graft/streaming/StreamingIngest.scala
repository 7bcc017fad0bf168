package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import org.apache.spark.sql.types.StructType

/** Structured Streaming ingestion path.
  *
  * The north rule (BASELINE.json:14) is a BATCH pipeline with
  * checkpoint-resume — resume is the anti-join in graft.kg.emit.TableIO, not
  * streaming state (SURVEY.md §2.2) — so streaming is deliberately NOT on the
  * KG critical path. This module exists because a corpus at 10^12 docs is
  * appended continuously in practice: the same span-exploding extraction
  * lifts onto a `readStream` source unchanged, which this demo (and its
  * spec) proves with a windowed per-kind count over the interleaved spans.
  */
object StreamingIngest {

  /** Watermarked, windowed span-kind counts over a stream of postings rows
    * paired with an event-time column.
    * Input schema: postings schema + ingest_ts timestamp.
    */
  def spanKindCounts(postings: DataFrame): DataFrame =
    postings
      .select(col("ingest_ts"), explode(col("spans")).as("s"))
      .withWatermark("ingest_ts", "10 minutes")
      .groupBy(window(col("ingest_ts"), "5 minutes"), col("s.kind").as("kind"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("kind"), col("n"))

  /** Stateful streaming ingest dedup: emit each doc_id the FIRST time it is
    * seen across micro-batches (appended corpus chunks routinely re-ship
    * documents; state = one boolean per key). This is the custom-state
    * surface (`KeyValueGroupedDataset.flatMapGroupsWithState`) the streaming
    * checklist asks for — the KG batch path itself stays anti-join resume
    * per BASELINE.json:14. At scale, put a TTL on the state
    * (GroupStateTimeout.ProcessingTimeTimeout) and back it with the exact
    * md5 key of [[graft.ops.Dedup.exact]] instead of the raw id.
    */
  def firstSeenDocs(postings: DataFrame): Dataset[String] = {
    val spark = postings.sparkSession
    import spark.implicits._
    postings.select(col("doc_id")).as[String]
      .groupByKey(identity)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (id: String, _: Iterator[String], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else { state.update(true); Iterator.single(id) }
      }
  }

  /** Drive [[firstSeenDocs]] over a parquet dir stream into a memory sink. */
  def runFirstSeen(
      spark: SparkSession, dir: String, schema: StructType, name: String): StreamingQuery =
    firstSeenDocs(spark.readStream.schema(schema).parquet(dir))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .start()

  /** Drive a parquet directory as a stream into an in-memory sink; returns
    * the query (caller: processAllAvailable() then read table `name`).
    * Output mode is `update` — the mode in which the watermark above actually
    * BOUNDS state (closed windows are dropped once the watermark passes);
    * `complete` mode would keep every window forever and grow without bound
    * on a long-running stream. The sink receives one row per
    * (window, kind) per micro-batch in which its count changed; readers take
    * the latest (= max, counts are monotone) row per key.
    */
  def runOnParquetDir(
      spark: SparkSession, dir: String, schema: StructType, name: String): StreamingQuery =
    spanKindCounts(spark.readStream.schema(schema).parquet(dir))
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName(name)
      .start()
}
