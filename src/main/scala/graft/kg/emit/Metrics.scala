package graft.kg.emit

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Pipeline observability (SURVEY.md §4: `observe()` + QueryExecutionListener
  * for rows in/out per stage, accumulated into the lineage manifest).
  * `Dataset.observe` metrics ride the existing job — no extra pass over the
  * data, which is the only acceptable cost model at 10^12 rows.
  */
object Metrics {

  final class Recorder extends QueryExecutionListener {
    private val metrics = new ConcurrentHashMap[String, Row]()
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      qe.observedMetrics.foreach { case (k, v) => metrics.put(k, v) }
    override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()
    def snapshot: Map[String, Row] = metrics.asScala.toMap
    def rows(name: String): Option[Long] =
      Option(metrics.get(name)).map(_.getLong(0))
  }

  /** Register a recorder on the session; returns it for later snapshots. */
  def attach(spark: SparkSession): Recorder = {
    val r = new Recorder
    spark.listenerManager.register(r)
    r
  }

  /** Count rows flowing through this point of the plan under `name`. */
  def observeRows(df: DataFrame, name: String): DataFrame =
    df.observe(name, count(lit(1)).as("rows"))
}
