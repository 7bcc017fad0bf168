package graft.kg.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Querying the MATERIALIZED knowledge graph — the basic-graph-pattern
  * (BGP) consumption side of KG construction (SURVEY.md §2: after (subj,
  * pred, obj) triples are emitted, "find postings matching these entity
  * constraints and return these bindings" is THE query users run on them;
  * the subject-star shape below is the SPARQL star BGP / vertical-
  * partitioning workload of Abadi et al., SW-Store VLDB'09).
  *
  * Physical story — the reason this lives on top of
  * [[graft.kg.emit.TableIO]]'s layout rather than a flat triple file: the
  * committed table is `partitionBy(pred, bucket)`, so every pattern's
  * per-predicate selection is a PARTITION-PRUNED scan (only the `pred=…`
  * directories are listed and read — TripleStoreSpec asserts the
  * `PartitionFilters` in the executed plan), and the `obj = …` constraint
  * is a parquet row-group pushed filter under it. At 10^12 triples a
  * pattern never touches the other predicates' bytes; a flat layout would
  * scan everything six times.
  */
object TripleStore {

  /** One pattern of a subject-star BGP. All patterns share the subject
    * variable; `obj = Some(v)` constrains the object, `bind = Some(name)`
    * returns the object as a result column `name` (both at once is a
    * constrained binding). A pattern must constrain or bind (or both) —
    * a bare predicate-existence test is `obj = None, bind = None` and is
    * rejected to keep call sites explicit (use a bind you ignore).
    */
  final case class TriplePattern(pred: String, obj: Option[String] = None,
      bind: Option[String] = None) {
    require(obj.isDefined || bind.isDefined,
      s"pattern on '$pred' neither constrains nor binds")
  }

  /** Subject-star BGP over a triple relation (columns subj, pred, obj —
    * extra columns are pruned). Result: one row per BINDING COMBINATION
    * (SPARQL semantics — multi-valued bound predicates multiply rows),
    * columns `subj` + one per bind name, inner semantics (a subject
    * missing any pattern's predicate is dropped).
    *
    * Join plan, chosen for the 10^12-triple table:
    * - constraint-only patterns become LEFT SEMI joins on subj — a
    *   constraint filters, it must never multiply rows, and semi joins
    *   keep the build side values-free. Their inputs are single-predicate
    *   single-object selections (partition-pruned + pushed-filter scans),
    *   typically the most selective relations of the query — they are
    *   broadcast (each executor filters its bind partition locally; no
    *   shuffle of the bound side) unless `broadcastConstraints = false`
    *   (set it when a constraint is a hub object like a stop-skill; the
    *   semi join then shuffles on subj like the bind joins).
    * - bind patterns chain as inner equi-joins on subj, first bind first;
    *   all shuffle on the same subj key so AQE/exchange reuse co-locates
    *   the chain after the first exchange.
    */
  def starQuery(triples: DataFrame, patterns: Seq[TriplePattern],
      broadcastConstraints: Boolean = true): DataFrame = {
    require(patterns.nonEmpty, "starQuery needs at least one pattern")
    val names = patterns.flatMap(_.bind)
    require(names.distinct.size == names.size, s"duplicate bind names: $names")
    def scan(p: TriplePattern): DataFrame = {
      val perPred = triples.where(col("pred") === p.pred)
      p.obj.fold(perPred)(o => perPred.where(col("obj") === o))
    }
    val (binds, constraints) = patterns.partition(_.bind.isDefined)
    def constrain(df: DataFrame): DataFrame =
      constraints.foldLeft(df) { (acc, c) =>
        val subjects = scan(c).select(col("subj"))
        acc.join(if (broadcastConstraints) broadcast(subjects) else subjects,
          Seq("subj"), "left_semi")
      }
    binds match {
      case Seq() =>
        // pure-existence query: the matching subjects themselves. distinct
        // AFTER the semi chain — each semi input is already per-(subj,
        // pred, obj) unique, but the seed constraint relation can repeat
        // subj only if the caller passed a pre-dedup triple relation.
        constrain(scan(constraints.head).select(col("subj"))).distinct()
      case hd +: tl =>
        val seed = constrain(
          scan(hd).select(col("subj"), col("obj").as(hd.bind.get)))
        tl.foldLeft(seed) { (acc, b) =>
          acc.join(scan(b).select(col("subj"), col("obj").as(b.bind.get)),
            Seq("subj"))
        }
    }
  }

  private val materializedTbl =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** Commit the raw (pre-dedup) triple relation once per `tag` as the
    * production `(pred, bucket)`-partitioned store
    * ([[graft.kg.emit.TableIO.writeTriplesDeduped]] — the fused
    * single-exchange dedup+layout write) and return its root path; the
    * same build-once / revalidate discipline as
    * [[graft.kg.graph.GraphOps.materializedEdgeTable]]. `spark.read
    * .parquet(root)` then carries `pred`/`bucket` as partition columns —
    * what makes [[starQuery]]'s per-predicate selections prune.
    */
  def materializedTripleTable(spark: SparkSession, rawTriples: DataFrame,
      tag: String): String = {
    def build(): String = {
      val root = java.nio.file.Files
        .createTempDirectory("graft-triplestore").toString
      graft.kg.emit.TableIO.writeTriplesDeduped(spark, rawTriples, root)
      root
    }
    val cached = materializedTbl.getOrElseUpdate(tag, build())
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(cached))) cached
    else { val fresh = build(); materializedTbl.put(tag, fresh); fresh }
  }
}
