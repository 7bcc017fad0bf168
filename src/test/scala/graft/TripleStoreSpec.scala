package graft

import org.apache.spark.sql.Row
import graft.kg.query.TripleStore
import graft.kg.query.TripleStore.TriplePattern

class TripleStoreSpec extends SparkTestBase {
  import spark.implicits._

  // D1: skill Java + Python, lang EN, title T1, loc L1
  // D2: skill Java, lang EN + DE, titles T1 + T2 (multi-valued bind), no loc
  // D3: skill Python only, lang EN, title T3, loc L2
  private lazy val triples = Seq(
    ("D1", "requiresSkill", "Java"), ("D1", "requiresSkill", "Python"),
    ("D1", "requiresLanguage", "EN"), ("D1", "hasTitle", "T1"),
    ("D1", "locatedIn", "L1"),
    ("D2", "requiresSkill", "Java"), ("D2", "requiresLanguage", "EN"),
    ("D2", "requiresLanguage", "DE"), ("D2", "hasTitle", "T1"),
    ("D2", "hasTitle", "T2"),
    ("D3", "requiresSkill", "Python"), ("D3", "requiresLanguage", "EN"),
    ("D3", "hasTitle", "T3"), ("D3", "locatedIn", "L2")
  ).toDF("subj", "pred", "obj")

  test("starQuery: constraints filter, binds return columns, inner semantics") {
    // Java + loc bind: D2 has no locatedIn -> dropped (inner); D3 no Java
    val r = TripleStore.starQuery(triples, Seq(
      TriplePattern("requiresSkill", obj = Some("Java")),
      TriplePattern("hasTitle", bind = Some("title")),
      TriplePattern("locatedIn", bind = Some("loc")))).collect().toSet
    assert(r === Set(Row("D1", "T1", "L1")))
  }

  test("starQuery: multi-valued bound predicate multiplies binding rows") {
    val r = TripleStore.starQuery(triples, Seq(
      TriplePattern("requiresSkill", obj = Some("Java")),
      TriplePattern("hasTitle", bind = Some("title")))).collect().toSet
    // D2 binds both its titles (SPARQL combination semantics)
    assert(r === Set(Row("D1", "T1"), Row("D2", "T1"), Row("D2", "T2")))
  }

  test("starQuery: existence-only query returns distinct matching subjects") {
    val r = TripleStore.starQuery(triples, Seq(
      TriplePattern("requiresLanguage", obj = Some("EN")),
      TriplePattern("requiresSkill", obj = Some("Python"))))
      .collect().map(_.getString(0)).toSet
    assert(r === Set("D1", "D3"))
  }

  test("starQuery: constrained binding (obj and bind on one pattern)") {
    val r = TripleStore.starQuery(triples, Seq(
      TriplePattern("hasTitle", obj = Some("T1"), bind = Some("title"))))
      .collect().toSet
    assert(r === Set(Row("D1", "T1"), Row("D2", "T1")))
  }

  test("patterns are validated: no-op pattern and duplicate binds rejected") {
    intercept[IllegalArgumentException](TriplePattern("hasTitle"))
    intercept[IllegalArgumentException](TripleStore.starQuery(triples, Seq(
      TriplePattern("hasTitle", bind = Some("x")),
      TriplePattern("locatedIn", bind = Some("x")))))
    intercept[IllegalArgumentException](TripleStore.starQuery(triples, Nil))
  }

  test("siblingQuery: object join reaches subjects the constraints don't match") {
    // D4 shares D1's city but has no skills — reachable only through the
    // object join; D2 (Java, but no locatedIn) contributes no objects
    val t = triples.union(Seq(("D4", "locatedIn", "L1"),
      ("D4", "hasTitle", "T9")).toDF("subj", "pred", "obj"))
    val r = TripleStore.siblingQuery(t, via = "locatedIn",
      constraints = Seq(TriplePattern("requiresSkill", obj = Some("Java"))))
      .collect().toSet
    assert(r === Set(Row("D1", "L1"), Row("D4", "L1")))
    // non-broadcast path: identical result
    val r2 = TripleStore.siblingQuery(t, via = "locatedIn",
      constraints = Seq(TriplePattern("requiresSkill", obj = Some("Java"))),
      broadcastObjs = false).collect().toSet
    assert(r2 === r)
    // a bind-only pattern is not a seed constraint
    intercept[IllegalArgumentException](TripleStore.siblingQuery(t,
      via = "locatedIn",
      constraints = Seq(TriplePattern("hasTitle", bind = Some("t")))))
  }

  test("predicateStats: per-predicate triple / distinct-subject / distinct-object counts") {
    val r = TripleStore.predicateStats(triples).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(r === Map(
      "requiresSkill" -> ((4L, 3L, 2L)), "requiresLanguage" -> ((4L, 3L, 2L)),
      "hasTitle" -> ((4L, 3L, 3L)), "locatedIn" -> ((2L, 2L, 2L))))
  }

  test("materialized store: per-predicate scans are partition-pruned") {
    val raw = triples
      .withColumn("score", org.apache.spark.sql.functions.lit(1.0))
      .withColumn("src_offset", org.apache.spark.sql.functions.lit(0))
    val root = TripleStore.materializedTripleTable(spark, raw, tag = "triplestorespec")
    val stored = spark.read.parquet(root)
    val q = TripleStore.starQuery(stored, Seq(
      TriplePattern("requiresSkill", obj = Some("Java")),
      TriplePattern("hasTitle", bind = Some("title"))))
    // same result off the committed layout as off the in-memory relation
    assert(q.collect().toSet ===
      Set(Row("D1", "T1"), Row("D2", "T1"), Row("D2", "T2")))
    // the production property: every pattern's scan lists only its pred=…
    // directories — the predicate selection is a PartitionFilter, not a
    // post-scan Filter over all predicates
    val plan = q.queryExecution.executedPlan.toString
    val scanFilters = "PartitionFilters: \\[[^\\]]*pred[^\\]]*\\]".r
      .findAllIn(plan).toList
    assert(scanFilters.nonEmpty, s"no pred PartitionFilters in:\n${plan.take(3000)}")
    assert(plan.contains("requiresSkill") && plan.contains("hasTitle"))
    // constraint enters as a broadcast LEFT SEMI (filters without moving
    // the bind side) and its obj selection is pushed to the parquet scan
    assert(plan.contains("LeftSemi"), s"no semi join in:\n${plan.take(3000)}")
    assert("PushedFilters: \\[[^\\]]*EqualTo\\(obj,Java\\)".r
      .findFirstIn(plan).isDefined, s"obj not pushed in:\n${plan.take(3000)}")
  }

  test("chainQuery3: 3 hops, OPTIONAL tail keeps dead-ends with NULL o3") {
    import spark.implicits._
    // D1's skill chains to a category WITH a parent (full 3 hops); D2's
    // chains to a ROOT category (dead-end after hop 2 -> NULL o3); D3's
    // skill has no category at all (dies at hop 2 under combination
    // semantics — chains, unlike stars, require every non-OPTIONAL hop)
    val t = Seq(
      ("D1", "requiresSkill", "S1"), ("D2", "requiresSkill", "S2"),
      ("D3", "requiresSkill", "S9"),
      ("S1", "is_a", "CAT1"), ("S2", "is_a", "ROOT"),
      ("CAT1", "is_a", "ROOT")).toDF("subj", "pred", "obj")
    val r = TripleStore.chainQuery3(t, "requiresSkill", "is_a", "is_a")
      .collect().map(x => (x.getString(0), x.getString(1), x.getString(2),
        Option(x.getString(3)))).toSet
    assert(r === Set(
      ("D1", "S1", "CAT1", Some("ROOT")),
      ("D2", "S2", "ROOT", None)))
    // strict (non-OPTIONAL) tail drops the dead-end row
    val strict = TripleStore
      .chainQuery3(t, "requiresSkill", "is_a", "is_a", optionalTail = false)
      .collect().map(_.getString(0)).toSet
    assert(strict === Set("D1"))
  }

  test("chainQuery3 off the committed store: hop 1 scan is partition-pruned") {
    val raw = triples
      .withColumn("score", org.apache.spark.sql.functions.lit(1.0))
      .withColumn("src_offset", org.apache.spark.sql.functions.lit(0))
    val root = TripleStore.materializedTripleTable(spark, raw, tag = "triplestorespec-c3")
    import spark.implicits._
    val ont = Seq(("Java", "is_a", "CAT_JVM"), ("CAT_JVM", "is_a", "Tech"))
      .toDF("subj", "pred", "obj")
    val q = TripleStore.chainQuery3(
      spark.read.parquet(root).select("subj", "pred", "obj").union(ont),
      "requiresSkill", "is_a", "is_a")
    assert(q.collect().nonEmpty)
    val plan = q.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*pred[^\\]]*\\]".r
      .findAllIn(plan).nonEmpty, s"no pred PartitionFilters in:\n${plan.take(3000)}")
  }

  test("propertyTable: wide row per subject, sorted multi-values, NULL/'' absences") {
    import spark.implicits._
    val t = Seq(
      ("D1", "hasTitle", "T1"), ("D1", "requiresSkill", "Scala"),
      ("D1", "requiresSkill", "Java"), ("D1", "requiresLanguage", "de"),
      ("D2", "hasTitle", "T2"), ("D2", "locatedIn", "L1"))
      .toDF("subj", "pred", "obj")
    // columns: subj, title, company, location, workload, languages, skills
    val r = TripleStore.propertyTable(t).collect()
      .map(x => x.getString(0) -> ((Option(x.getString(1)), Option(x.getString(3)),
        x.getString(5), x.getString(6)))).toMap
    assert(r("D1") === ((Some("T1"), None, "de", "Java,Scala")))
    assert(r("D2") === ((Some("T2"), Some("L1"), "", "")))
    // ONE aggregate, no per-column self-join of the store
    val plan = TripleStore.propertyTable(t).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join in:\n${plan.take(2000)}")
  }

  test("starQuery OPTIONAL: missing optional bind keeps the row with NULL") {
    import spark.implicits._
    val t = Seq(
      ("D1", "hasTitle", "T1"), ("D1", "locatedIn", "L1"),
      ("D2", "hasTitle", "T2")) // D2 has no location
      .toDF("subj", "pred", "obj")
    val r = TripleStore.starQuery(t, Seq(
      TriplePattern("hasTitle", bind = Some("title")),
      TriplePattern("locatedIn", bind = Some("loc"), optional = true)))
      .collect().map(x => (x.getString(0), x.getString(1),
        Option(x.getString(2)))).toSet
    assert(r === Set(("D1", "T1", Some("L1")), ("D2", "T2", None)))
    // an optional CONSTRAINT is rejected (it would be a no-op)
    intercept[IllegalArgumentException] {
      TriplePattern("locatedIn", obj = Some("L1"), optional = true)
    }
    // OPTIONALs need a required anchor
    intercept[IllegalArgumentException] {
      TripleStore.starQuery(t, Seq(
        TriplePattern("locatedIn", bind = Some("loc"), optional = true)))
    }
  }

  test("chainQuery: object→subject join, combination semantics") {
    import spark.implicits._
    val t = Seq(
      ("D1", "requiresSkill", "Scala"), ("D1", "requiresSkill", "Cobol"),
      ("D2", "requiresSkill", "Scala"),
      ("Scala", "is_a", "JVM"), ("Scala", "is_a", "FP")) // Cobol: no parent
      .toDF("subj", "pred", "obj")
    val r = TripleStore.chainQuery(t, "requiresSkill", "is_a").collect()
      .map(x => (x.getString(0), x.getString(1), x.getString(2))).toSet
    // multi-parent objects multiply rows (SPARQL combinations); objects
    // with no hop-2 triple drop (inner semantics)
    assert(r === Set(("D1", "Scala", "JVM"), ("D1", "Scala", "FP"),
      ("D2", "Scala", "JVM"), ("D2", "Scala", "FP")))
  }

  test("propertyTableIncrement: merge identity + untouched rows never re-derived") {
    import spark.implicits._
    val base = Seq(
      ("D1", "hasTitle", "T1"), ("D1", "requiresSkill", "Scala"),
      ("D2", "hasTitle", "T2"), ("D2", "requiresSkill", "Java"))
      .toDF("subj", "pred", "obj")
    val shard = Seq(
      ("D2", "requiresSkill", "Spark"), // touches an existing subject
      ("D3", "hasTitle", "T3")) // and adds a new one
      .toDF("subj", "pred", "obj")
    val stored = TripleStore.propertyTable(base)
    val inc = TripleStore.propertyTableIncrement(stored, base, shard)
    val scratch = TripleStore.propertyTable(base.union(shard))
    assert(inc.collect().toSet === scratch.collect().toSet,
      "incremental view must equal the from-scratch pivot over base ∪ shard")
    // pass-through proof: corrupt the COMMITTED wide row of the untouched
    // subject D1 — the corruption must survive (D1 is never re-aggregated),
    // while touched D2 and new D3 are rebuilt correctly
    val corrupted = stored.withColumn("title",
      org.apache.spark.sql.functions.when($"subj" === "D1",
        org.apache.spark.sql.functions.lit("CORRUPT")).otherwise($"title"))
    val inc2 = TripleStore.propertyTableIncrement(corrupted, base, shard)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(inc2("D1") === "CORRUPT",
      "untouched subject was re-derived — the incremental contract is broken")
    assert(inc2("D2") === "T2" && inc2("D3") === "T3")
  }

  test("describe: symmetric hop 1, outbound-only hop 2, min hop per triple") {
    val t = Seq(
      ("Java", "is_a", "SCAT0"), // seed outbound -> hop 1
      ("SCAT0", "is_a", "Skill"), // frontier outbound -> hop 2
      ("D1", "requiresSkill", "Java"), // seed inbound -> hop 1
      ("D1", "hasTitle", "T1"), // hop-1 neighbor outbound -> hop 2
      ("D2", "hasTitle", "T1"), // T1 is a hop-2 OBJECT only: D2 unreachable
      ("D3", "locatedIn", "L9") // disconnected from the seed entirely
    ).toDF("subj", "pred", "obj")
    val r = TripleStore.describe(t, Seq("Java")).collect()
      .map(x => (x.getString(0), x.getString(1), x.getString(2), x.getLong(3)))
      .toSet
    assert(r === Set(
      ("Java", "is_a", "SCAT0", 1L),
      ("D1", "requiresSkill", "Java", 1L),
      ("SCAT0", "is_a", "Skill", 2L),
      ("D1", "hasTitle", "T1", 2L)),
      "in-edges must not be followed at hop 2, and D3 must stay invisible")
    // a triple reachable at both depths reports hop 1: make D1 also a seed,
    // so (D1, hasTitle, T1) is hop-1 outbound AND hop-2 outbound-of-frontier
    val r2 = TripleStore.describe(t, Seq("Java", "D1")).collect()
      .map(x => ((x.getString(0), x.getString(1)), x.getLong(3))).toMap
    assert(r2(("D1", "hasTitle")) === 1L)
    // plan shape: the hop-2 reach is a semi join, and nothing is cartesian
    val plan = TripleStore.describe(t, Seq("Java"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"hop 2 must be a semi join:\n$plan")
    assert(!plan.contains("Cartesian"), s"cartesian in describe plan:\n$plan")
  }

  test("describe off the committed store: the seed filter is PUSHED to the scan") {
    val raw = triples
      .withColumn("score", org.apache.spark.sql.functions.lit(1.0))
      .withColumn("src_offset", org.apache.spark.sql.functions.lit(0))
    val root = TripleStore.materializedTripleTable(spark, raw, tag = "triplestorespec-d")
    import spark.implicits._
    val ont = Seq(("Java", "is_a", "CAT_JVM")).toDF("subj", "pred", "obj")
    val q = TripleStore.describe(
      spark.read.parquet(root).select("subj", "pred", "obj").union(ont),
      Seq("Java", "D1"))
    assert(q.collect().nonEmpty)
    // the scaladoc's claim, asserted: the seed lookup reaches the parquet
    // scan as a pushed OR-of-IN filter (row-group pruning), not a
    // post-scan Filter over the whole store
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [Or(In(subj"),
      s"seed IN filter not pushed to the scan in:\n${plan.take(3000)}")
  }

  test("construct: template triples per path binding, deduped, in store schema") {
    val t = Seq(
      ("D1", "requiresSkill", "Java"),
      ("D1", "requiresSkill", "Scala"),
      ("D2", "requiresSkill", "Java"),
      ("Java", "is_a", "JVM"), // D1 reaches JVM via Java AND Scala: ONE triple
      ("Scala", "is_a", "JVM"),
      ("D1", "hasTitle", "T1"), // wrong p1: no template triple
      ("T1", "is_a", "Title") // p2 row never entered through p1: unreachable
    ).toDF("subj", "pred", "obj")
    val r = TripleStore.construct(t, "requiresSkill", "is_a", "requiresCategory")
    assert(r.columns.toSeq === Seq("subj", "pred", "obj"),
      "CONSTRUCT must emit the store's own schema")
    val rows = r.collect().map(x =>
      (x.getString(0), x.getString(1), x.getString(2))).toSet
    assert(rows === Set(
      ("D1", "requiresCategory", "JVM"),
      ("D2", "requiresCategory", "JVM")),
      "two paths to the same category must collapse to one template triple")
  }

  test("askBatch: present/absent/object-constrained answers; 0 not NULL on empty") {
    val t = Seq(
      ("D1", "hasTitle", "T1"),
      ("D1", "requiresSkill", "Java")
    ).toDF("subj", "pred", "obj")
    val r = TripleStore.askBatch(t, Seq(
      ("has_any_title", "hasTitle", None),
      ("requires_java", "requiresSkill", Some("Java")),
      ("requires_cobol", "requiresSkill", Some("Cobol")),
      ("located_anywhere", "locatedIn", None)))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r === Map("has_any_title" -> 1L, "requires_java" -> 1L,
      "requires_cobol" -> 0L, "located_anywhere" -> 0L))
    // every questioned predicate absent: answers must be 0, never NULL
    val empty = TripleStore.askBatch(t, Seq(("nothing", "postedBy", None)))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(empty === Map("nothing" -> 0L))
  }
}
