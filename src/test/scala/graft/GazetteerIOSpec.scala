package graft

import java.nio.file.Files

import graft.kg.io.{Dictionaries, GazetteerIO}

/** File/table-backed gazetteer loading: fixed schema (never inferred),
  * prep-pass validation, parity with the in-code dictionaries. The TSV path
  * is exercised end-to-end by the `kg_skills_gaz_file` driver query (same
  * oracle as the in-code gazetteer); this spec covers the parquet path and
  * the validation contract.
  */
class GazetteerIOSpec extends SparkTestBase {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

  test("parquet round-trip preserves the gazetteer exactly") {
    val dir = Files.createTempDirectory("graft-gaz-parquet").toString
    Dictionaries.skillsDf(spark).write.mode("overwrite").parquet(dir)
    val loaded = GazetteerIO.validated(GazetteerIO.fromParquet(spark, dir), "skills parquet")
    assert(rows(loaded) ==
      Dictionaries.gazSkills.map(g => (g.entity_id, g.surface, g.canonical)).toSet)
  }

  test("TSV loader matches the in-code dictionary") {
    val loaded = GazetteerIO.fromText(spark, GazetteerIO.materializedSkillsTsv())
    assert(rows(loaded) ==
      Dictionaries.gazSkills.map(g => (g.entity_id, g.surface, g.canonical)).toSet)
  }

  test("TSV fields are verbatim between tabs: quotes in surfaces survive") {
    val dir = Files.createTempDirectory("graft-gaz-quotes")
    val f = dir.resolve("quoted.tsv")
    val entries = Seq(
      ("Q1", "\"Scare\" Quotes", "\"Scare\" Quotes"),
      ("Q2", "C \"Sharp\"", "C \"Sharp\""),
      ("Q3", "Plain", "Plain"))
    Files.write(f, entries.map { case (a, b, c) => s"$a\t$b\t$c" }
      .mkString("", "\n", "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val loaded = GazetteerIO.fromText(spark, f.toString)
    assert(rows(loaded) == entries.toSet)
  }

  test("validation rejects surfaces violating the gram pre-filter contract") {
    val s = spark
    import s.implicits._
    val bad = Seq(("X1", "lowercase surface", "lowercase surface")).toDF(
      "entity_id", "surface", "canonical")
    val e = intercept[IllegalArgumentException] {
      GazetteerIO.validated(bad, "bad gazetteer")
    }
    assert(e.getMessage.contains("must start with [A-Z0-9]"))
  }
}
