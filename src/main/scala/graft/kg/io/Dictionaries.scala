package graft.kg.io

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.kg.schema.GazEntry

/** In-code gazetteers / canonical entity tables.
  *
  * The reference ships its dictionaries as classpath resource files (job-title
  * / skill / language lists, see SURVEY.md §1.1 [B:6]); the checkout at
  * /root/reference is empty (SURVEY.md §0), so these seed dictionaries encode
  * the same *kind* of content: canonical surfaces plus near-duplicate variants
  * (for Jaro-Winkler linking + connected-components canonicalization) and
  * deliberately hot keys (for skew salting). They double as the ground truth
  * for the deterministic synthetic corpus (SyntheticCorpus) and for the
  * analytic DuckDB oracles in SparkEntry.oracleSql.
  *
  * IDs: titles T%03d, skills S%03d, languages LANG%02d, locations LOC%02d,
  * companies C%02d.
  */
object Dictionaries {

  /** (canonical surface, variant surface in gazetteer, typo surface used only
    * in the corpus — resolved via fuzzy Jaro-Winkler linking, never an exact
    * gazetteer hit).
    */
  val titles: Seq[(String, String, String)] = Seq(
    ("Software Engineer", "Software-Ingenieur", "Sofware Engineer"),
    ("Data Scientist", "Datenwissenschaftler", "Data Scienist"),
    ("Project Manager", "Projektleiter", "Projct Manager"),
    ("Business Analyst", "Wirtschaftsanalytiker", "Busines Analyst"),
    ("DevOps Engineer", "DevOps-Ingenieur", "DevOps Engineeer"),
    ("Product Owner", "Produktverantwortlicher", "Prodct Owner"),
    ("UX Designer", "UX-Gestalter", "UX Desinger"),
    ("System Administrator", "Systemadministrator", "System Adminstrator"),
    ("Security Consultant", "Sicherheitsberater", "Securty Consultant"),
    ("Frontend Developer", "Frontend-Entwickler", "Frontend Developr"),
    ("Backend Developer", "Backend-Entwickler", "Backend Develper"),
    ("Fullstack Developer", "Fullstack-Entwickler", "Fullstack Developper"),
    ("Machine Learning Engineer", "ML-Ingenieur", "Machine Lerning Engineer"),
    ("Database Administrator", "Datenbankadministrator", "Database Adminisrator"),
    ("Scrum Master", "Scrum-Meister", "Scrum Mastr"),
    ("Support Specialist", "Support-Spezialist", "Suport Specialist"),
    ("Cloud Architect", "Cloud-Architekt", "Cloud Architct"),
    ("Network Engineer", "Netzwerk-Ingenieur", "Network Enginneer"),
    ("QA Engineer", "Qualitaetsingenieur", "QA Engneer"),
    ("Software Architect", "Software-Architekt", "Sofware Architect"))

  def titleId(i: Int): String = f"T$i%03d"

  /** Hot key by construction: index 0 ("Java") receives ~20% of all skill
    * mentions in the synthetic corpus — exercises skew salting.
    */
  val skills: Seq[String] = Seq(
    "Java", "Scala", "Python", "Kotlin", "TypeScript", "Rust", "Golang",
    "Docker", "Kubernetes", "Terraform", "Ansible", "Jenkins", "React",
    "Angular", "PostgreSQL", "MongoDB", "Redis", "Kafka", "Elasticsearch",
    "GraphQL", "Linux", "Azure", "Hadoop", "Tableau", "Salesforce", "MATLAB",
    "Power BI", "SAP HANA", "Visual Basic", "Objective C")

  def skillId(i: Int): String = f"S$i%03d"

  val languages: Seq[String] =
    Seq("Deutsch", "Englisch", "Franzoesisch", "Italienisch", "Spanisch")

  def languageId(i: Int): String = f"LANG$i%02d"

  /** (plz, city) — Swiss-style locality + PLZ list. */
  val locations: Seq[(String, String)] = Seq(
    ("8005", "Zuerich"), ("3011", "Bern"), ("4051", "Basel"),
    ("1201", "Genf"), ("6003", "Luzern"), ("9000", "St. Gallen"),
    ("1003", "Lausanne"), ("2502", "Biel"), ("8400", "Winterthur"),
    ("6900", "Lugano"), ("7000", "Chur"), ("1950", "Sion"))

  def locationId(i: Int): String = f"LOC$i%02d"

  val legalForms: Seq[String] = Seq("AG", "GmbH", "SA")

  val companyNames: Seq[String] = Seq(
    "Acme", "Helvetia Tech", "Alpensoft", "Bergwerk Digital", "Crossinform",
    "Datahaus", "Edelweiss Systems", "Finova", "Glarus Digital",
    "Hirsch Consulting", "Innovatik", "Jura Solutions", "Kappa Informatik",
    "Limmat Labs", "Matterhorn Systems")

  /** Full canonical company surface incl. legal form, e.g. "Acme AG". */
  def companySurface(i: Int): String =
    s"${companyNames(i)} ${legalForms(i % legalForms.length)}"

  def companyId(i: Int): String = f"C$i%02d"

  // ---- gazetteer rows ------------------------------------------------------

  /** Titles: canonical + variant surface per entity (the corpus typo is NOT
    * here — it must link fuzzily).
    */
  val gazTitles: Seq[GazEntry] = titles.zipWithIndex.flatMap {
    case ((canon, variant, _), i) =>
      Seq(GazEntry(titleId(i), canon, canon), GazEntry(titleId(i), variant, canon))
  }

  val gazSkills: Seq[GazEntry] = skills.zipWithIndex.map { case (s, i) =>
    GazEntry(skillId(i), s, s)
  }

  val gazLanguages: Seq[GazEntry] = languages.zipWithIndex.map { case (s, i) =>
    GazEntry(languageId(i), s, s)
  }

  /** Locations: the city surface AND its 4-digit PLZ (SURVEY.md §2.1 R9:
    * Swiss locality + PLZ gazetteer) — a footer mentioning only the postal
    * code still links. PLZ surfaces start with a digit, which the
    * uppercase-first gram pre-filter admits ([A-Z0-9]).
    */
  val gazLocations: Seq[GazEntry] = locations.zipWithIndex.flatMap { case ((plz, city), i) =>
    Seq(GazEntry(locationId(i), city, city), GazEntry(locationId(i), plz, city))
  }

  val gazCompanies: Seq[GazEntry] = companyNames.indices.map { i =>
    GazEntry(companyId(i), companySurface(i), companySurface(i))
  }

  // ---- Spark-side dimension DataFrames (broadcast side) --------------------

  private def toDf(spark: SparkSession, rows: Seq[GazEntry]): DataFrame = {
    import spark.implicits._
    spark.createDataset(rows).toDF()
  }

  def titlesDf(spark: SparkSession): DataFrame = toDf(spark, gazTitles)
  def skillsDf(spark: SparkSession): DataFrame = toDf(spark, gazSkills)
  def languagesDf(spark: SparkSession): DataFrame = toDf(spark, gazLanguages)
  def locationsDf(spark: SparkSession): DataFrame = toDf(spark, gazLocations)
  def companiesDf(spark: SparkSession): DataFrame = toDf(spark, gazCompanies)
}
