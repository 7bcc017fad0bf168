package graft

import org.apache.spark.sql.functions._

import graft.kg.expr.{functions => F}
import graft.kg.extract.Extractors
import graft.kg.io.Dictionaries
import graft.kg.schema.{PostingDoc, Span}

/** SQL registration of the custom expressions + the heading-proximity range
  * join (R7) on hand fixtures.
  */
class ExprSurfaceSpec extends SparkTestBase {

  test("custom expressions callable from SQL after register()") {
    F.register(spark)
    val r = spark.sql(
      "SELECT jaro_winkler('MARTHA', 'MARHTA') AS jw, " +
        "dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp, " +
        "l2_norm(array(3.0d, 4.0d)) AS n").head()
    assert(math.abs(r.getDouble(0) - 0.9611) < 1e-3)
    assert(r.getDouble(1) == 11.0)
    assert(r.getDouble(2) == 5.0)
  }

  test("GraftExtensions injects the same SQL surface (spark.sql.extensions path)") {
    // a brand-new session can't be built inside the shared-session test JVM,
    // but SparkSessionExtensions.registerFunctions is the exact (public)
    // call SparkSession.applyExtensions makes at build time — drive it
    // against this session's registry and the SQL surface must appear
    val reg = spark.sessionState.functionRegistry
    for (n <- Seq("jaro_winkler", "dot_product", "l2_norm"))
      reg.dropFunction(org.apache.spark.sql.catalyst.FunctionIdentifier(n))
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    org.apache.spark.sql.graft.Bridge.applyExtensionFunctions(spark, ext)
    val r = spark.sql(
      "SELECT jaro_winkler('MARTHA', 'MARHTA') AS jw, " +
        "dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp, " +
        "l2_norm(array(3.0d, 4.0d)) AS n").head()
    assert(math.abs(r.getDouble(0) - 0.9611) < 1e-3)
    assert(r.getDouble(1) == 11.0)
    assert(r.getDouble(2) == 5.0)
  }

  test("wrong arity is an analysis error naming the function, not an index crash") {
    F.register(spark)
    for ((sql, fn) <- Seq(
        "SELECT jaro_winkler('x')" -> "jaro_winkler",
        "SELECT jaro_winkler('a', 'b', 'c')" -> "jaro_winkler",
        "SELECT dot_product(array(1.0d))" -> "dot_product",
        "SELECT l2_norm()" -> "l2_norm",
        "SELECT l2_norm(array(1.0d), array(2.0d))" -> "l2_norm")) {
      val ex = intercept[Exception] { spark.sql(sql).head() }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(ex).exists(m => m.contains(fn) && m.contains("argument")),
        s"$sql should fail naming $fn, got: ${ex.getMessage}")
      assert(!ex.isInstanceOf[IndexOutOfBoundsException])
    }
  }

  test("proximity mentions: only li spans within k of the anchor match") {
    val s = spark
    import s.implicits._
    val doc = PostingDoc("px", Seq(
      Span("h1", "Anforderungen", "", 0),
      Span("li", "Java", "", 1),          // distance 1 -> in
      Span("li", "Kafka", "", 2),         // distance 2 -> in
      Span("p", "filler", "", 3),
      Span("p", "filler", "", 4),
      Span("p", "filler", "", 5),
      Span("li", "Python", "", 6)))       // distance 6 -> out at k=2
    val spansDf = Extractors.textSpans(spark.createDataset(Seq(doc)).toDF())
    val got = Extractors.proximityMentions(
      spansDf, Dictionaries.skillsDf(spark),
      anchorPredicate = col("text") === "Anforderungen", k = 2)
      .select("entity_id").collect().map(_.getString(0)).toSet
    assert(got == Set("S000", "S017"), s"got $got")
  }
}
