package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Sampling, Search, TextOps}

/** Unit coverage for the data-mixing samplers and integer-BM25 retrieval
  * (their sf0.01 DuckDB oracles are the end-to-end gate; these tests pin the
  * hand-computable semantics and the scale-relevant plan shapes).
  */
class SamplingSearchSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  test("bm25TopK: hand-computed integer scores, idf reorders, no-match docs absent") {
    import spark.implicits._
    // N=4 docs, A=8 tokens, dl=2 each; df(dup)=1, df(spark)=2, df(join)=0
    val corpus = Seq(
      (1L, "dup x"), (2L, "spark x"), (3L, "spark y"), (4L, "x y"))
      .toDF("doc_id", "text")
    val rows = Search.bm25TopK(corpus, Seq("dup", "spark", "join"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // doc1: (1e4·(2·4−2·1+1)·22·1·8) div ((2·1+1)·(10·1·8+3·8+9·2·4)) = 23333
    // doc2/3: (1e4·5·22·8) div (5·176) = 10000 — the rare term outranks
    // the common one at identical tf/dl, which is idf doing its job
    assert(rows === Seq((1L, 23333L, 1L), (2L, 10000L, 1L), (3L, 10000L, 1L)))
  }

  test("bm25TopK: top-k ordering is (score desc, doc_id asc) and k bounds the output") {
    val out = Search.bm25TopK(docs, k = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length === 7)
    assert(out.sliding(2).forall { case Array((d1, s1), (d2, s2)) =>
      s1 > s2 || (s1 == s2 && d1 < d2) })
  }

  test("stratifiedSample: deterministic, rate-bounded, unknown langs dropped") {
    val a = Sampling.stratifiedSample(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val b = Sampling.stratifiedSample(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(a === b) // re-runs select the SAME rows — no RNG state
    val rates = Sampling.defaultRates.toMap
    assert(a.nonEmpty)
    assert(a.forall { case (_, lang, bucket) =>
      bucket >= 0 && bucket < rates(lang) })
    // a restricted rate table drops the other strata entirely
    val enOnly = Sampling.stratifiedSample(docs, Seq(("en", 5000L))).collect()
    assert(enOnly.nonEmpty && enOnly.forall(_.getString(1) == "en"))
  }

  test("stratifiedSample plan is map-side: broadcast join, zero shuffle exchanges") {
    val p = Sampling.stratifiedSample(docs).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("Exchange hashpartitioning"),
      s"sampling must not shuffle the corpus:\n$p")
  }

  test("repetition: hand-computed dup-token and top-bigram fractions, <2-token guard") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a a a a"),   // nd=1: dup 7500; bigram "a a" x3 of 3: ratio 10000
      (2L, "a b c d"),   // all distinct: dup 0; top bigram 1 of 3: 3333
      (3L, "x"))         // no bigram: top_n 0, ratio 0
      .toDF("doc_id", "text")
    val out = TextOps.repetition(corpus).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out(1L) === ((4L, 7500L, 3L, 10000L)))
    assert(out(2L) === ((4L, 0L, 1L, 3333L)))
    assert(out(3L) === ((1L, 0L, 0L, 0L)))
  }

  test("decontaminate: exact copy and self-match flag, disjoint doc does not") {
    import spark.implicits._
    val evalText = "q w e r t y u i o p" // 10 tokens -> 6 distinct 5-grams
    val corpus = Seq(
      (3L, evalText),                  // the eval doc (3 % 97 == 3)
      (5L, evalText),                  // exact copy: common = eval_n = 6
      (7L, "q w e r t y z z2 z3 z4"),  // shares 2 of 6 shingles: below 50%
      (9L, "m n b v c x l k j h"))     // disjoint
      .toDF("doc_id", "text")
    val out = TextOps.decontaminate(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out === Set((3L, 3L, 6L, 6L), (5L, 3L, 6L, 6L)))
  }

  test("bm25/decontaminate plan shapes: top-k never a global sort, overlap never cartesian") {
    val p1 = Search.bm25TopK(docs).queryExecution.executedPlan.toString
    assert(p1.contains("TakeOrderedAndProject"), s"bm25 top-k must not global-sort:\n$p1")
    val p2 = TextOps.decontaminate(docs).queryExecution.executedPlan.toString
    assert(!p2.contains("CartesianProduct") && !p2.contains("BroadcastNestedLoopJoin"),
      s"decontaminate must stay an equi-join on the shingle key:\n$p2")
    assert(p2.contains("BroadcastHashJoin"))
  }

  test("stratifiedTopK == unsalted single-window reference ranking") {
    val salted = Sampling.stratifiedTopK(docs, k = 15, salts = 8).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val withB = docs.select(col("doc_id").cast("long").as("doc_id"), col("lang"))
      .withColumn("bucket",
        conv(substring(md5(concat(lit("smp:"), col("doc_id").cast("string"))), 1, 15), 16, 10)
          .cast("long") % 10000L)
    val w = Window.partitionBy(col("lang")).orderBy(col("bucket").asc, col("doc_id").asc)
    val ref = withB.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 15)
      .select(col("doc_id"), col("lang"), col("rank").cast("long").as("rank"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(salted === ref)
  }

  test("tokenBudget: two-phase bucket histogram == naive running-prefix definition") {
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Long, Long)] =
      df.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val budget = 600L
    val got = rows(Sampling.tokenBudget(docs, budget))
    // naive reference: ONE running-total window per source (the stratum-sized
    // sort the two-phase plan exists to avoid)
    val base = docs.select(col("doc_id").cast("long").as("doc_id"), col("source"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      conv(substring(md5(concat(lit("bud:"), col("doc_id").cast("string"))), 1, 15), 16, 10)
        .cast("long") % 10000L as "bucket")
    val w = Window.partitionBy(col("source")).orderBy(col("bucket").asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = rows(base.withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .where(col("cum_tokens") <= budget)
      .select(col("doc_id"), col("source"), col("n_tokens"), col("cum_tokens")))
    assert(got === ref)
    // the budget binds: every source's kept prefix fits, is non-empty on this
    // corpus, and is MAXIMAL (the reference's first excluded doc overflows —
    // implied by set equality; spot-check the fit here)
    assert(got.nonEmpty)
    assert(got.forall(_._4 <= budget))
    val perSource = got.groupBy(_._2).view.mapValues(_.map(_._4).max)
    perSource.foreach { case (src, m) => assert(m <= budget, s"$src overflows: $m") }
  }

  test("qualityTopP: histogram threshold == naive whole-stratum ranking definition") {
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Long)] =
      df.select("doc_id", "lang", "quality_e4").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val got = rows(TextOps.qualityTopP(docs))
    // naive reference: rank each whole language, v = the k-th doc's quality,
    // keep quality >= v (boundary ties kept)
    val q = TextOps.quality(docs).select(col("doc_id"), col("quality_e4"))
      .join(docs.select(col("doc_id").cast("long").as("doc_id"), col("lang")), "doc_id")
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("quality_e4").desc, col("doc_id").asc)
    val n = q.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val v = q.join(n, "lang").withColumn("rk", row_number().over(w))
      .where(col("rk") <= expr("n div 2"))
      .groupBy(col("lang")).agg(min(col("quality_e4")).as("v"))
    val ref = rows(q.join(v, "lang").where(col("quality_e4") >= col("v")))
    assert(got === ref)
    // the cut keeps at least half of every stratum (ties only ADD docs) and
    // strictly less than all of it on this corpus
    val total = docs.groupBy(col("lang")).count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    got.groupBy(_._2).foreach { case (lang, kept) =>
      assert(kept.size >= total(lang) / 2, s"$lang kept ${kept.size}/${total(lang)}")
      assert(kept.size < total(lang), s"$lang kept everything")
    }
  }

  test("gopherFilter: each rule fires on its planted violator, clean doc keeps") {
    import spark.implicits._
    // 46 distinct 4+-char fillers + both stopwords: passes every rule
    val filler = (1 to 46).map(i => s"tok$i")
    val clean = (filler ++ Seq("the", "a")).mkString(" ")
    // 20 tokens: under the 40 floor but long enough (nt ≥ 14) that a unique
    // top bigram stays under the 0.08 ratio — f_len fires alone
    val short = (Seq("the", "a") ++ (1 to 18).map(i => s"tok$i")).mkString(" ")
    val noStop = (1 to 48).map(i => s"tok$i").mkString(" ")   // f_stop only
    // 2-char distinct tokens + the two stopwords: mean len < 3 (f_mwl);
    // 'a' drags the mean further down, everything else passes
    val thin = ((1 to 46).map(i => f"${('a' + i / 26).toChar}${('a' + i % 26).toChar}") ++
      Seq("th", "the", "a")).mkString(" ")
    // "xx yy" ×5 → top bigram 5/47 > 0.08, but only 8/48 dup tokens
    val loop = (Seq.fill(5)("xxxx yyyy") ++ (1 to 36).map(i => s"tok$i") ++
      Seq("the", "a")).mkString(" ")
    // 46 copies of one token: dup (and trivially bigram) fire
    val dup = (Seq.fill(46)("zzzz") ++ Seq("the", "a")).mkString(" ")
    val corpus = Seq(1L -> clean, 2L -> short, 3L -> noStop, 4L -> thin,
      5L -> loop, 6L -> dup).toDF("doc_id", "text")
    val out = TextOps.gopherFilter(corpus).collect().map(r => r.getLong(0) ->
      ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7)))).toMap
    assert(out(1L) === ((0L, 0L, 0L, 0L, 0L, 1L)), s"clean: ${out(1L)}")
    assert(out(2L) === ((1L, 0L, 0L, 0L, 0L, 0L)), s"short: ${out(2L)}")
    assert(out(3L) === ((0L, 0L, 1L, 0L, 0L, 0L)), s"noStop: ${out(3L)}")
    assert(out(4L) === ((0L, 1L, 0L, 0L, 0L, 0L)), s"thin: ${out(4L)}")
    assert(out(5L) === ((0L, 0L, 0L, 0L, 1L, 0L)), s"loop: ${out(5L)}")
    assert(out(6L)._4 === 1L && out(6L)._6 === 0L, s"dup: ${out(6L)}")
  }

  test("sourceGate: bad-mean source and thin source drop, their docs vanish") {
    import spark.implicits._
    // quality_e4 = (1-stop_ratio)*min(nt,64)/64: 64 non-stop tokens → 10000,
    // all-stopword docs → 0
    val good = (1 to 64).map(i => s"tok$i").mkString(" ")
    val bad = Seq.fill(8)("the a und mit").mkString(" ")
    val rows =
      (1 to 10).map(i => (i.toLong, good, "srcA")) ++
      (11 to 20).map(i => (i.toLong, bad, "srcB")) ++
      (21 to 22).map(i => (i.toLong, good, "srcC")) // < minDocs
    val corpus = rows.toDF("doc_id", "text", "source")
    val out = TextOps.sourceGate(corpus).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.length === 10)
    assert(out.forall { case (id, src, n, m) =>
      id <= 10 && src == "srcA" && n == 10L && m == 10000L })
  }

  test("bpePairs: exact pair counts, deterministic (cnt desc, pair asc) order") {
    import spark.implicits._
    val corpus = Seq((1L, "a b a b"), (2L, "c d"), (3L, "x")).toDF("doc_id", "text")
    val out = TextOps.bpePairs(corpus, k = 2).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out === Seq(("a b", 2L), ("b a", 1L)))
    val p = TextOps.bpePairs(docs).queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k, not a sort:\n$p")
  }

  test("redactPii: emails and phones become placeholders, clean text untouched") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "bewerben an hr.lead+jobs@some-firm.ch oder +41 79 123 45 67 heute"),
      (2L, "zwei adressen a@b.de und c.d@e-f.org"),
      (3L, "kein kontakt hier 2024 worte")).toDF("doc_id", "text")
    val r = TextOps.redactPii(corpus).collect()
      .map(x => x.getLong(0) -> ((x.getString(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r(1L) === (("bewerben an <EMAIL> oder <PHONE> heute", 1L, 1L)))
    assert(r(2L) === (("zwei adressen <EMAIL> und <EMAIL>", 2L, 0L)))
    assert(r(3L) === (("kein kontakt hier 2024 worte", 0L, 0L)), "clean text must pass through")
    // zero-shuffle scan shape: no exchange anywhere in the plan
    val plan = TextOps.redactPii(corpus).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("weightedTopK: salted bottom-k == naive window; key is min of w independent draws") {
    val got = Sampling.weightedTopK(docs, k = 15, salts = 8).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    // naive reference: recompute the replication key with an INDEPENDENT
    // implementation (JVM MD5, not the Spark expression) and rank each
    // whole language in one window
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d.substring(0, 15), 16)
    }
    val ref = docs.select(col("doc_id").cast("long"), col("lang"), col("text"))
      .collect()
      .map { r =>
        val (id, lang, text) = (r.getLong(0), r.getString(1), r.getString(2))
        val w = math.min(math.max(text.split(" ", -1).length / 20, 1), 8)
        val key = (1 to w).map(rr => h60(s"wsmp:$id:$rr")).min
        (id, lang, w.toLong, key)
      }
      .groupBy(_._2).iterator.flatMap { case (_, rows) =>
        rows.sortBy(t => (t._4, t._1)).take(15).zipWithIndex
          .map { case ((id, lang, w, _), i) => (id, lang, w, (i + 1).toLong) }
      }.toSet
    assert(got === ref)
    // weights vary on this corpus (the length term is live, 10–99 tokens
    // at sf0.001 → w in [1, 4]) and respect the clamp
    assert(got.map(_._3).toSeq.distinct.size > 1)
    assert(got.map(_._3).forall(w => w >= 1L && w <= 8L))
    // one projection computes the key: no explode-style Generate in the plan
    val plan = Sampling.weightedTopK(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"), s"unexpected row fan-out in:\n$plan")
  }

  test("weightedTopK: the PRODUCTION key is monotone non-increasing in weight") {
    // construction property, not statistics: raising a doc's weight can only
    // LOWER its min-key — evaluated through Sampling.wsmpKey (the exact
    // expression weightedTopK ranks on), at every (doc, weight) pair, so a
    // regression in the production min-of-w construction (wrong salt, wrong
    // sequence bound) fails HERE, not only in the big equivalence fixture
    import spark.implicits._
    val grid = (for (id <- 1L to 50L; w <- 1L to 8L) yield (id, w))
      .toDF("doc_id", "weight")
    val keys = grid.withColumn("skey", Sampling.wsmpKey).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (id <- 1L to 50L; w <- 1L to 7L)
      assert(keys((id, w + 1)) <= keys((id, w)),
        s"min-key must be monotone non-increasing in w (doc $id, w=$w)")
    // and the draw itself matches an independent JVM MD5 at w = 1
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d.substring(0, 15), 16)
    }
    for (id <- 1L to 50L)
      assert(keys((id, 1L)) === h60(s"wsmp:$id:1"))
  }

  test("mixtureBudget: budgets realize the target shares; kept == naive prefix") {
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Long, Long, Long)] =
      df.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val got = rows(Sampling.mixtureBudget(docs))
    // budgets: recompute the binding-stratum fixed point independently
    val avail = docs.select(col("lang"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .groupBy("lang").agg(sum("n").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = Sampling.defaultShares
      .map { case (l, s) => avail.getOrElse(l, 0L) * 10000L / s }.min
    val budgets = Sampling.defaultShares
      .map { case (l, s) => l -> s * total / 10000L }.toMap
    got.groupBy(_._2).foreach { case (lang, ks) =>
      assert(ks.forall(_._5 == budgets(lang)), s"budget mismatch for $lang")
      assert(ks.map(_._4).max <= budgets(lang), s"$lang overflows its budget")
    }
    // naive reference: one running-prefix window per language
    val base = docs.select(col("doc_id").cast("long").as("doc_id"), col("lang"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      conv(substring(md5(concat(lit("mix:"), col("doc_id").cast("string"))), 1, 15), 16, 10)
        .cast("long") % 10000L as "bucket")
    val w = Window.partitionBy(col("lang")).orderBy(col("bucket").asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = base.withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(4)))
      .filter { case (_, lang, _, cum) => cum <= budgets(lang) }
      .map { case (id, lang, n, cum) => (id, lang, n, cum, budgets(lang)) }
      .toSet
    assert(got === ref)
    // the binding stratum nearly exhausts its budget (a doc-sized remainder)
    val slack = got.groupBy(_._2).map { case (lang, ks) =>
      budgets(lang) - ks.map(_._4).max }
    assert(slack.min < 200L, s"no stratum binds: slack=$slack")
  }

  test("mixtureBudget: a share language absent from the corpus empties the result") {
    import spark.implicits._
    val corpus = Seq((1L, "a b c d", "en"), (2L, "e f", "de"))
      .toDF("doc_id", "text", "lang")
    assert(Sampling.mixtureBudget(corpus).isEmpty,
      "zh/es/fr availability is 0, so the mixture total must bind to 0")
  }
}
