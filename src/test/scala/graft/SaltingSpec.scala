package graft

import org.apache.spark.sql.functions._

import graft.kg.link.Salting

/** Skew salting: the measured salt factor responds to key skew, and salting
  * never changes the join result (the production-path assertion is the
  * kg_skills_salted query sharing the unsalted oracle).
  */
class SaltingSpec extends SparkTestBase {

  test("measured salt factor grows with skew, 1 on uniform keys") {
    val s = spark
    import s.implicits._
    // hot key: 900 of 1000 rows on one key
    val skewed = ((1 to 900).map(i => ("hot", i.toLong)) ++
      (1 to 100).map(i => ("k" + i, i.toLong))).toDF("key", "id")
    assert(Salting.measuredSalts(skewed, "key", partitions = 16) >= 8)
    // uniform: every key once
    val uniform = (1 to 100).map(i => ("k" + i, i.toLong)).toDF("key", "id")
    assert(Salting.measuredSalts(uniform, "key", partitions = 16) == 1)
    // clamped
    assert(Salting.measuredSalts(skewed, "key", partitions = 1000, maxSalts = 64) == 64)
  }

  test("salted join == plain join on a skewed fact") {
    val s = spark
    import s.implicits._
    val fact = ((1 to 500).map(i => ("hot", i.toLong)) ++
      (1 to 50).map(i => ("cold" + (i % 5), i.toLong))).toDF("key", "id")
    val dim = Seq(("hot", "E0"), ("cold0", "E1"), ("cold3", "E2"), ("miss", "E3"))
      .toDF("surface", "entity_id")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "entity_id").collect()
        .map(r => (r.getLong(0), r.getString(1))).toList.sorted
    val salted = Salting.saltedJoin(fact, dim, "key", "surface", "id", salts = 7)
    val plain = fact.join(dim, col("key") === col("surface"))
    assert(rows(salted) == rows(plain))
  }
}
