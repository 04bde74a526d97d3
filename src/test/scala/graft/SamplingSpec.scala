package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

/** Deterministic-sampling invariants: membership is a pure function of
  * content (stable under repartitioning — the property `rand()`-based
  * sampling lacks), rates land near nominal, and strata are exact-size. */
class SamplingSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sfDir, "documents")

  test("hash Bernoulli sample is stable under repartitioning") {
    val once = Sampling.hashSampleQuery(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val repart = docs.repartition(13, col("lang"))
      .filter(Sampling.hashBernoulli(col("text"), 40))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(once == repart)
    assert(once.nonEmpty)
  }

  test("hash Bernoulli rate is near nominal 40/256") {
    val n = docs.count().toDouble
    val k = docs.filter(Sampling.hashBernoulli(col("text"), 40))
      .count().toDouble
    val rate = k / n
    // md5 is uniform; 3σ window for the spec corpus size
    val p = 40.0 / 256.0
    val sigma = math.sqrt(p * (1 - p) / n)
    assert(math.abs(rate - p) < 3 * sigma + 0.02,
      s"rate $rate too far from nominal $p")
  }

  test("stratified sample returns exactly min(k, stratum size) per lang") {
    val k = 5
    val sizes = Sampling.stratifiedSampleQuery(spark, sfDir, k)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == full.keySet)
    full.foreach { case (lang, n) =>
      assert(sizes(lang) == math.min(k.toLong, n),
        s"stratum $lang: got ${sizes(lang)} of $n")
    }
  }

  test("duplicate texts land on the same side of the sample boundary") {
    import SparkSpec.spark.implicits._
    val dup = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    val kept = dup.filter(Sampling.hashBernoulli(col("text"), 128))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(1L) == kept.contains(2L))
  }
}
