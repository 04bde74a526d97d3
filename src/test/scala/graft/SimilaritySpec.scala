package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  private def collectRanks(df: org.apache.spark.sql.DataFrame) =
    df.select(col("query_id"), col("neighbor_id"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap

  test("brute-force top-k: self is rank 1 with cos_sim 1") {
    val res = Similarity.annBruteForceQuery(spark, sfDir).collect()
    val byQuery = res.groupBy(_.getLong(0))
    assert(byQuery.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQuery.foreach { case (q, rows) =>
      val rank1 = rows.find(_.getInt(2) == 1).get
      assert(rank1.getLong(1) == q, s"query $q rank-1 must be itself")
      assert(rank1.getDouble(3) == 1.0)
      assert(rows.length == 10)
      // ranks strictly ordered by similarity desc
      val sims = rows.sortBy(_.getInt(2)).map(_.getDouble(3))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("LSH-bucketed ANN: self always found; results subset brute force top-50") {
    val brute = Similarity.bruteForceTopK(
      Tables.load(spark, sfDir, "embeddings").filter(col("vec_id") < 5),
      Tables.load(spark, sfDir, "embeddings"), 50)
    val bruteSet = brute.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshBucketQuery(spark, sfDir).collect()
    assert(lsh.nonEmpty)
    lsh.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.find(_.getInt(2) == 1).get.getLong(1) == q,
        s"query $q: same-bucket self match missing")
    }
  }

  test("IVF ANN: self found at rank 1 (probing its own cell)") {
    val res = Similarity.ivfTopK(spark, sfDir).collect()
    assert(res.nonEmpty)
    res.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      val rank1 = rows.find(_.getInt(2) == 1).get
      assert(rank1.getLong(1) == q && rank1.getDouble(3) == 1.0,
        s"query $q must find itself in its own IVF cell")
    }
  }

  test("LSH recall@10 vs brute force is reasonable for 12-bit buckets") {
    val brute = collectRanks(Similarity.annBruteForceQuery(spark, sfDir))
    val lsh = collectRanks(Similarity.lshBucketQuery(spark, sfDir))
    // single-probe LSH trades recall for a 4096x candidate reduction;
    // the self match plus same-bucket hits must overlap brute force
    val overlap = lsh.filter { case ((q, _), n) =>
      brute.exists { case ((bq, _), bn) => bq == q && bn == n } }
    assert(overlap.nonEmpty)
  }
}
