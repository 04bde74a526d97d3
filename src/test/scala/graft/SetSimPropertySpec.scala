package graft

import graft.operators.Dedup
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/**
 * Randomized completeness property for the PPJoin set-similarity
 * join: over generated corpora with varied vocabulary sizes, document
 * lengths, and planted near-duplicates, the PRUNED search (rarity
 * prefixes + size filter + hashed shingles) must return EXACTLY the
 * pairs a brute-force shingle scan qualifies at J ≥ 1/2 — the
 * fixed-corpus DedupSpec gate, generalized: the prefix bound and the
 * size filter are theorems, so any divergence on any corpus is a bug,
 * not data dependence.
 */
class SetSimPropertySpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  /** Deterministic forAll (the EvolutionPropertySpec device). */
  private def forAll[A](gen: Gen[A])(body: A => Unit): Unit =
    (1 to 5).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private val corpusGen: Gen[Seq[(Long, String)]] = for {
    vocab <- Gen.chooseNum(5, 30)
    nDocs <- Gen.chooseNum(8, 25)
    lens <- Gen.listOfN(nDocs, Gen.chooseNum(3, 15))
    words <- Gen.listOfN(lens.sum,
      Gen.chooseNum(0, vocab - 1).map(i => s"w$i"))
    dupOf <- Gen.chooseNum(0, nDocs - 1)
    mutate <- Gen.oneOf(true, false)
  } yield {
    val it = words.iterator
    val docs = lens.zipWithIndex.map { case (l, i) =>
      (i.toLong, (0 until l).map(_ => it.next()).mkString(" "))
    }
    // plant one duplicate (optionally with a one-word mutation) so
    // the qualifying-pair set is rarely empty
    val src = docs(dupOf)._2
    val planted =
      if (mutate && src.contains(" ")) src.replaceFirst("\\S+", "w0")
      else src
    docs :+ (nDocs.toLong, planted)
  }

  test("prefix filtering loses no qualifying pair on ANY corpus " +
      "(randomized pruned-equals-exhaustive)") {
    forAll(corpusGen) { corpus =>
      val got = Dedup.setSimJoinOver(corpus.toDF("doc_id", "text"))
        .collect()
        .map(r => ((r.getLong(0), r.getLong(1)),
          (r.getLong(2), r.getLong(3)))).toMap
      val sets = corpus.map { case (id, t) =>
        id -> t.split(" ").sliding(3).map(_.mkString(" ")).toSet
      }
      val want = (for {
        (a, sa) <- sets; (b, sb) <- sets if a < b
        inter = (sa & sb).size.toLong
        uni = (sa | sb).size.toLong
        if inter * 2 >= uni
      } yield ((a, b), (inter, uni))).toMap
      assert(got == want,
        s"pruned != exhaustive on corpus of ${corpus.size}: " +
          s"missing ${want.keySet -- got.keySet}, " +
          s"extra ${got.keySet -- want.keySet}")
    }
  }
}
