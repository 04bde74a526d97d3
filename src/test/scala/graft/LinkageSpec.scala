package graft

import graft.operators.Linkage
import org.apache.spark.sql.functions._

/** Entity-resolution invariants the hash gate can't express directly:
  * hand-built corner cases (typo link, block purge, non-match reject)
  * plus structural checks over the query's own output. */
class LinkageSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def rec(id: Long, src: String, name: String, acct: String) =
    (id, src, name, acct)

  test("links formatting variants and one-typo names; rejects others") {
    val records = Seq(
      rec(1L, "crm", "Ada Lovelace", "abc123"),
      // same acct suffix block, 1-char typo -> must link
      rec(2L, "web", "ada lovelace!", "ABC-123"),
      // same block, very different name -> must NOT link
      rec(3L, "app", "Grace Hopper", "xyz123"),
      // different block entirely -> singleton
      rec(4L, "crm", "Ada Lovelace", "zzz999")
    ).toDF("rec_id", "source", "name", "acct")
    val out = Linkage.resolveEntities(records).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out(1L)._1 == out(2L)._1, "variants of one entity must link")
    assert(out(1L)._1 == 1L, "entity id is the min rec_id")
    assert(out(1L)._2 == 2L)
    assert(out(3L)._1 == 3L && out(3L)._2 == 1L,
      "different name in a shared block must stay separate")
    assert(out(4L)._1 == 4L, "different block stays separate")
  }

  test("typo beyond maxEdit does not link") {
    val records = Seq(
      rec(1L, "crm", "Ada Lovelace", "abc123"),
      rec(2L, "web", "Ada LovelXXXX", "abc123")
    ).toDF("rec_id", "source", "name", "acct")
    val out = Linkage.resolveEntities(records, maxEdit = 2).collect()
    assert(out.map(_.getLong(2)).distinct.length == 2)
  }

  test("block purge: oversize blocks pair nothing, records survive") {
    val junk = (1L to 30L).map(i => rec(i, "crm", s"Name $i", "bad000"))
    val good = Seq(rec(100L, "crm", "Pat Doe", "ok1777"),
      rec(101L, "web", "pat doe", "OK-1777"))
    val records = (junk ++ good).toDF("rec_id", "source", "name", "acct")
    val out = Linkage.resolveEntities(records, maxBlock = 10).collect()
    assert(out.length == 32, "purged records still get singleton rows")
    val byId = out.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(byId(100L) == byId(101L), "small block still links")
    assert((1L to 30L).forall(i => byId(i) == i),
      "purged block must produce no links even for identical-ish names")
  }

  test("query output: partition by entity is consistent and complete") {
    val out = Linkage.entityResolveQuery(spark, sfDir).cache()
    val n = out.count()
    // every record appears exactly once
    assert(out.select(col("rec_id")).distinct().count() == n)
    // entity_id is a member rec_id and the minimum of its entity
    val bad = out.groupBy(col("entity_id"))
      .agg(min(col("rec_id")).as("mn"), count(lit(1)).as("cnt"),
        first(col("n_records")).as("nr"))
      .filter(col("mn") =!= col("entity_id") || col("cnt") =!= col("nr"))
    assert(bad.count() == 0)
    // crm is a full copy of customer, so every web/app record must have
    // linked to its crm twin: no entity contains web/app without crm
    val orphan = out.filter(col("source") =!= "crm")
      .join(out.filter(col("source") === "crm")
        .select(col("entity_id")).distinct(),
        Seq("entity_id"), "left_anti")
    assert(orphan.count() == 0, "web/app record failed to link to crm")
    out.unpersist()
  }

  test("jaro-winkler kernel replays the textbook values") {
    import SparkSpec.spark.implicits._
    // (a, b, expected to 6 dp): the canonical published examples plus
    // the edge family — window-0 transposition, boost threshold hit
    // exactly at jaro = 0.7333 with no shared prefix, empty-side zero.
    val cases = Seq(
      ("MARTHA", "MARHTA", 0.961111),
      ("DIXON", "DICKSONX", 0.813333),
      ("JELLYFISH", "SMELLYFISH", 0.896296),
      ("DUANE", "DYANE", 0.88),
      ("CRATE", "TRACE", 0.733333),
      ("apple", "apple", 1.0),
      ("abc", "xyz", 0.0),
      ("ab", "ba", 0.0),     // window 0: no in-window match at all
      ("abab", "baba", 0.833333),
      ("a", "", 0.0))
    val got = cases.map { case (a, b, _) => (a, b) }
      .toDF("a", "b")
      .select(round(call_function("graft_jaro_winkler",
        col("a"), col("b")), 6))
      .as[Double].collect()
    cases.zip(got).foreach { case ((a, b, want), v) =>
      assert(v == want, s"jw($a, $b) = $v, want $want")
    }
    // symmetry on the real corpus scorer inputs
    val sym = Seq(("DIXON", "DICKSONX")).toDF("a", "b")
      .select(
        call_function("graft_jaro_winkler", col("a"), col("b")) ===
        call_function("graft_jaro_winkler", col("b"), col("a")))
      .as[Boolean].collect().head
    assert(sym, "jaro-winkler must be symmetric")
  }

  test("damerau-levenshtein kernel: textbook cases incl. the " +
      "full-vs-OSA separator, triangle inequality spot, symmetry") {
    import SparkSpec.spark.implicits._
    val cases = Seq(
      ("CA", "ABC", 2L),     // FULL DL = 2; restricted OSA says 3
      ("ab", "ba", 1L),      // one adjacent transposition
      ("abcd", "acbd", 1L),
      ("kitten", "sitting", 3L), // pure Levenshtein territory
      ("abcdef", "abcdef", 0L),
      ("", "abc", 3L),
      ("abc", "", 3L),
      ("a cat", "an act", 2L),   // insert + transposition
      ("abcde", "edcba", 4L))    // reversal-dense
    val got = cases.map { case (a, b, _) => (a, b) }
      .toDF("a", "b")
      .select(call_function("graft_damerau", col("a"), col("b")))
      .as[Long].collect()
    cases.zip(got).foreach { case ((a, b, want), v) =>
      assert(v == want, s"dl($a, $b) = $v, want $want")
    }
    // symmetry + never exceeds max(|a|,|b|) on irregular pairs
    val pairs = Seq(("transpose", "tranpsose"), ("xy", "yxxy"),
      ("banana", "ananab"))
    pairs.foreach { case (a, b) =>
      val Seq(d1, d2) = Seq((a, b), (b, a)).toDF("a", "b")
        .select(call_function("graft_damerau", col("a"), col("b")))
        .as[Long].collect().toSeq
      assert(d1 == d2, s"dl must be symmetric on ($a, $b)")
      assert(d1 <= math.max(a.length, b.length))
    }
  }

  test("sorted neighborhood: candidate volume is exactly n*w minus " +
      "the tail truncation, bands bounded, scores in range") {
    val w = 3
    val rows = Linkage.sortedNeighborhoodQuery(spark, sfDir, w)
      .collect()
    val n = Tables.load(spark, sfDir, "customer").count()
    // ranks n-w+1..n lose 1..w partners: total = n*w - w(w+1)/2
    assert(rows.length == n * w - w * (w + 1) / 2,
      s"candidate count ${rows.length} for n=$n w=$w")
    rows.foreach { r =>
      assert(r.getLong(2) >= 1 && r.getLong(2) <= w)
      val jw = r.getDouble(3)
      assert(jw >= 0.0 && jw <= 1.0)
    }
    // skew-independence: every key appears at most 2w times
    val occur = rows.flatMap(r => Seq(r.getLong(0), r.getLong(1)))
      .groupBy(identity).map(_._2.length)
    assert(occur.max <= 2 * w, "a key exceeded its band degree")
  }
}
