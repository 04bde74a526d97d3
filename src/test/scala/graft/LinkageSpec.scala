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
}
