package graft

import graft.operators.Versioning
import org.apache.spark.sql.functions._

/** Crafted-corpus ground truth for the snapshot-diff operator plus its
  * plan-shape promise (digest-only shuffle: text never reaches the
  * full-outer exchange). */
class VersioningSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  test("snapshotDiff classifies added/removed/changed and drops unchanged") {
    val v1 = Seq(
      (1L, "stays the same"),
      (2L, "will be edited"),
      (3L, "will be deleted")).toDF("doc_id", "text")
    val v2 = Seq(
      (1L, "stays the same"),
      (2L, "was edited"),
      (4L, "brand new")).toDF("doc_id", "text")
    val res = Versioning.snapshotDiff(v1, v2)
      .orderBy(col("doc_id")).collect()
    assert(res.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((2L, "changed"), (3L, "removed"), (4L, "added")))
    // digests present exactly on the sides that exist
    assert(!res(0).isNullAt(2) && !res(0).isNullAt(3)) // changed: both
    assert(!res(1).isNullAt(2) && res(1).isNullAt(3)) // removed: old only
    assert(res(2).isNullAt(2) && !res(2).isNullAt(3)) // added: new only
  }

  test("corpusDiffQuery counts follow the deterministic v2 derivation") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"))
    val n17 = docs.filter(col("doc_id") % 17 === 0).count()
    val n13 = docs.filter(col("doc_id") % 13 === 0 &&
      col("doc_id") % 17 =!= 0).count()
    val n29 = docs.filter(col("doc_id") % 29 === 0).count()
    val res = Versioning.corpusDiffQuery(spark, sfDir)
      .groupBy(col("status")).agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(res.getOrElse("removed", 0L) == n17)
    assert(res.getOrElse("changed", 0L) == n13)
    assert(res.getOrElse("added", 0L) == n29)
  }

  test("publish manifest: source and published files agree; loss and " +
      "corruption each break exactly the affected shard's line") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val dir = graft.sources.OrcIo.scratchDir("publish_spec") + "/corpus"
    Versioning.publishCorpus(docs, dir, nShards = 4)
    val pub = spark.read.parquet(dir)
    val m1 = Versioning.manifest(pub).collect()
    assert(m1.length == 4)
    // the consumer-side recompute (from the published FILES) equals
    // the producer-side manifest (from the source table)
    val mSrc = Versioning.manifest(
      docs.withColumn("shard", pmod(col("doc_id"), lit(4L)))).collect()
    assert(m1.map(_.toSeq).toSeq == mSrc.map(_.toSeq).toSeq)
    // digest_sum is a fixed-width zero-padded STRING (representation-
    // proof against numeric canonicalization of a >int64 value)
    def digests(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getLong(0) -> r.getString(5)).toMap
    // a lost document changes its shard's count AND digest, no other
    val lost = Versioning.manifest(pub.filter(col("doc_id") =!= 9))
      .collect()
    assert(lost.find(_.getLong(0) == 1L).get.getLong(1) ==
      m1.find(_.getLong(0) == 1L).get.getLong(1) - 1)
    assert(digests(lost)(1L) != digests(m1)(1L))
    assert((digests(lost) - 1L) == (digests(m1) - 1L),
      "unaffected shards must keep their digests")
    // a corrupted payload keeps the counts but breaks the digest
    val corrupt = Versioning.manifest(pub.withColumn("text",
      when(col("doc_id") === 10, lit("bitrot")).otherwise(col("text"))))
      .collect()
    assert(corrupt.find(_.getLong(0) == 2L).get.getLong(1) ==
      m1.find(_.getLong(0) == 2L).get.getLong(1))
    assert(digests(corrupt)(2L) != digests(m1)(2L))
    assert((digests(corrupt) - 2L) == (digests(m1) - 2L))
  }

  test("snapshotDiff shuffles digests, not text") {
    val docs = Tables.load(spark, sfDir, "documents")
    val plan = Versioning.snapshotDiff(docs, docs)
      .queryExecution.executedPlan.toString
    // Exchange lines list their output attributes: the md5 projection
    // must sit below the shuffle, so no exchange may carry the text
    val exchanges = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.nonEmpty, s"full-outer diff should shuffle:\n$plan")
    assert(!exchanges.exists(_.contains("text#")),
      s"document text flows through the shuffle:\n$exchanges")
  }

  test("incremental curate: equals full recompute, reads the cached " +
      "store, and the churn is a small fraction of the corpus") {
    val inc = Versioning.incrementalCurateQuery(spark, sfDir)
    val rows = inc.collect()
    // full recompute reference over the same derived v2
    val v1 = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val full = graft.operators.TextAnalysis.qualityOver(
      Versioning.deriveV2(v1)).orderBy(col("doc_id")).collect()
    assert(rows.map(_.toString).toSeq == full.map(_.toString).toSeq,
      "incremental result diverges from full recompute")
    // the cached half must come from the materialized v1 store
    val plan = inc.queryExecution.executedPlan.toString
    assert(plan.contains("curate_v1"),
      s"cached store not in the plan:\n$plan")
    // the refresh only pays for the churn
    val churn = Versioning.corpusDiffQuery(spark, sfDir).count().toDouble
    assert(churn / full.length < 0.35,
      s"churn fraction ${churn / full.length} too large for the gate " +
        "to demonstrate incrementality")
  }

  test("takedown: erased ids gone, keeper promotion exercised, reads " +
      "the standing keeper store") {
    val q = Versioning.takedownQuery(spark, sfDir)
    val rows = q.collect()
    // no taken-down id survives anywhere in the result
    assert(rows.forall(_.getLong(0) % 3 != 0), "erased id kept")
    // promotions really happen: originals at id ≡ 0 (mod 15) are
    // erased but their src99 mirror survives and must now hold the
    // keeper seat for that digest
    val promoted = rows.filter(r =>
      r.getString(1) == "src99" && (r.getLong(0) - 1000000L) % 15 == 0)
    assert(promoted.nonEmpty, "no keeper promotion exercised by the gate")
    // exactly one keeper per digest
    val perDigest = rows.groupBy(_.getString(2)).values.map(_.length)
    assert(perDigest.forall(_ == 1), "duplicate keeper after takedown")
    // incremental path reads the materialized keeper store
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("keepers"), s"keeper store not in plan:\n$plan")
  }

  test("corpus drift: KL non-negative everywhere (Gibbs), zero for a " +
      "single-source corpus, and text stays out of every exchange") {
    val q = Versioning.corpusDriftQuery(spark, sfDir)
    val rows = q.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("kl") >= 0.0,
        s"${r.getString(0)}: negative KL ${r.getAs[Double]("kl")}")
      assert(r.getAs[Long]("n_tok") > 0)
    }
    // a corpus with ONE source has p == q exactly -> KL == 0
    val single = Seq((1L, "one", "a b c"), (2L, "one", "c d e f"))
      .toDF("doc_id", "source", "text")
    val kl0 = Versioning.driftOver(single).collect()
    assert(kl0.length == 1 && kl0.head.getAs[Double]("kl") == 0.0,
      s"single-source KL must be exactly 0, got ${kl0.toSeq}")
    // scale shape: only (source, bucket) arithmetic rows shuffle
    val exchanges = q.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("Exchange")).toSeq
    assert(!exchanges.exists(_.contains("text#")),
      s"document text flows through an exchange:\n$exchanges")
  }

  test("scdMerge: close/version/no-op/insert/history, null-safe compare") {
    val d = (s: String) => java.sql.Date.valueOf(s)
    // key 1: will change; key 2: no-op update; key 3: untouched;
    // key 1 also carries CLOSED history that must pass through
    // untouched; key 9: attribute goes null -> value (null-safe
    // compare must see a CHANGE, not a no-op)
    val dim = Seq(
      (1L, "A", d("2019-01-01"), Option(d("2021-01-01")), false),
      (1L, "B", d("2021-01-01"), Option.empty[java.sql.Date], true),
      (2L, "C", d("2020-01-01"), Option.empty[java.sql.Date], true),
      (3L, "D", d("2020-01-01"), Option.empty[java.sql.Date], true),
      (9L, null.asInstanceOf[String], d("2020-01-01"),
        Option.empty[java.sql.Date], true))
      .toDF("k", "attr", "valid_from", "valid_to", "is_current")
    val upd = d("2024-06-01")
    val updates = Seq((1L, "B2"), (2L, "C"), (4L, "NEW"), (9L, "X"))
      .toDF("k", "attr").withColumn("upd_date", lit(upd))
    val out = Versioning.scdMerge(dim, updates, "k", Seq("attr"),
      "upd_date")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDate(2),
        Option(r.getDate(3)), r.getBoolean(4))).toSet
    val expected = Set(
      // history untouched
      (1L, "A", d("2019-01-01"), Some(d("2021-01-01")), false),
      // key 1: old current closed at updDate, new version current
      (1L, "B", d("2021-01-01"), Some(upd), false),
      (1L, "B2", upd, None, true),
      // key 2: no-op -> single unchanged current row (no phantom)
      (2L, "C", d("2020-01-01"), None, true),
      // key 3: untouched
      (3L, "D", d("2020-01-01"), None, true),
      // key 9: null -> X is a change
      (9L, null.asInstanceOf[String], d("2020-01-01"), Some(upd), false),
      (9L, "X", upd, None, true),
      // key 4: brand-new insert
      (4L, "NEW", upd, None, true))
    assert(out == expected,
      s"missing=${expected -- out}\nextra=${out -- expected}")
  }

  test("merkle: doc counts conserve, roots are 32-hex, corpus root " +
      "constant, and one changed doc perturbs exactly its own chain") {
    val rows = operators.Versioning.merkleQuery(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val nDocs = Tables.load(spark, sfDir, "documents").count()
    assert(rows.map(_.getLong(1)).sum == nDocs)
    val hex = "[0-9a-f]{32}".r
    rows.foreach { r =>
      assert(hex.matches(r.getString(3)), s"root ${r.getString(3)}")
    }
    assert(rows.map(_.getString(4)).distinct.length == 1)
    // determinism: identical rerun, bit for bit
    val again = operators.Versioning.merkleQuery(spark, sfDir).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("runDiff: deltas match the simulated curation mask, changed " +
      "chunks localize, and a self-diff reports zero change") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("source"), col("doc_id"), col("text"))
    // columns: source, n_docs_v1, n_docs_v2, n_tokens_v1,
    //          n_tokens_v2, n_chunks, chunks_changed, root_v1,
    //          root_v2, changed
    val rows = operators.Versioning.runDiffQuery(spark, sfDir).collect()
    val removedBySource = docs.filter(col("doc_id") % 13 === 0)
      .groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val src = r.getString(0)
      val removed = removedBySource.getOrElse(src, 0L)
      assert(r.getLong(1) - r.getLong(2) == removed,
        s"$src doc delta != mask count")
      assert(r.getLong(4) <= r.getLong(3))
      assert(r.getLong(6) <= r.getLong(5))
      assert(r.getBoolean(9) == (removed > 0),
        s"$src changed flag vs removed=$removed")
      if (removed == 0) {
        assert(r.getLong(6) == 0L)
        assert(r.getString(7) == r.getString(8))
      } else assert(r.getLong(6) >= 1L)
    }
    // self-diff: every source unchanged, roots equal, zero deltas
    val self = operators.Versioning.runDiff(docs, docs).collect()
    self.foreach { r =>
      assert(!r.getBoolean(9) && r.getLong(6) == 0L &&
        r.getLong(1) == r.getLong(2) && r.getString(7) == r.getString(8))
    }
  }

  test("scd2 lookup: every fact matches exactly one version " +
      "(conservation), dim broadcasts, facts never shuffle for " +
      "the join") {
    val out = Versioning.scd2LookupQuery(spark, sfDir)
    val rows = out.collect()
    val total = Tables.load(spark, sfDir, "events").count()
    assert(rows.map(_.getLong(2)).sum == total,
      "per-version counts must sum to the stream (exactly-one match)")
    // all three versions matched something (the stream straddles
    // both boundaries)
    assert(rows.map(_.getLong(0)).distinct.sorted.toSeq ==
      Seq(1L, 2L, 3L))
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"dim not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"facts shuffled to join:\n$p")
  }

  test("cross-snapshot URL dedup: newest-snapshot keep rule, exact " +
      "drop accounting, change detection hits edited pages") {
    val rows = Versioning.urlSnapDedupQuery(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nRows, nSnaps) = (r.getLong(1), r.getLong(2))
      assert(nSnaps >= 1 && nSnaps <= 2)
      assert(r.getLong(5) == nRows - 1, "n_dropped = n_rows - 1")
      // v2 keeps ~94% of docs (only %17 removed), so any URL class
      // with multiple fetches spans both snapshots and must keep
      // snap 2 — the newest-wins rule observable on real data
      if (nSnaps == 2) assert(r.getInt(3) == 2, "newest snapshot wins")
    }
    // both changed and unchanged URL classes exist: %13-edited docs
    // flip their digest, pure re-fetches don't
    assert(rows.exists(_.getBoolean(6)) && rows.exists(!_.getBoolean(6)))
    // URL canonicalization genuinely collapses fetches (the class
    // count is fixed ≤ ~336 by the mod-derivation while fetches grow
    // with the corpus: ~6x at the spec's sf0.001, growing linearly)
    val total = rows.map(_.getLong(1)).sum
    assert(rows.length.toLong * 3 < total,
      s"${rows.length} urls over $total fetches — no collapse?")
  }
}
