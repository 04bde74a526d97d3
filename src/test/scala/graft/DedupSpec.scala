package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Verifies the non-SQL-oracle-able dedup paths (minhash, simhash) against
  * the exact-Jaccard ground truth the oracle does replay. */
class DedupSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  test("exact dedup: every text maps to exactly one keeper") {
    val docs = Tables.load(spark, sfDir, "documents")
    val nTexts = docs.select(col("text")).distinct().count()
    val res = Dedup.exactQuery(spark, sfDir)
    assert(res.count() == nTexts)
    // keepers are a subset of real doc_ids and copies sum to the corpus
    val total = res.agg(sum(col("n_copies"))).as[Long].head()
    assert(total == docs.count())
  }

  test("minhash LSH finds the exact-Jaccard near-dup pairs (recall)") {
    val exact = Dedup.ngramJaccardQuery(spark, sfDir)
      .select(col("doc_a"), col("doc_b"), col("jaccard")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Dedup.minhashLshQuery(spark, sfDir)
      .select(col("doc_a"), col("doc_b"), col("est_jaccard")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // recall: high-similarity exact pairs (well above the 0.5 threshold,
    // so banding s-curve ≈ 1) must be found
    val strong = exact.filter(_._2 >= 0.7)
    assert(strong.nonEmpty, "test corpus should contain near-dups")
    val found = strong.keys.count(lsh.contains)
    assert(found.toDouble / strong.size >= 0.9,
      s"LSH recall too low: $found/${strong.size}")
    // estimator accuracy on the overlap (64 hashes → se ≈ 0.06)
    for ((pair, est) <- lsh; if exact.contains(pair)) {
      assert(math.abs(est - exact(pair)) < 0.25,
        s"estimate $est too far from exact ${exact(pair)} for $pair")
    }
  }

  test("simhash: near-dup pairs overlap exact ground truth") {
    val exactPairs = Dedup.ngramJaccardQuery(spark, sfDir)
      .filter(col("jaccard") >= 0.8)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = Dedup.simhashQuery(spark, sfDir)
      .select(col("doc_a"), col("doc_b"), col("hamming")).collect()
    val simPairs = sim.map(r => (r.getLong(0), r.getLong(1))).toSet
    sim.foreach(r => assert(r.getInt(2) <= 3))
    // simhash(hamming≤3 of 64) is a *tighter* match than jaccard 0.8 —
    // what it does return must be orderly; require it to find at least
    // one true near-dup pair if any exist, and stay deterministic
    if (exactPairs.nonEmpty)
      assert(simPairs.intersect(exactPairs).nonEmpty,
        "simhash found none of the strong near-dup pairs")
    val again = Dedup.simhashQuery(spark, sfDir)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == simPairs, "simhash must be deterministic")
  }

  test("simhash64: identical texts collide, perturbed text stays close") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "the quick brown fox jumps over the lazy cat again and again"),
    ).toDF("id", "text")
    val sigs = df.select(col("id"), Dedup.simhash64(col("text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L))
    val ham = java.lang.Long.bitCount(sigs(1L) ^ sigs(3L))
    assert(ham <= 16, s"one-token change moved $ham/64 bits")
  }

  test("jaccard DF cap: universal boilerplate doesn't generate pairs") {
    // 200 docs share an identical 6-token boilerplate header (every doc
    // contributes its shingles), then diverge into unique tails of the
    // same length (same len_bucket). Uncapped, the boilerplate shingles
    // alone put all C(200,2)=19900 pairs through the self-join; with
    // df-cap 10 those shingles are dropped and no candidate survives.
    val boiler = "this document is proprietary and confidential"
    val docs = (0 until 200).map { i =>
      val tail = (0 until 30).map(j => s"w${i}x$j").mkString(" ")
      (i.toLong, "en", s"$boiler $tail")
    }
    // plus one true near-dup pair: identical tails (and the boilerplate)
    val dupTail = (0 until 30).map(j => s"dup$j").mkString(" ")
    val all = docs ++ Seq((900L, "en", s"$boiler $dupTail"),
      (901L, "en", s"$boiler $dupTail"))
    val df = all.toDF("doc_id", "lang", "text")
    val res = Dedup.ngramJaccard(df, maxShingleDf = 10)
      .select(col("doc_a"), col("doc_b"), col("jaccard")).collect()
    // only the true dup pair survives; its capped-universe Jaccard is 1.0
    // (identical kept shingle sets)
    assert(res.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((900L, 901L)), s"got ${res.mkString(", ")}")
    assert(res.head.getDouble(2) == 1.0)
    // and the capped run must not have exploded: uncapped the same corpus
    // reports the same single ≥0.5 pair but pushes every boilerplate
    // C(200,2) pair through the join — capped output must equal uncapped
    // output here (boilerplate Jaccard ≈ 4/60 is far below threshold)
    val uncapped = Dedup.ngramJaccard(df, maxShingleDf = 1000000)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped == Set((900L, 901L)))
  }

  test("editDistVerify: Jaccard candidates get exact Levenshtein check") {
    val t1 = "the quick brown fox jumps over the lazy dog today"
    val t2 = "the quick brown fox jumps over the lazy cat today"
    val docs = Seq(
      (1L, "en", t1),
      (2L, "en", t2), // dog -> cat: 3 substitutions
      (3L, "en", "completely unrelated text sharing none of those shingles")
    ).toDF("doc_id", "lang", "text")
    val res = Dedup.editDistVerify(docs, minJaccard = 0.3, prefixLen = 400)
      .collect()
    // only the candidate pair reaches (and pays for) verification
    assert(res.length == 1, s"got ${res.mkString(", ")}")
    val r = res.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    // 10 words -> 8 3-shingles; the 2 containing "dog" differ:
    // jaccard = 6 / (8 + 8 - 6)
    assert(math.abs(r.getDouble(2) - 0.6) < 1e-9)
    assert(r.getInt(3) == 3)
    assert(math.abs(r.getDouble(4) - (1.0 - 3.0 / t1.length)) < 1e-4)
  }

  test("editDistVerify broadcasts the pair side (corpus never shuffles " +
      "for the verify join)") {
    val docs = Tables.load(spark, sfDir, "documents")
    val plan = Dedup.editDistVerify(docs).queryExecution.executedPlan
      .toString
    // the two prefix-attach joins must be broadcasts of the small pair
    // table, not sort-merge shuffles of the corpus
    assert(plan.contains("BroadcastHashJoin"),
      s"pair table must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus must not sort-merge for prefix attach:\n$plan")
  }

  test("segmentDedup strips cross-doc boilerplate, keeps unique prose") {
    // 25 docs share a boilerplate line; each carries unique prose too
    val docs = (0 until 25).map { i =>
      (i.toLong, s"unique prose number $i\ncookie banner text here\nmore unique $i")
    } :+ (100L, "entirely unique document\nwith its own lines")
    val df = docs.toDF("doc_id", "text")
    val res = Dedup.segmentDedup(df, Dedup.lineSegments(col("text")),
      minDocFreq = 20)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    // the shared line is removed from every sharing doc...
    (0 until 25).foreach { i =>
      val (nSeg, nRem, md5) = res(i.toLong)
      assert(nSeg == 3 && nRem == 1, s"doc $i: $nSeg/$nRem")
      val expected = java.security.MessageDigest.getInstance("MD5")
        .digest(s"unique prose number $i more unique $i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(md5 == expected, s"doc $i clean_md5")
    }
    // ...and the non-sharing doc is untouched
    assert(res(100L)._1 == 2 && res(100L)._2 == 0)
    // below-threshold sharing removes nothing
    val loose = Dedup.segmentDedup(df, Dedup.lineSegments(col("text")),
      minDocFreq = 30).agg(sum(col("n_removed"))).head.getLong(0)
    assert(loose == 0L)
    // wordChunks: ceil(n/k) chunks, short tail included
    val chunks = Seq((1L, "a b c d e")).toDF("doc_id", "text")
      .select(Dedup.wordChunks(col("text"), 2).as("c"))
      .head.getSeq[String](0)
    assert(chunks == Seq("a b", "c d", "e"))
  }

  test("keepFirst keeps exactly one row per key") {
    val df = Seq((1, "a", 10), (1, "b", 5), (2, "c", 7)).toDF("k", "v", "ord")
    val kept = Dedup.keepFirst(df, Seq("k"), col("ord"))
      .select(col("k"), col("v")).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(kept == Map(1 -> "b", 2 -> "c"))
  }

  test("priority dedup: one keeper per digest, always from the " +
      "highest-priority source holding that content") {
    import org.apache.spark.sql.functions._
    val kept = graft.operators.Dedup.priorityDedupQuery(spark, sfDir)
      .collect().map(r => r.getString(2) -> r.getString(1)).toMap
    val all = Tables.load(spark, sfDir, "documents")
      .select(md5(col("text")).as("d"), col("source"))
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(r =>
        r.getString(1).replaceAll("\\D", "").toInt).min).toMap
    assert(kept.nonEmpty && kept.size == all.size)
    kept.foreach { case (d, src) =>
      assert(src.replaceAll("\\D", "").toInt == all(d),
        s"digest $d kept $src, best priority was ${all(d)}")
    }
  }

  test("dupSpans: shared runs become maximal merged intervals") {
    // d1/d2 share the 7-word run at offsets 0 and 1; with k=3 its five
    // grams merge into ONE span per doc covering exactly the run.
    // d3/d4 share two 3-word runs with a 1-word gap in d3 (pos 4 > end
    // 2 + 1 → two spans) but a 0-word gap in d4 (pos 3 ≤ 2 + 1 → the
    // adjacency rule merges them into one).
    val docs = Seq(
      (1L, "the quick brown fox jumps over lazy u1 u2 u3"),
      (2L, "p2 the quick brown fox jumps over lazy s2"),
      (3L, "a b c m1 x y z"),
      (4L, "a b c x y z q4")
    ).toDF("doc_id", "text")
    val spans = Dedup.dupSpans(docs, k = 3, minDf = 1)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toList.sorted).toMap
    assert(spans(1L) == List((0L, 6L, 7L)), s"d1: ${spans(1L)}")
    assert(spans(2L) == List((1L, 7L, 7L)), s"d2: ${spans(2L)}")
    assert(spans(3L) == List((0L, 2L, 3L), (4L, 6L, 3L)), s"d3: ${spans(3L)}")
    assert(spans(4L) == List((0L, 5L, 6L)), s"d4: ${spans(4L)}")

    // the strip pass cuts exactly the span words and reassembles the
    // survivors byte-exactly (md5 of the expected remainder)
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val stripped = Dedup.dupSpanStrip(docs, k = 3, minDf = 1)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(stripped(1L) == (3L, m("u1 u2 u3")), s"d1: ${stripped(1L)}")
    assert(stripped(2L) == (2L, m("p2 s2")), s"d2: ${stripped(2L)}")
    assert(stripped(3L) == (1L, m("m1")), s"d3: ${stripped(3L)}")
    assert(stripped(4L) == (1L, m("q4")), s"d4: ${stripped(4L)}")
  }

  test("set-similarity join: prefix filtering loses no qualifying " +
      "pair (matches a brute-force scan) and respects the exact " +
      "9/10 threshold") {
    // 20 docs over a 10-token alphabet, sets of varying size — small
    // enough to brute-force, structured enough that prefixes differ
    val vocab = "abcdefghij".map(_.toString)
    val docs = (0 until 20).map { i =>
      val size = 5 + i % 6
      val toks = (0 until size).map(j => vocab((i + j * 3) % 10))
        .distinct
      (i.toLong, toks.mkString(" "))
    }
    // exact twins guarantee at least one qualifying pair
    val all = docs :+ (20L -> docs(3)._2) :+ (21L -> docs(7)._2)
    val got = Dedup.setSimJoinOver(all.toDF("doc_id", "text"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    // brute force over all pairs — same 3-gram shingle sets the
    // operator builds (sliding windows of the raw token sequence)
    val sets = all.map { case (id, t) =>
      id -> t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    }
    val want = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size.toLong
      uni = (sa | sb).size.toLong
      if inter * 2 >= uni
    } yield ((a, b), (inter, uni))).toMap
    assert(got == want,
      s"pruned != exhaustive: missing ${want.keySet -- got.keySet}, " +
        s"extra ${got.keySet -- want.keySet}")
    assert(want.nonEmpty, "trace premise: twins must qualify")
    // the twins appear with Jaccard exactly 1
    assert(got.contains((3L, 20L)) && got.contains((7L, 21L)))
    got.foreach { case ((_, _), (i, u)) => assert(i * 2 >= u) }
  }

  test("cdc chunks: every document is partitioned exactly, a JVM " +
      "replay of the rolling hash agrees, and identical docs share " +
      "all chunks") {
    // columns: doc_id, n_chunks, n_chars, min_len, max_len,
    //          shared_chunks, shared_chars
    val rows = Dedup.cdcChunkQuery(spark, sfDir).collect()
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), length(col("text")).cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(rows.length == docs.size, "one row per document")
    for (r <- rows) {
      assert(r.getLong(2) == docs(r.getLong(0)),
        s"doc ${r.getLong(0)}: chunks don't conserve the text")
      assert(r.getLong(3) >= 1 && r.getLong(3) <= r.getLong(4))
      assert(r.getLong(5) <= r.getLong(1) &&
        r.getLong(6) <= r.getLong(2))
    }
    // JVM replay of the boundary rule on a constructed frame
    def cuts(s: String): Seq[Int] = {
      val pow = Array.iterate(1L, 8)(_ * 31L)
      (0 to s.length - 8).filter { i =>
        (0 until 8).map(j => s(i + j).toLong * pow(j)).sum % 64 == 0
      }.map(_ + 8)
    }
    def chunksOf(s: String): Seq[String] = {
      val c = cuts(s)
      val bounds = (0 +: c) :+ s.length
      bounds.zip(bounds.tail).filter(p => p._2 > p._1)
        .map(p => s.substring(p._1, p._2)).filter(_.nonEmpty)
    }
    // a long synthetic string with guaranteed boundaries plus its
    // exact twin and an unrelated doc; the whole statistic —
    // including intra-document repeats, which legitimately count as
    // shared for storage dedup — is replayed in the JVM
    val base = (1 to 40).map(k => s"word$k block text unit").mkString(" ")
    val other = (1 to 40).map(k => s"zeta$k other payload").mkString("-")
    val corpus = Seq((1L, base), (2L, base), (3L, other))
    val df = corpus.toDF("doc_id", "text")
    val out = Dedup.cdcChunksOver(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    val allChunks = corpus.flatMap { case (id, t) =>
      chunksOf(t).map(c => (id, c))
    }
    val fpCount = allChunks.groupBy(_._2).view.mapValues(_.size).toMap
    for ((id, t) <- corpus) {
      val mine = allChunks.filter(_._1 == id).map(_._2)
      assert(out(id).getLong(1) == mine.length,
        s"doc $id: chunk count ${out(id).getLong(1)} != ${mine.length}")
      assert(out(id).getLong(2) == t.length)
      val shared = mine.filter(c => fpCount(c) >= 2)
      assert(out(id).getLong(5) == shared.length,
        s"doc $id: shared ${out(id).getLong(5)} != ${shared.length}")
      assert(out(id).getLong(6) == shared.map(_.length).sum)
    }
    // the twins really share every chunk
    assert(out(1L).getLong(5) == out(1L).getLong(1))
    assert(out(1L).getLong(6) == base.length)
    // premise check: the synthetic strings produced real boundaries
    assert(out(1L).getLong(1) >= 3 && out(3L).getLong(1) >= 3)
  }

  test("novelty curve: batches conserve the corpus, novel totals " +
      "equal the distinct-digest count, first batch maximally novel") {
    // columns: batch, n_docs, novel_docs, novel_micro
    val rows = Dedup.noveltyCurveQuery(spark, sfDir).collect()
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), md5(col("text")).as("fp"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.map(_.getLong(1)).sum == docs.length)
    // Σ novel across batches = one per distinct digest, corpus-wide
    assert(rows.map(_.getLong(2)).sum == docs.map(_._2).distinct.length)
    // replay one batch by hand: batch 0's novel = its distinct
    // digests (nothing arrived earlier)
    val b0 = docs.filter(_._1 / 50 == 0)
    val r0 = rows.find(_.getLong(0) == 0L).get
    assert(r0.getLong(1) == b0.length)
    assert(r0.getLong(2) == b0.map(_._2).distinct.length)
    for (r <- rows) {
      assert(r.getLong(2) <= r.getLong(1))
      assert(BigInt(r.getLong(3)) ==
        BigInt(r.getLong(2)) * 1000000 / r.getLong(1))
    }
  }

  test("lsh planner: S-curve invariants — inflection moves with r, " +
      "the committed 16x4 config is the threshold-0.5 sweet spot") {
    val rows = Dedup.lshPlanQuery(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.length == 7 && rows.forall { case (b, r, _, _, _, _) =>
      b * r == 64 })
    // inflection s* = (1/b)^(1/r) increases with rows-per-band
    val infl = rows.sortBy(_._2).map(_._3).toSeq
    assert(infl == infl.sorted,
      s"inflection not monotone: ${infl.mkString(",")}")
    rows.foreach { case (b, r, s, pt, miss, fp) =>
      // b=1 degenerates to s* = 1 exactly (all rows must match)
      assert(s > 0 && s <= 1 && pt >= 0 && pt <= 1 &&
        miss >= 0 && miss <= 1 && fp >= 0 && fp <= 1)
      // degenerate configs are visibly bad: b=64,r=1 catches
      // everything (fp ~ 1); b=1,r=64 misses everything (miss ~ 1)
      if (r == 1) assert(fp > 0.99, s"64x1 should flood: $fp")
      if (b == 1) assert(miss > 0.99, s"1x64 should starve: $miss")
    }
    // the production 16x4: inflection near 0.5, both error masses
    // bounded — the property the dedup pipeline relies on
    val prod = rows.find(p => p._1 == 16 && p._2 == 4).get
    assert(math.abs(prod._3 - 0.5) < 0.1 && prod._5 < 0.35 &&
      prod._6 < 0.35, s"16x4 no longer the sweet spot: $prod")
  }

  test("containment: every synthetic quote is fully contained in its " +
      "source, direction points small→large, and containment finds " +
      "pairs Jaccard cannot") {
    val rows = Dedup.containmentQuery(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (inter, nc, ncont) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nc <= ncont, "direction must point small→large")
      assert(inter <= nc, "intersection cannot exceed the small set")
      assert(r.getDouble(5) >= 0.8 && r.getDouble(5) <= 1.0)
      assert(r.getDouble(6) <= r.getDouble(5) + 1e-9,
        "jaccard can never exceed containment")
    }
    // each synthetic quote doc (id = source + 10^9) pairs with its
    // source at containment exactly 1.0: its DF-capped shingles are a
    // subset of the source's by construction
    val quotePairs = rows.filter(r =>
      r.getLong(0) >= 1000000000L &&
        r.getLong(1) == r.getLong(0) - 1000000000L)
    assert(quotePairs.nonEmpty, "no quote-source pair surfaced")
    quotePairs.foreach(r => assert(r.getDouble(5) == 1.0,
      s"quote ${r.getLong(0)} not fully contained"))
    // at least one quote pair is containment-only (J < 0.5): the
    // near-dup operator is structurally blind to it
    assert(quotePairs.exists(_.getDouble(6) < 0.5),
      "fixture no longer exercises containment-without-near-dup")
  }

  test("cross-lingual containment: only cross-language pairs emit, " +
      "every pseudo-translation is contained in its source, " +
      "direction and bounds hold") {
    val rows = Dedup.containmentXlingQuery(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(2) != r.getString(3),
        s"same-language pair leaked through the cross-lingual join: $r")
      val (inter, nc, ncont) = (r.getLong(4), r.getLong(5), r.getLong(6))
      assert(nc <= ncont && inter <= nc)
      assert(r.getDouble(7) >= 0.8 && r.getDouble(7) <= 1.0)
    }
    // each pseudo-translation (id = source + 2*10^9, lang 'xl') pairs
    // with its source at containment 1.0 under a different language
    val tr = rows.filter(r => r.getLong(0) >= 2000000000L &&
      r.getLong(1) == r.getLong(0) - 2000000000L)
    assert(tr.nonEmpty, "no translation-source pair surfaced")
    tr.foreach { r =>
      assert(r.getString(2) == "xl" && r.getString(3) != "xl")
      assert(r.getDouble(7) == 1.0,
        s"translation ${r.getLong(0)} not fully contained")
    }
  }

  test("minhash append: frozen-banding invariants hold and the " +
      "incremental candidate set equals the full recompute") {
    val rows = Dedup.minhashAppendQuery(spark, sfDir).collect()
    assert(rows.length == 1)
    val r = rows.head
    val nDocs = Tables.load(spark, sfDir, "documents").count()
    assert(r.getLong(0) + r.getLong(1) == nDocs,
      "index + batch must partition the corpus")
    assert(r.getLong(1) > 0, "mod-4 batch quarter is empty")
    assert(r.getBoolean(2), "fixture: no candidate crossed the split")
    assert(r.getBoolean(3), "an old-old pair leaked into the " +
      "incremental candidates — the probe side is wrong")
    assert(r.getBoolean(4), "incremental != full-recompute banding " +
      "restricted to batch-touching pairs (frozen-banding theorem)")
    assert(r.getBoolean(5) && r.getBoolean(6),
      "estimator bounds failed on append candidates")
    // determinism: the append gate is a pure function of the corpus
    val again = Dedup.minhashAppendQuery(spark, sfDir).collect().head
    assert(again == r)
  }
}
