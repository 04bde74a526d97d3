package graft

import graft.operators.{Sampling, TextAnalysis}
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  test("rollingHash matches a code-point Scala reference implementation") {
    // Code-point fold (not UTF-16 code units): supplementary characters
    // hash as one code point, matching the DuckDB oracle's
    // string_split(text, '') semantics.
    def ref(s: String): Long = {
      var h = 0L; var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        h = (h * 131L + cp) % 1000000007L
        i += Character.charCount(cp)
      }
      h
    }
    val samples = Seq("", "a", "hello world", "The quick brown fox! 123",
      "café 你好", "non-BMP 😀 emoji 🤖")
    val got = samples.toDF("text")
      .select(TextAnalysis.rollingHash(col("text"))).as[Long].collect()
    assert(got.toSeq == samples.map(ref))
    // seeded pseudo-random strings, mixed BMP/non-BMP
    val rng = new scala.util.Random(42)
    val rand = (1 to 50).map { _ =>
      (1 to rng.nextInt(40)).map { _ =>
        val cp = rng.nextInt(0x2F000) match {
          case c if c >= 0xD800 && c <= 0xDFFF => 'x'.toInt // skip surrogates
          case c => c
        }
        new String(Character.toChars(cp))
      }.mkString
    }
    val gotR = rand.toDF("text")
      .select(TextAnalysis.rollingHash(col("text"))).as[Long].collect()
    assert(gotR.toSeq == rand.map(ref))
  }

  test("token stats on a crafted document") {
    val df = Seq((1L, "alpha beta42 GAMMA x")).toDF("doc_id", "text")
    val row = df.select(
      length(col("text")).as("n_chars"),
      size(TextAnalysis.tokens(col("text"))).as("n_tok"),
      size(expr("regexp_extract_all(text, '[a-z0-9]+', 0)")).as("n_word"))
      .head()
    assert(row.getInt(0) == 20)
    assert(row.getInt(1) == 4)
    assert(row.getInt(2) == 3) // alpha, beta42, x — GAMMA is uppercase
  }

  test("language ID picks the language with most indicator hits") {
    val res = TextAnalysis.langIdQuery(spark, sfDir)
    assert(res.columns.toSeq ==
      Seq("doc_id", "lang_declared", "lang_predicted"))
    val preds = res.select(col("lang_predicted")).distinct()
      .as[String].collect().toSet
    assert(preds.subsetOf(Set("en", "de", "es", "fr", "und")))
    // the synthetic corpus text is English-ish tokens regardless of its
    // randomly-assigned `lang` column, so agreement with the declared
    // lang is meaningless — instead assert the voting rule directly on
    // crafted rows (exact per-row parity vs DuckDB is covered by the
    // q_lang_id oracle)
    val crafted = Seq(
      "the cat and the dog of the house",   // en indicators dominate
      "der hund und das haus und der baum", // de
      "el coche los gatos que corren",      // es
      "le chien les chats est grand",       // fr
      "zzz qqq www").toDF("text")
      .withColumn("doc_id", monotonically_increasing_id())
      .withColumn("lang", lit("xx"))
    crafted.createOrReplaceTempView("langid_crafted")
    val got = TextAnalysis.langIdOver(crafted)
      .orderBy(col("doc_id")).select(col("lang_predicted"))
      .as[String].collect().toSeq
    assert(got == Seq("en", "de", "es", "fr", "und"))
  }

  test("langId2: hashed char-trigram NB matches an independent Scala " +
      "refit — scores, argmax, tie-break, and the 'und' fallback") {
    // fixture: ids 10/20 are the train slice (doc_id % 10 == 0), one
    // per language; 'zz' text is too short for a trigram -> 'und'
    val fixture = Seq(
      (10L, "en", "the cat sat on the mat and the dog barked"),
      (20L, "de", "der hund und die katze und das haus und der baum"),
      (11L, "en", "the cat and the dog"),
      (21L, "de", "der hund und das haus"),
      (30L, "fr", "le chien est grand"), // train doc, third language
      (99L, "xx", "zz"))                 // no trigram -> und
    val docs = fixture.toDF("doc_id", "lang", "text")
    val got = TextAnalysis.langId2Over(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2),
        Option(r.getString(3)), r.getLong(4)))).toMap

    // independent reimplementation: same trigrams, md5 bucket,
    // add-one NB fit on the %10==0 slice, 10-dp floored logs summed
    // exactly as BigDecimal, argmax with lexicographic tie-break
    def buckets(text: String): Seq[Long] = {
      val pref = text.take(96)
      if (pref.length < 3) Seq()
      else (0 to pref.length - 3).map { i =>
        val g = pref.substring(i, i + 3)
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex.substring(0, 6), 16) % 64L
      }
    }
    def fr10(x: Double): BigDecimal =
      BigDecimal(math.floor(x * 1e10 + 0.5)) / BigDecimal(1e10)
    val train = fixture.filter(_._1 % 10 == 0)
    val cnt = train.flatMap(d => buckets(d._3).map(b => (d._2, b)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tot = train.map(d => d._2 -> buckets(d._3).size.toLong)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val prior = train.groupBy(_._2).view.mapValues(_.size).toMap
    def score(text: String): Option[(String, BigDecimal, Long)] = {
      val bs = buckets(text)
      if (bs.isEmpty) None
      else Some(tot.keys.toSeq.sorted.map { l =>
        val s = bs.map(b => fr10(math.log(
          (cnt.getOrElse((l, b), 0L) + 1.0) / (tot(l) + 64.0)))).sum +
          fr10(math.log(prior(l).toDouble / train.size))
        (l, s, bs.size.toLong)
      }.minBy { case (l, s, _) => (-s, l) }(
        Ordering.Tuple2(Ordering[BigDecimal], Ordering[String])))
    }
    fixture.foreach { case (id, lang, text) =>
      val (gl, gp, gs, gn) = got(id)
      assert(gl == lang)
      score(text) match {
        case None =>
          assert(gp == "und" && gs.isEmpty && gn == 0L,
            s"doc $id should fall back to und: ${got(id)}")
        case Some((l, s, n)) =>
          assert(gp == l, s"doc $id predicted $gp, expected $l")
          assert(gn == n, s"doc $id n_tri $gn, expected $n")
          assert(BigDecimal(gs.get) == s,
            s"doc $id score ${gs.get}, expected $s")
      }
    }
    // confusion vs declared on the fixture: the en/de train docs
    // share no trigram vocabulary, so the held-out en/de docs must
    // classify correctly (the model is real, not a constant)
    assert(got(11L)._2 == "en" && got(21L)._2 == "de",
      s"held-out fixture docs misclassified: $got")
  }

  test("langId2 on the gate corpus: predictions come from the train " +
      "langs, n_tri tracks the prefix, score parses as a decimal") {
    val rows = TextAnalysis.langId2Query(SparkSpec.spark, sfDir).collect()
    val docs = Tables.load(SparkSpec.spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val trainLangs = docs.filter(_._1 % 10 == 0).map(_._2).toSet
    assert(rows.length == docs.length)
    rows.foreach { r =>
      val pred = r.getString(2)
      assert(pred == "und" || trainLangs.contains(pred),
        s"prediction $pred outside the refit language set")
      if (pred != "und") {
        assert(BigDecimal(r.getString(3)) < 0,
          "NB log-score must be negative")
        assert(r.getLong(4) >= 1L)
      }
    }
    // declared-language agreement is data-dependent (the synthetic
    // corpus draws every language from one vocabulary) but the
    // classifier must not be constant: at sf>=0.01 the train slice
    // has >=2 languages, so a constant prediction means the prior
    // swamped the likelihood
    if (docs.length >= 400)
      assert(rows.map(_.getString(2)).distinct.length >= 2,
        "classifier collapsed to a constant prediction")
  }

  test("quality score is bounded and ratios are in [0,1]") {
    val res = TextAnalysis.qualityQuery(spark, sfDir)
      .select(col("stopword_ratio"), col("short_ratio"),
        col("distinct_ratio"), col("quality_score")).collect()
    assert(res.nonEmpty)
    res.foreach { r =>
      (0 until 3).foreach { i =>
        val v = r.getDouble(i)
        assert(v >= 0.0 && v <= 1.0, s"ratio $i out of range: $v")
      }
      val q = r.getDouble(3)
      assert(q >= 0.0 && q <= 1.0, s"quality out of range: $q")
    }
  }

  test("winnowing: shared >= w+k-1 word run guarantees a shared " +
      "fingerprint; disjoint texts share none") {
    // k=3, w=4: any common run of 6+ words must yield a common
    // window-min (the winnowing guarantee, Schleimer et al. §3)
    val shared = "one two three four five six" // exactly w+k-1 = 6 words
    val docs = Seq(
      (1L, s"alpha beta $shared gamma delta"),
      (2L, s"epsilon zeta eta $shared theta"),
      (3L, "iota kappa lambda mu nu xi omicron pi rho sigma")
    ).toDF("doc_id", "text")
    val fps = docs
      .select(col("doc_id"), TextAnalysis.winnow(col("text")).as("fp"))
      .as[(Long, Seq[Long])].collect().toMap
    assert((fps(1L).toSet intersect fps(2L).toSet).nonEmpty,
      "docs sharing a 6-word run must share a fingerprint")
    assert((fps(1L).toSet intersect fps(3L).toSet).isEmpty,
      "fully disjoint vocabularies must not collide")
    // determinism + distinctness + sortedness of the selected set
    assert(fps(1L) == fps(1L).distinct.sorted)
  }

  test("winnowing compresses: n_fp well below n_grams on real docs") {
    val res = TextAnalysis.winnowQuery(spark, sfDir)
      .select(col("n_grams"), col("n_fp")).collect()
    assert(res.nonEmpty)
    // expected density is 2/(w+1) = 0.4; allow generous slack but
    // require real compression on docs long enough to have windows
    val big = res.filter(_.getInt(0) >= 50)
    assert(big.nonEmpty)
    big.foreach { r =>
      val ratio = r.getInt(1).toDouble / r.getInt(0).toDouble
      assert(ratio < 0.8, s"no compression: ${r.getInt(1)}/${r.getInt(0)}")
    }
    // degenerate inputs still fingerprint (>= 1)
    res.foreach(r => assert(r.getInt(1) >= 1))
  }

  test("winnowContamination flags the doc embedding an eval substring") {
    val evalSet = Seq((100L, "the secret benchmark answer is forty two"))
      .toDF("doc_id", "text")
    val train = Seq(
      // embeds a 7-word run (>= w+k-1 = 6) from the eval doc
      (1L, "padding words the secret benchmark answer is forty two more padding"),
      (2L, "entirely unrelated content with no overlap whatsoever here")
    ).toDF("doc_id", "text")
    val res = TextAnalysis.winnowContamination(train, evalSet)
      .collect()
    assert(res.map(_.getLong(0)).toSeq == Seq(1L),
      s"got ${res.mkString(", ")}")
    assert(res.head.getLong(2) >= 1) // at least one shared fingerprint
    // plan shape: eval fingerprints broadcast, corpus never sort-merges
    val plan = TextAnalysis.winnowContamination(train, evalSet)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"eval fingerprint set must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"training corpus must not shuffle for the join:\n$plan")
  }

  test("winnow short inputs: fewer words than k, fewer grams than w") {
    val docs = Seq((1L, "solo"), (2L, "two words"),
      (3L, "exactly three words"), (4L, "now four whole words"))
      .toDF("doc_id", "text")
    val fps = docs
      .select(col("doc_id"), TextAnalysis.winnow(col("text")).as("fp"))
      .as[(Long, Seq[Long])].collect().toMap
    // < k words -> one gram of all words -> one fingerprint
    assert(fps(1L).length == 1 && fps(2L).length == 1)
    // 3 words -> 1 gram; 4 words -> 2 grams, 1 window -> 1 min
    assert(fps(3L).length == 1)
    assert(fps(4L).length == 1)
  }

  test("lmScoreOver matches a hand-computed smoothed bigram model") {
    // Reference slice = doc 0 only: "a b a b a c".
    // Context counts c1: a->3 (ab,ab,ac), b->2 (ba,ba); vocab V
    // (distinct w2 in slice) = {b,a,c} = 3. minCount=2 prunes (a,c)
    // [count 1], keeps (a,b)=2 and (b,a)=2.
    val docs = Seq(
      (0L, "a b a b a c"), // in-model doc
      (1L, "a b"),         // single kept bigram
      (2L, "z q")          // fully OOV
    ).toDF("doc_id", "text")
    val got = TextAnalysis
      .lmScoreOver(docs, col("doc_id") === 0L)
      .select(col("doc_id"), col("n_bigrams"), col("avg_logp"))
      .as[(Long, Long, Double)].collect()
      .map { case (k, n, lp) => k -> ((n, lp)) }.toMap
    val a = 0.1; val v = 3.0
    def term(c2: Long, c1: Long): Double =
      BigDecimal(math.log((c2 + a) / (c1 + a * v)))
        .setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
    def avg(ts: Seq[Double]): Double =
      BigDecimal(ts.map(BigDecimal(_)).sum.toDouble / ts.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 0: ab, ba, ab, ba, ac(pruned -> c2=0)
    assert(got(0L) == ((5L,
      avg(Seq(term(2, 3), term(2, 2), term(2, 3), term(2, 2),
        term(0, 3))))))
    // doc 1: one kept bigram
    assert(got(1L) == ((1L, avg(Seq(term(2, 3))))))
    // doc 2: OOV context -> c1=0, c2=0 -> ln(0.1/0.3)
    assert(got(2L) == ((1L, avg(Seq(term(0, 0))))))
  }

  test("knScoreOver: Kneser-Ney distributes backoff by continuation " +
      "diversity, not raw frequency") {
    // Reference (doc 0): "francisco" is FREQUENT (4 occurrences as w2)
    // but context-bound (only ever follows "san"); "hello" is rarer as
    // a continuation (2 occurrences) but follows two distinct contexts.
    // After an unseen context, KN must prefer the diverse word:
    //   Pcont(hello)     = (2 + 0.1)/(N1tot + 0.1 V)   [n1back = 2]
    //   Pcont(francisco) = (1 + 0.1)/(N1tot + 0.1 V)   [n1back = 1]
    // even though c(., francisco) = 4 > c(., hello) = 2. An add-alpha
    // model (lmScoreOver) scores the two probes identically-or-better
    // for francisco, so the ordering flip is the KN signature.
    val ref = "san francisco san francisco san francisco san francisco" +
      " big hello small hello"
    val docs = Seq(
      (0L, ref),
      (1L, "zzz francisco"), // unseen context -> pure continuation
      (2L, "zzz hello")
    ).toDF("doc_id", "text")
    val got = TextAnalysis
      .knScoreOver(docs, col("doc_id") === 0L)
      .select(col("doc_id"), col("avg_logp"))
      .as[(Long, Double)].collect().toMap
    assert(got(2L) > got(1L),
      s"KN must score the context-diverse continuation higher: $got")
  }

  test("knScoreOver: with minCount=1 the conditional distribution " +
      "over the reference vocabulary sums to exactly 1") {
    // Identity: sum_{w2 in V} P(w2|w1) = 1 for a seen context when no
    // bigram is pruned — the discounted mass D*N1fwd/c1 exactly equals
    // what the max(c2-D,0) terms gave up, and Pcont sums to 1 over V
    // by construction of the add-alpha floor. Probe docs (ids not
    // divisible by 5 -> outside the ref slice) each carry ONE bigram
    // "san w", so exp(avg_logp) = P(w|san).
    val ref = "san francisco san diego hello world hello kitty"
    // V = distinct w2 of ref bigrams
    val vocab = ref.split(" ").sliding(2).map(_(1)).toSeq.distinct
    val probes = vocab.zipWithIndex.map { case (w, i) =>
      // ids 1,2,3,4,6,... skip multiples of 5
      val id = { val k = i + 1; (k + (k - 1) / 4).toLong }
      (id, s"san $w")
    }
    probes.foreach { case (id, _) => assert(id % 5 != 0) }
    val docs = ((0L, ref) +: probes).toDF("doc_id", "text")
    val got = TextAnalysis
      .knScoreOver(docs, col("doc_id") % 5 === 0, minCount = 1)
      .select(col("doc_id"), col("avg_logp"))
      .as[(Long, Double)].collect().toMap
    val total = probes.map { case (id, _) => math.exp(got(id)) }.sum
    assert(math.abs(total - 1.0) < 1e-4,
      s"sum_w P(w|san) = $total, expected 1 (vocab=$vocab)")
  }

  test("pmi replays a hand-computed collocation table") {
    // "a b a b a b a b a b": bigrams (a,b) x5, (b,a) x4, N = 9
    // c_L: a->5, b->4; c_R: b->5, a->4
    // PMI(a,b) = ln(5*9 / (5*5)) = ln(1.8);  PMI(b,a) = ln(4*9/(4*4))
    val docs = Seq((0L, "a b a b a b a b a b")).toDF("doc_id", "text")
    val got = TextAnalysis.pmiOver(docs, minCount = 4, k = 10)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(("a", "b")) == ((5L, r6(math.log(1.8)))))
    assert(got(("b", "a")) == ((4L, r6(math.log(2.25)))))
    // ordering: (b,a) has the higher PMI despite the lower count —
    // PMI normalizes by marginals, the point of the statistic
    assert(got(("b", "a"))._2 > got(("a", "b"))._2)
  }

  test("bootstrap: replicate weights follow the integer-threshold " +
      "Poisson ladder and replicate means actually vary") {
    val rows = Sampling.bootstrapQuery(spark, sfDir).collect()
    assert(rows.length == 32)
    val n = Tables.load(spark, sfDir, "documents").count()
    // n_eff concentrates near n (Poisson(1) mean 1; sd ~ sqrt(n))
    rows.foreach { r =>
      val nEff = r.getLong(1)
      assert(math.abs(nEff - n) < 6 * math.sqrt(n.toDouble),
        s"replicate ${r.getLong(0)}: n_eff $nEff implausible for n $n")
    }
    // the bootstrap distribution is non-degenerate
    assert(rows.map(_.getDouble(3)).distinct.length > 1)
    // pin one weight against a from-scratch md5 replay (doc 0, rep 0)
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("0:0".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 6)
    val v = java.lang.Long.parseLong(hex, 16)
    val want = Seq(6171992L, 12343985L, 15429982L, 16458647L,
      16715813L, 16767247L, 16775819L).count(v >= _)
    val spark2 = spark
    import spark2.implicits._
    val one = Sampling.bootstrapQuery(spark, sfDir, reps = 1)
      .select(col("n_eff")).as[Long].collect().head
    // recompute rep-0 n_eff fully from scratch
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long].collect()
    val expect = docs.map { id =>
      val h = md.digest(s"$id:0".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 6)
      val vv = java.lang.Long.parseLong(h, 16)
      Seq(6171992L, 12343985L, 15429982L, 16458647L, 16715813L,
        16767247L, 16775819L).count(vv >= _).toLong
    }.sum
    assert(one == expect,
      s"rep-0 n_eff $one != from-scratch md5 replay $expect (doc0 w=$want)")
  }

  test("gini: zero on a uniform vocabulary, near-max on a " +
      "one-type-dominant one") {
    // 4 types x 3 occurrences each -> perfectly equal -> G = 0
    val uniform = Seq((0L, "a b c d a b c d a b c d"))
      .toDF("doc_id", "text")
    val u = TextAnalysis.giniOver(uniform).collect().head
    assert(u.getLong(0) == 4 && u.getLong(1) == 12)
    assert(u.getDouble(2) == 0.0, s"uniform gini = ${u.getDouble(2)}")
    // one type holds 97 of 100 tokens, three singletons -> G near max
    val skewed = Seq((0L, (Seq.fill(97)("z") ++ Seq("a", "b", "c"))
      .mkString(" "))).toDF("doc_id", "text")
    val s = TextAnalysis.giniOver(skewed).collect().head
    assert(s.getDouble(2) > 0.69, s"skewed gini = ${s.getDouble(2)}")
    // head share: top 1% of 4 types = the single top type by rank —
    // for the skewed corpus that is z with 97/100
    assert(s.getDouble(3) == 0.97, s"head_share = ${s.getDouble(3)}")
  }

  test("zipf fit: slope -1 on an exact power law, 0 on a flat " +
      "vocabulary") {
    // counts 64, 32, 16, 8, 4, 2 at ranks 1..6: freq = 128 * r^-1 on
    // ranks {1,2,4,8,16,32}? no — construct freq(r) = 64/2^(r-1),
    // which is ln f = ln 64 - (r-1) ln 2, NOT a power law in rank;
    // instead use freq(r) = 96/r exactly: 96, 48, 32, 24 (r=1..4)
    val words = Seq("a" -> 96, "b" -> 48, "c" -> 32, "d" -> 24)
    val text = words.flatMap { case (w, n) => Seq.fill(n)(w) }
      .mkString(" ")
    val fit = TextAnalysis.zipfOver(Seq((0L, text)).toDF("doc_id", "text"))
      .collect().head
    assert(fit.getLong(0) == 4)
    assert(math.abs(fit.getDouble(1) - (-1.0)) < 1e-3,
      s"power-law slope ${fit.getDouble(1)} should be -1")
    // flat vocabulary: y constant -> slope exactly 0
    val flat = Seq((0L, "x y z x y z x y z")).toDF("doc_id", "text")
    val f2 = TextAnalysis.zipfOver(flat).collect().head
    assert(f2.getDouble(1) == 0.0, s"flat slope ${f2.getDouble(1)}")
  }

  test("fitVocab: frequency order with lexicographic tie-break") {
    import SparkSpec.spark.implicits._
    val docs = Seq((1L, "a a b c"), (2L, "b b c d")).toDF("doc_id", "text")
    // counts: b=3, a=2, c=2, d=1 -> top-2 keeps b then a (tie a<c)
    assert(TextAnalysis.fitVocab(docs, "text", 2) == Seq("b", "a"))
    assert(TextAnalysis.fitVocab(docs, "text", 3) == Seq("b", "a", "c"))
  }

  test("kl divergence: self-KL is zero, all KLs non-negative " +
      "(Gibbs), and a hand distribution replays") {
    import SparkSpec.spark.implicits._
    // en: a a a b   (counts a=3, b=1, n=4)
    // xx: a b b b   (counts a=1, b=3, n=4)     V = 2
    // p_xx = (2/6, 4/6); q_en = (4/6, 2/6)
    // KL = 1/3·ln(1/2) + 2/3·ln(2)  (terms floor-rounded to 6 dp)
    val docs = Seq(("en", "a a a b"), ("xx", "a b b b"))
      .toDF("lang", "text").withColumn("doc_id", lit(0L))
    val rows = TextAnalysis.klDivOver(docs).collect()
      .map(r => (r.getString(0), r.getDecimal(2).doubleValue)).toMap
    assert(rows("en") == 0.0, s"self-KL: ${rows("en")}")
    def r6(x: Double) = graft.functions.VectorOps.foldRound(x, 6)
    val expected = r6(1.0 / 3 * math.log((1.0 / 3) / (2.0 / 3))) +
      r6(2.0 / 3 * math.log((2.0 / 3) / (1.0 / 3)))
    assert(math.abs(rows("xx") - expected) < 1e-9,
      s"KL(xx||en) = ${rows("xx")}, want $expected")
    // Gibbs: every cohort's KL vs en is >= 0 on the real corpus
    val real = TextAnalysis.klDivQuery(spark, sfDir).collect()
    assert(real.length == 5)
    real.foreach(r => assert(r.getDecimal(2).doubleValue >= -1e-12,
      s"${r.getString(0)}: negative KL"))
  }

  test("burstiness: constant term Fano 0, one-doc burst Fano N-c̄ " +
      "shape, uniform-spread < bursty") {
    import SparkSpec.spark.implicits._
    // 10 docs; "g" once in every doc (Fano 0 — zero variance);
    // "z" ten times in ONE doc (s1=10, s2=100: Fano = (10·100−100)/
    // (10·10) = 9); "m" twice in five docs (s1=10, s2=20:
    // (200−100)/100 = 1 — Poisson-like)
    val docs = (0 until 10).map { i =>
      val z = if (i == 0) " z z z z z z z z z z" else ""
      val m = if (i < 5) " m m" else ""
      (i.toLong, "g" + z + m)
    }.toDF("doc_id", "text")
    val got = TextAnalysis.burstinessOver(docs, minDf = 1).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(got("g") == ((10L, 10L, 0.0)), s"g: ${got("g")}")
    assert(got("z") == ((1L, 10L, 9.0)), s"z: ${got("z")}")
    assert(got("m") == ((5L, 10L, 1.0)), s"m: ${got("m")}")
  }

  test("readability: count invariants and formula replay") {
    val rows = TextAnalysis.readabilityQuery(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, s, syl) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(w >= 1 && s >= 1)
      // every word carries >= 1 heuristic syllable
      assert(syl >= w, s"doc ${r.getLong(0)}: syl $syl < words $w")
      def r4(x: Double) = BigDecimal(x)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(4) ==
        r4(0.39 * w.toDouble / s + 11.8 * syl.toDouble / w - 15.59))
      assert(r.getDouble(5) ==
        r4(206.835 - 1.015 * w.toDouble / s - 84.6 * syl.toDouble / w))
    }
  }

  test("rake: no stopword survives inside a phrase, scores positive, " +
      "total order") {
    val rows = TextAnalysis.rakeQuery(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 30)
    val stops = TextAnalysis.rakeStops.toSet
    rows.foreach { r =>
      val phrase = r.getString(0)
      assert(phrase.split(" ").forall(w => !stops.contains(w)),
        s"stopword inside phrase '$phrase'")
      assert(r.getLong(1) >= 1)
      assert(r.getLong(2) > 0L)
    }
    // ordering: (score_micro desc, phrase asc) is a total order
    val keys = rows.map(r => (-r.getLong(2), r.getString(0))).toSeq
    assert(keys == keys.sorted, "top-30 not totally ordered")
  }

  test("vocab growth: token and type totals conserve the corpus, " +
      "cumulative columns are exact prefix sums, curve flattens") {
    // columns: batch, n_tokens, new_types, cum_types, cum_tokens
    val rows = TextAnalysis.vocabGrowthQuery(spark, sfDir).collect()
    assert(rows.length >= 2)
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t")).collect()
    val allTokens = docs.flatMap(_.getSeq[String](1))
    assert(rows.map(_.getLong(1)).sum == allTokens.length)
    assert(rows.map(_.getLong(2)).sum == allTokens.distinct.length)
    var (ct, ck) = (0L, 0L)
    for (r <- rows) {
      ct += r.getLong(2); ck += r.getLong(1)
      assert(r.getLong(3) == ct && r.getLong(4) == ck,
        s"batch ${r.getLong(0)}: prefix sums drift")
    }
    assert(rows.last.getLong(3) == allTokens.distinct.length)
    // Heaps-law sanity on a shared-vocabulary corpus: the FIRST batch
    // must mint more types than the LAST (the curve flattens)
    assert(rows.head.getLong(2) > rows.last.getLong(2),
      "vocabulary curve failed to flatten")
  }

  test("distinct-n: ratios bounded and strictly more diverse at " +
      "higher n, totals follow the sliding-window count") {
    val rows = TextAnalysis.distinctNQuery(spark, sfDir).collect()
    val bySrc = rows.groupBy(_.getString(0))
    bySrc.foreach { case (src, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == Seq(1, 2, 3))
      rs.foreach { r =>
        assert(r.getLong(3) <= r.getLong(2), s"$src uniq > total")
        assert(r.getLong(4) == r.getLong(3) * 1000000L / r.getLong(2))
      }
      // the synthetic corpus has a tiny unigram vocab, so bigrams
      // and trigrams must be strictly more diverse per source
      val d = rs.sortBy(_.getInt(1)).map(_.getLong(4))
      assert(d(0) < d(1) && d(1) < d(2),
        s"$src diversity not increasing in n: ${d.mkString(",")}")
      // total grams shrink by ~n_docs per n step (len-n+1 window)
      val t = rs.sortBy(_.getInt(1)).map(_.getLong(2))
      assert(t(0) > t(1) && t(1) > t(2))
    }
  }
}
