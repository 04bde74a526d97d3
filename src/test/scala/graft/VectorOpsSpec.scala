package graft

import graft.functions.VectorOps
import org.apache.spark.sql.functions._

class VectorOpsSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def vecsDf = Seq(
    (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
    (Array(2.0f, 0.0f, 0.0f), Array(1.0f, 0.0f, 0.0f)),
  ).toDF("a", "b")

  test("dot matches hand-computed values") {
    val got = vecsDf.select(VectorOps.dot(col("a"), col("b"))).as[Double]
      .collect()
    assert(got.toSeq == Seq(32.0, 0.0, 2.0))
  }

  test("cosine: orthogonal=0, parallel=1, zero-vector=null") {
    val got = vecsDf.select(VectorOps.cosine(col("a"), col("b")))
      .as[Option[Double]].collect()
    assert(math.abs(got(1).get) < 1e-12)
    assert(math.abs(got(2).get - 1.0) < 1e-12)
    val z = Seq((Array(0.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
      .select(VectorOps.cosine(col("a"), col("b"))).as[Option[Double]]
      .collect()
    assert(z.head.isEmpty)
  }

  test("l2sq matches hand-computed") {
    val got = vecsDf.select(VectorOps.l2sq(col("a"), col("b"))).as[Double]
      .collect()
    assert(got.toSeq == Seq(27.0, 2.0, 1.0))
  }

  test("hamming counts differing bits of packed longs") {
    val got = Seq((0L, 7L), (5L, 5L), (-1L, 0L)).toDF("a", "b")
      .select(VectorOps.hamming(col("a"), col("b"))).as[Int].collect()
    assert(got.toSeq == Seq(3, 0, 64))
  }

  test("graft_token_stats matches the HOF formulation on tricky tokens") {
    val stop = Seq("the", "a", "of", "and", "to", "in", "is")
    val docs = Seq(
      "the cat sat on the mat",
      "a  b", // consecutive spaces → empty token (counted, short, distinct)
      "",
      "is is is",
      "one two three four").toDF("text")
    val toks = split(col("text"), " ")
    val expected = docs.select(
      size(toks).as("n_tok"),
      size(filter(toks, t => t.isin(stop.map(lit(_)): _*))).as("n_stop"),
      size(filter(toks, t => length(t) <= 2)).as("n_short"),
      size(array_distinct(toks)).as("n_distinct")).collect()
    val got = docs.select(
      graft.operators.TextAnalysis.tokenStats(col("text")).as("ts"))
      .select("ts.n_tok", "ts.n_stop", "ts.n_short", "ts.n_distinct")
      .collect()
    assert(got.map(_.toSeq).toSeq == expected.map(_.toSeq).toSeq)
  }

  test("graft_count_in_sets matches per-set filter counts") {
    val sets = Seq(Seq("der", "und", "das"), Seq("the", "and", "of"))
    val docs = Seq("der hund und das", "the cat and the dog of war", "nada")
      .toDF("text")
    val toks = split(col("text"), " ")
    val expected = docs.select(
      sets.map(ws =>
        size(filter(toks, t => t.isin(ws.map(lit(_)): _*)))): _*).collect()
    val got = docs.select(
      call_function("graft_count_in_sets", col("text"), typedLit(sets))
        .as("c"))
      .select(element_at(col("c"), 1), element_at(col("c"), 2)).collect()
    assert(got.map(_.toSeq).toSeq == expected.map(_.toSeq).toSeq)
  }

  test("graft_int8_quant reproduces hand-computed scale and cosine") {
    val v = Array(1.27f, -0.635f, 0.01f, 0.0f)
    val df = Seq(Tuple1(v), Tuple1(Array.fill(4)(0.0f))).toDF("v")
    val got = df.select(
      call_function("graft_int8_quant", col("v")).as("q"))
      .select(col("q.scale"), col("q.cos")).collect()
    // replicate the kernel arithmetic in test code
    val maxAbs = v.map(x => math.abs(x.toDouble)).max
    val scale = maxAbs / 127.0
    val deq = v.map { x =>
      val q = math.max(math.min(math.floor(x / scale + 0.5), 127.0), -127.0)
      q * scale
    }
    val dot = v.map(_.toDouble).zip(deq).map { case (a, b) => a * b }.sum
    val na = math.sqrt(v.map(x => x.toDouble * x).sum)
    val nb = math.sqrt(deq.map(x => x * x).sum)
    assert(got(0).getDouble(0) == scale)
    assert(math.abs(got(0).getDouble(1) - dot / (na * nb)) < 1e-12)
    assert(got(0).getDouble(1) > 0.99, "int8 reconstruction should be close")
    // zero vector: zero scale, null cosine
    assert(got(1).getDouble(0) == 0.0 && got(1).isNullAt(1))
  }

  test("graft_ngram_rep counts bigram multiplicities in one pass") {
    val df = Seq("spam spam spam spam", "a b c d", "solo").toDF("text")
    val got = df.select(
      call_function("graft_ngram_rep", col("text"), lit(2)).as("r"))
      .select(col("r.n_grams"), col("r.n_distinct"), col("r.top_count"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    assert(got(0) == ((3, 1, 3))) // "spam spam" ×3
    assert(got(1) == ((3, 3, 1)))
    assert(got(2) == ((0, 0, 0))) // single token: no bigram
  }

  test("graft_ngram_rep agrees with the explode+groupBy formulation") {
    // property check on the real corpus: the one-pass kernel must
    // equal the relational multiset count for every document
    // (deterministic subset — limit() would be re-planned per collect;
    // explode drops zero-bigram docs, so compare on n_grams > 0 and
    // pin the zero case separately)
    val docs = Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") < 100)
    val kernel = docs.select(col("doc_id"),
      call_function("graft_ngram_rep", col("text"), lit(2)).as("r"))
      .select(col("doc_id"), col("r.n_grams"), col("r.n_distinct"),
        col("r.top_count"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    val relational = docs.select(col("doc_id"),
      explode(call_function("graft_ngrams", col("text"), lit(2)))
        .as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).cast("int").as("n"),
        count(lit(1)).cast("int").as("d"),
        max(col("c")).cast("int").as("t"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    assert(kernel.filter(_._2._1 > 0) == relational)
    kernel.filter(_._2._1 == 0).values.foreach(v =>
      assert(v == ((0, 0, 0))))
  }

  test("graft_feature_hash emits unit-norm deterministic embeddings") {
    val df = Seq("the cat sat", "the cat sat", "completely different words")
      .toDF("text")
    val arrs = df.select(
      call_function("graft_feature_hash", col("text"), lit(64)).as("v"))
      .collect().map(_.getSeq[Double](0))
    // unit norm
    arrs.foreach { v =>
      assert(v.length == 64)
      assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-12)
    }
    // identical text → identical vector; different text → different
    assert(arrs(0) == arrs(1))
    assert(arrs(0) != arrs(2))
    // bucket arithmetic matches the oracle definition: first md5 byte
    val md = java.security.MessageDigest.getInstance("MD5")
    val b = md.digest("the".getBytes("UTF-8"))(0) & 0xFF
    assert(arrs(0)(b % 64) > 0.0)
  }

  test("hyperplaneSignature is deterministic and bucket-stable") {
    val df = Seq(
      Tuple1(Array.fill(64)(0.5f)),
      Tuple1(Array.fill(64)(0.5f)),            // identical vector
      Tuple1(Array.tabulate(64)(i => (i - 32).toFloat)),
    ).toDF("v")
    val sigs = df.select(
      VectorOps.hyperplaneSignature(col("v"), 12, 64)).as[Long].collect()
    assert(sigs(0) == sigs(1), "identical vectors must share a bucket")
    assert(sigs(0) >= 0 && sigs(0) < (1L << 12), "12-bit signature range")
    assert(sigs(2) >= 0 && sigs(2) < (1L << 12))
  }
}
