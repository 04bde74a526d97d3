package graft

import graft.operators.Prefix
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * [[Prefix.running]] must be EXACTLY the plain window it replaces:
 * for any input frame and any associative aggregate, two-phase
 * (local prefix + earlier-partition offsets) equals the global
 * running aggregate row for row. Randomized frames exercise boundary
 * placement: nParts larger than, equal to, and smaller than the
 * group sizes, empty partitions, and single-row groups.
 */
class PrefixSpec extends SparkSpec {

  private def randomFrame(seed: Long, n: Int) = {
    val rnd = new scala.util.Random(seed)
    val rows = (0 until n).map { i =>
      (rnd.nextInt(3).toString, i.toLong, rnd.nextInt(1000).toLong - 500L)
    }
    spark.createDataFrame(rows).toDF("grp", "id", "v")
  }

  test("running sum / cnt / max / min match the plain global window " +
      "on randomized frames, grouped and ungrouped") {
    for (seed <- Seq(1L, 2L, 3L); nParts <- Seq(1, 4, 17)) {
      val df = randomFrame(seed, 257)
      // grouped: partition by grp, order by id. The range-partitioned
      // frame is ALWAYS materialized inside running(): both observed
      // failure modes of branch-divergent _pid (a cached child
      // defeating reuse canonicalization; AQE planning the branches on
      // independently sampled exchanges) corrupt offsets silently, so
      // there is deliberately no uncached mode left to test.
      val got = Prefix.running(df, Seq("grp"), Seq(col("id")),
          Seq(Prefix.Running(col("v"), "sum", "s"),
            Prefix.Running(lit(1L), "cnt", "k"),
            Prefix.Running(col("v"), "max", "mx"),
            Prefix.Running(col("v"), "min", "mn")), nParts)
        .orderBy(col("grp"), col("id"))
        .select(col("grp"), col("id"), col("s"), col("k"), col("mx"),
          col("mn"))
        .collect().toSeq
      val w = Window.partitionBy(col("grp")).orderBy(col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val want = df
        .withColumn("s", sum(col("v")).over(w))
        .withColumn("k", count(lit(1)).over(w))
        .withColumn("mx", max(col("v")).over(w))
        .withColumn("mn", min(col("v")).over(w))
        .orderBy(col("grp"), col("id"))
        .select(col("grp"), col("id"), col("s"), col("k"), col("mx"),
          col("mn"))
        .collect().toSeq
      assert(got == want, s"grouped mismatch at seed=$seed nParts=$nParts")

      // ungrouped with a desc order key (the pareto/rfm shape)
      val got2 = Prefix.running(df, Seq(), Seq(col("v").desc, col("id")),
          Seq(Prefix.Running(col("v"), "sum", "s"),
            Prefix.Running(lit(1L), "cnt", "k")), nParts)
        .orderBy(col("id"))
        .select(col("id"), col("s"), col("k"))
        .collect().toSeq
      val w2 = Window.orderBy(col("v").desc, col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val want2 = df
        .withColumn("s", sum(col("v")).over(w2))
        .withColumn("k", count(lit(1)).over(w2))
        .orderBy(col("id"))
        .select(col("id"), col("s"), col("k"))
        .collect().toSeq
      assert(got2 == want2,
        s"ungrouped mismatch at seed=$seed nParts=$nParts")
    }
  }

  test("default width derives from spark.sql.shuffle.partitions and " +
      "still equals the plain window") {
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    try {
      // a deliberately odd width the hardcoded-32 era never ran at
      spark.conf.set(key, "7")
      val df = randomFrame(11L, 257)
      val got = Prefix.running(df, Seq("grp"), Seq(col("id")),
          Seq(Prefix.Running(col("v"), "sum", "s"),
            Prefix.Running(lit(1L), "cnt", "k")))
        .orderBy(col("grp"), col("id"))
        .select(col("grp"), col("id"), col("s"), col("k"))
        .collect().toSeq
      val w = Window.partitionBy(col("grp")).orderBy(col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val want = df
        .withColumn("s", sum(col("v")).over(w))
        .withColumn("k", count(lit(1)).over(w))
        .orderBy(col("grp"), col("id"))
        .select(col("grp"), col("id"), col("s"), col("k"))
        .collect().toSeq
      assert(got == want, "session-width mismatch")
    } finally spark.conf.set(key, before)
  }
}
