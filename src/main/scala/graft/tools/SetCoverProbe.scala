package graft.tools

import graft._
import org.apache.spark.sql.functions._

/** Ad-hoc stage-cost probe for q_set_cover (r13 perf tail). */
object SetCoverProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scp] $name%-30s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }
    // warm up scan + codegen
    Tables.load(spark, sfDir, "documents").count()
    val toks = split(col("text"), " ")
    val docWords = Tables.load(spark, sfDir, "documents")
      .filter(size(toks) >= 2)
      .select(col("doc_id"),
        explode(array_distinct(transform(
          sequence(lit(1), size(toks) - 1),
          i => concat(element_at(toks, i), lit(" "),
            element_at(toks, i + 1))))).as("wrd"))
    val n = t("explode+count (uncached)")(docWords.count())
    println(s"[scp] pairs = $n")
    docWords.cache()
    t("cache materialize")(docWords.count())
    t("round agg (gain groupBy+top1)")(
      docWords.groupBy(col("doc_id")).agg(count(lit(1)).as("gain"))
        .orderBy(col("gain").desc, col("doc_id")).limit(1).collect())
    val cov = docWords.filter(col("doc_id").isInCollection(Seq(1L)))
      .select(col("wrd").as("cov_wrd")).distinct()
    t("round anti-join+agg")(
      docWords.join(broadcast(cov), col("wrd") === col("cov_wrd"),
          "left_anti")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("gain"))
        .orderBy(col("gain").desc, col("doc_id")).limit(1).collect())
    t("round anti-join+agg again")(
      docWords.join(broadcast(cov), col("wrd") === col("cov_wrd"),
          "left_anti")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("gain"))
        .orderBy(col("gain").desc, col("doc_id")).limit(1).collect())
    docWords.unpersist()
    spark.stop()
  }
}
