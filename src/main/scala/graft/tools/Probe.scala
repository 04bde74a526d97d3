package graft.tools
import graft._
import graft.operators._
import org.apache.spark.sql.functions._

/** Ad-hoc plan/size probe used while iterating (not part of the API). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime()-t0)/1e9}%8.2fs"); r
    }
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"),
        floor(length(col("text")) / 100).as("len_bucket"),
        Dedup.hashedShingles(col("text")).as("sh"))
    t("shingle+count")(docs.select(sum(size(col("sh")))).head())
    val ex = docs.select(col("doc_id"), col("lang"), col("len_bucket"),
      size(col("sh")).as("n_sh"), explode(col("sh")).as("s"))
    t("explode count")(println("  ex rows=" + ex.count()))
    val a = ex.select(col("s"), col("lang"), col("len_bucket"),
      col("doc_id").as("doc_a"), col("n_sh").as("n_a"))
    val b = ex.select(col("s"), col("lang"), col("len_bucket"),
      col("doc_id").as("doc_b"), col("n_sh").as("n_b"))
    t("join pair rows")(println("  pairs=" +
      a.join(b, Seq("s", "lang", "len_bucket"))
        .filter(col("doc_a") < col("doc_b")).count()))
    val sigs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        Dedup.minhashSignature(Dedup.hashedShingles(col("text"))).as("sig"))
    t("minhash sigs")(sigs.select(sum(size(col("sig")))).head())
    spark.stop()
  }
}
