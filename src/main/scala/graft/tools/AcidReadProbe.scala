package graft.tools

import graft._
import graft.operators.Acid
import org.apache.spark.sql.functions._

/** Ad-hoc probe for the ACID-schema ORC vectorized-read quirk
  * (VERDICT r12 #6): which read shapes AIOOBE, with full stacks. */
object AcidReadProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val orders = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderstatus"))
    val dir = graft.sources.OrcIo.scratchDir("acid_probe")
    Acid.writeDelta(Acid.ordersAsEvents(
      orders.filter(col("o_orderkey") % 10 === 0), 1, 2L),
      s"$dir/delta_2")
    val p = s"$dir/delta_2"
    def attempt(name: String)(f: => Any): Unit =
      try println(s"[probe] $name OK -> ${f}")
      catch {
        case e: Throwable =>
          var c: Throwable = e
          while (c.getCause != null) c = c.getCause
          println(s"[probe] $name FAIL root=${c.getClass.getName}: " +
            c.getMessage)
          c.getStackTrace.take(6).foreach(s => println(s"    $s"))
      }
    val df = spark.read.orc(p)
    attempt("rdd.count full-width")(df.rdd.count())
    attempt("agg two cols (pruned)")(
      df.agg(sum(when(col("operation") === 1, 1L).otherwise(0L)),
        max(col("currentTransaction"))).collect().toSeq)
    attempt("agg count(struct(*)) folded")(
      df.agg((sum(when(col("operation") === 1, 1L).otherwise(0L)) +
        count(struct(df.schema.fieldNames.map(col): _*)) * lit(0L))
        .as("x")).collect().toSeq)
    attempt("plain count()")(df.count())
    attempt("collect full-width")(df.limit(3).collect().length)
    attempt("select all then agg")(
      df.select(df.schema.fieldNames.map(col): _*)
        .agg(count(col("row")), max(col("rowId"))).collect().toSeq)
    spark.stop()
  }
}
