package graft.tools
import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
object LayoutDebug {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]")
      .config("spark.sql.shuffle.partitions", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = Tables.load(spark, args(0), "events")
      .select(col("event_id"), unix_millis(col("ts")).as("ms"))
    val ord = Seq(md5(col("event_id").cast("string")), col("event_id"))
    val n = ev.count()
    val old = ev.withColumn("f_old",
      ntile(16).over(Window.orderBy(ord: _*)).cast("long"))
    val neu = graft.operators.Prefix.running(ev, Seq(), ord,
        Seq(graft.operators.Prefix.Running(lit(1L), "cnt", "_rn")))
      .withColumn("f_new",
        graft.operators.Prefix.ntileFromRank(col("_rn"), lit(n), 16))
    val j = old.join(neu.select(col("event_id"), col("_rn"), col("f_new")), Seq("event_id"))
    val bad = j.filter(col("f_old") =!= col("f_new"))
    println(s"[dbg] mismatches=${bad.count()} of $n")
    bad.orderBy(col("_rn")).show(10, false)
    spark.stop()
  }
}
