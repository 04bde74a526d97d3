package graft.tools
import graft.GraftSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
object NtileTest {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[4]")
      .config("spark.sql.shuffle.partitions", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- Seq(10, 100, 103, 120, 10000)) {
      val df = spark.range(1, n + 1).select(col("id").as("rn"))
        .withColumn("nt", ntile(16).over(Window.orderBy(col("rn"))).cast("long"))
        .withColumn("cf", graft.operators.Prefix.ntileFromRank(col("rn"), lit(n.toLong), 16))
      val bad = df.filter(col("nt") =!= col("cf")).count()
      println(s"[ntile] n=$n mismatches=$bad")
      if (bad > 0) df.filter(col("nt") =!= col("cf")).show(5)
    }
    spark.stop()
  }
}
