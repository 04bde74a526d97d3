package graft.tools

import graft.operators.{Multimodal, Scale}
import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions.col

/** Measures the audio `fanOut` disposition (VERDICT r10 #5 / r11 #6):
  * does the ids-only repartition ahead of the WAVE encode pay for
  * itself on (a) the encode itself and (b) every downstream decode
  * pass reading the store? Run:
  *
  *   sbt "runMain graft.tools.FanOutProbe /root/testdata/sf0.1"
  *
  * Prints encode and energy-decode wall times for a store built WITH
  * the fanOut exchange vs WITHOUT (natural parquet-scan
  * partitioning), plus each store's file-partition count. The
  * measured numbers live in Multimodal.syntheticAudio's scaladoc. */
object FanOutProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]")
      .config("spark.sql.shuffle.partitions", "32").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    def timeIt[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[fanout] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def encode(ids: org.apache.spark.sql.DataFrame, out: String): Unit =
      ids.as[Long]
        .mapPartitions(_.map(id =>
          Multimodal.MediaRecord(id, "audio", Multimodal.encodeWav(id))))
        .toDF()
        .write.mode("overwrite").parquet(out)
    val ids = Tables.load(spark, sfDir, "documents").select(col("doc_id"))
    val base = graft.sources.OrcIo.scratchDir("fanout_probe")
    // warm-up: JVM/codegen spin-up out of the measurement
    encode(Scale.fanOut(ids), s"$base/warm")
    for (pass <- 1 to 2) {
      timeIt(s"encode WITH fanOut (pass $pass)")(
        encode(Scale.fanOut(ids), s"$base/with"))
      timeIt(s"encode WITHOUT fanOut (pass $pass)")(
        encode(ids, s"$base/without"))
    }
    for (variant <- Seq("with", "without"); pass <- 1 to 2) {
      val store = spark.read.parquet(s"$base/$variant")
      if (pass == 1)
        println(s"[fanout] store $variant: " +
          s"${store.rdd.getNumPartitions} scan partitions")
      timeIt(s"energy decode over $variant-fanOut store (pass $pass)")(
        Multimodal.audioEnergy(spark, store)
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
