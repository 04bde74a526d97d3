package graft.tools

import graft.GraftSession
import graft.sources.{JsonTools, OrcIo, OrcMeta}

/**
 * CLI parity with the reference's `orc-tools` Driver subcommands
 * (SURVEY.md §2.9: meta / data / scan / json-schema / convert) and the
 * C++ `orc-contents` / `orc-metadata` / `orc-statistics` binaries.
 *
 * Usage: runMain graft.tools.OrcTool <cmd> <path> [out]
 *   meta <path>            footer summary, stripes, column stats
 *   data <path>            rows as line-delimited JSON
 *   scan <path>            row/file count (perf smoke)
 *   json-schema <path>     inferred typed schema of JSON files
 *   convert <json> <out>   JSON → ORC
 *   merge <dir> <out>      compact ORC files (W9)
 *   memory <path> [cols]   reader memory estimate (`orc-memory`,
 *                          FileMemory.cc; cols = comma-separated names)
 *   timezone <name...>     timezone rule dump (`timezone-dump`,
 *                          TimezoneDump.cc — JVM tzdb via ZoneRules)
 */
object OrcTool {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: OrcTool <cmd> <path> [out]")
    val (cmd, path) = (args(0), args(1))
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    cmd match {
      case "meta" =>
        OrcMeta.fileMeta(spark, path).show(false)
        OrcMeta.stripes(spark, path).show(false)
        OrcMeta.columnStats(spark, path).show(200, truncate = false)
      case "data" =>
        // stream partitions through the driver one at a time (the
        // reference's PrintData streams too) — .collect() would buffer
        // the whole file and OOM on anything real
        spark.read.orc(path).toJSON.toLocalIterator()
          .forEachRemaining(println(_))
      case "scan" =>
        println(s"rows=${spark.read.orc(path).count()}")
      case "json-schema" =>
        println(JsonTools.inferSchemaPath(spark, path).toDDL)
      case "convert" =>
        JsonTools.jsonToOrc(spark, path, args(2))
        println(s"wrote ${args(2)}")
      case "merge" =>
        OrcIo.merge(spark, Seq(path), args(2))
        println(s"merged into ${args(2)}")
      case "memory" =>
        var cols =
          if (args.length > 2) args(2).split(",").toSeq.filter(_.nonEmpty)
          else Nil
        // C++-tool parity: --columns takes top-level FIELD IDS
        // (FileMemory.cc:113-117); all-numeric tokens are resolved to
        // names via the first file's schema, names pass through
        if (cols.nonEmpty && cols.forall(_.forall(_.isDigit))) {
          val schema = OrcMeta.fileMeta(spark, path).head()
            .getAs[String]("schema")
          val names = org.apache.orc.TypeDescription.fromString(schema)
            .getFieldNames
          cols = cols.map(c => names.get(c.toInt))
        }
        val est = OrcMeta.memoryEstimate(spark, path, cols).collect()
        est.foreach { row =>
          // the C++ tool's output shape (FileMemory.cc:84-92)
          println(row.getAs[String]("file"))
          println(s"Reader memory estimate: ${row.getAs[Long]("readerMemory")}")
          if (row.isNullAt(row.fieldIndex("batchMemory")))
            println("Batch memory estimate:  " +
              "Cannot estimate because reading ARRAY or MAP columns")
          else {
            println(s"Batch memory estimate:  ${row.getAs[Long]("batchMemory")}")
            println(s"Total memory estimate:  ${row.getAs[Long]("totalMemory")}")
          }
        }
      case "timezone" =>
        // TimezoneDump.cc prints each zone's version + transition rules;
        // the JVM analogue walks java.time's tzdb ZoneRules
        args.drop(1).foreach { name =>
          val zone = java.time.ZoneId.of(name)
          val rules = zone.getRules
          println(s"Timezone $name:")
          // offset-style ids (Z, UTC+05:00) resolve via ZoneId but are
          // not in the region tzdb provider — no version to print
          scala.util.Try(java.time.zone.ZoneRulesProvider
            .getVersions(name).lastKey())
            .foreach(v => println(s"  version: $v"))
          import scala.jdk.CollectionConverters._
          rules.getTransitionRules.asScala.foreach(r =>
            println(s"  rule: $r"))
          rules.getTransitions.asScala.takeRight(10).foreach(t =>
            println(s"  transition: $t"))
        }
      case other => sys.error(s"unknown command: $other")
    }
    spark.stop()
  }
}
