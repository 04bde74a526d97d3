package graft

import graft.sources.CsvTools
import org.apache.spark.sql.functions._

/** CSV round-trip gates beyond the aggregate witness: quarantined rows
  * keep their raw text (debuggability), and the RFC 4180 quoting of
  * the delimiter-laden column survives a full write/read cycle. */
class CsvSpec extends SparkSpec {

  test("quarantined rows carry the raw malformed line; good rows " +
      "round-trip the quoted column verbatim") {
    val path = CsvTools.buildCsvStore(spark, sfDir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("c_custkey",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("tricky",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("c_acctbal",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("_corrupt",
        org.apache.spark.sql.types.StringType)))
    val back = spark.read.schema(schema)
      .option("header", "true").option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(path).cache()
    val bad = back.filter(col("_corrupt").isNotNull)
      .select(col("_corrupt")).collect().map(_.getString(0)).sorted
    assert(bad.length == 2, s"expected 2 quarantined rows, got $bad")
    assert(bad.exists(_.startsWith("not_a_number")),
      "type-mismatch row must be quarantined with its raw text")
    assert(bad.exists(_.contains("too,many,columns")),
      "arity-mismatch row must be quarantined with its raw text")
    // quoting survives: every good tricky value has the exact frame
    val good = back.filter(col("_corrupt").isNull)
    val frames = good.select(col("tricky")).collect().map(_.getString(0))
    assert(frames.nonEmpty)
    frames.foreach { t =>
      assert(t.startsWith("name,\"") && t.endsWith("\" x"),
        s"quoting mangled the tricky column: $t")
    }
    // and the key column parsed for every customer row
    assert(good.filter(col("c_custkey").isNull).count() == 0)
    back.unpersist()
  }
}
