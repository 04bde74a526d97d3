package graft

import graft.sources.OrcIo
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Per-type ORC write→read round trips — the engine-side analogue of the
 * reference's `TestVectorOrcFile` per-type suites (SURVEY.md §5.2):
 * every ORC category the type table in SURVEY.md §1.2 maps, including
 * nested list/map/struct, nulls in every position, and decimal(38).
 */
class TypesRoundTripSpec extends SparkSpec {

  private def roundTrip(schema: StructType, rows: Seq[Row]): Seq[Row] = {
    val dir = OrcIo.scratchDir("types")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    OrcIo.write(df, s"$dir/t")
    spark.read.orc(s"$dir/t").collect().toSeq
  }

  test("all primitive types round-trip with nulls") {
    val schema = StructType(Seq(
      StructField("b", BooleanType), StructField("i8", ByteType),
      StructField("i16", ShortType), StructField("i32", IntegerType),
      StructField("i64", LongType), StructField("f32", FloatType),
      StructField("f64", DoubleType), StructField("s", StringType),
      StructField("bin", BinaryType), StructField("d", DateType),
      StructField("ts", TimestampType)))
    val r1 = Row(true, 1.toByte, 2.toShort, 3, 4L, 1.5f, 2.5,
      "hello", Array[Byte](1, 2, 3), java.sql.Date.valueOf("2024-02-29"),
      java.sql.Timestamp.valueOf("2024-06-01 12:34:56.789"))
    val rNull = Row(null, null, null, null, null, null, null, null,
      null, null, null)
    val got = roundTrip(schema, Seq(r1, rNull))
    assert(got.size == 2)
    val g1 = got.find(!_.isNullAt(0)).get
    assert(g1.getBoolean(0) && g1.getByte(1) == 1 && g1.getShort(2) == 2 &&
      g1.getInt(3) == 3 && g1.getLong(4) == 4L && g1.getFloat(5) == 1.5f &&
      g1.getDouble(6) == 2.5 && g1.getString(7) == "hello")
    assert(g1.getAs[Array[Byte]](8).toSeq == Seq[Byte](1, 2, 3))
    assert(g1.getDate(9).toString == "2024-02-29")
    assert(g1.getTimestamp(10).toString == "2024-06-01 12:34:56.789")
    val gN = got.find(_.isNullAt(0)).get
    (0 until schema.size).foreach(i => assert(gN.isNullAt(i)))
  }

  test("decimal(38,18) and decimal(10,2) round-trip exactly") {
    val schema = StructType(Seq(
      StructField("big", DecimalType(38, 18)),
      StructField("small", DecimalType(10, 2))))
    val big = new java.math.BigDecimal("12345678901234567890.123456789012345678")
    val small = new java.math.BigDecimal("12345678.90")
    val got = roundTrip(schema, Seq(Row(big, small), Row(null, null)))
    val g = got.find(!_.isNullAt(0)).get
    assert(g.getDecimal(0).compareTo(big) == 0, g.getDecimal(0))
    assert(g.getDecimal(1).compareTo(small) == 0)
  }

  test("list, map, struct, and deep nesting round-trip") {
    val schema = StructType(Seq(
      StructField("arr", ArrayType(IntegerType)),
      StructField("m", MapType(StringType, LongType)),
      StructField("st", StructType(Seq(
        StructField("x", IntegerType),
        StructField("y", StringType)))),
      StructField("nested", ArrayType(StructType(Seq(
        StructField("k", StringType),
        StructField("vs", ArrayType(DoubleType))))))))
    val r = Row(
      Seq(1, 2, null, 4),
      Map("a" -> 1L, "b" -> 2L),
      Row(7, "inner"),
      Seq(Row("k1", Seq(1.0, 2.0)), Row("k2", Seq.empty[Double])))
    val got = roundTrip(schema, Seq(r))
    val g = got.head
    assert(g.getSeq[Any](0) == Seq(1, 2, null, 4))
    assert(g.getMap[String, Long](1).toMap == Map("a" -> 1L, "b" -> 2L))
    assert(g.getStruct(2) == Row(7, "inner"))
    val nested = g.getSeq[Row](3)
    assert(nested.head == Row("k1", Seq(1.0, 2.0)))
    assert(nested(1).getString(0) == "k2" && nested(1).getSeq[Double](1).isEmpty)
  }

  test("char/varchar semantics: length-bounded strings") {
    // CharType/VarcharType store as string (SURVEY.md §1.2); the
    // engine enforces maxLength at write time via substring, like the
    // reference's Char/VarcharTreeWriter truncation
    val df = spark.range(3).select(
      concat(lit("value_"), col("id")).as("raw"))
      .select(substring(col("raw"), 1, 6).as("vc6"),
        rpad(substring(col("raw"), 1, 4), 4, " ").as("c4"))
    val dir = OrcIo.scratchDir("chars")
    OrcIo.write(df, s"$dir/t")
    val got = spark.read.orc(s"$dir/t").collect()
    assert(got.forall(_.getString(0).length <= 6))
    assert(got.forall(_.getString(1).length == 4))
  }

  test("empty dataframe round-trips schema with zero rows") {
    val schema = StructType(Seq(StructField("x", IntegerType),
      StructField("s", StringType)))
    val got = roundTrip(schema, Seq.empty)
    assert(got.isEmpty)
    val dir = OrcIo.scratchDir("empty2")
    OrcIo.write(spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], schema), s"$dir/t")
    assert(spark.read.orc(s"$dir/t").schema.fieldNames.toSeq ==
      Seq("x", "s"))
  }
}
