package graft

import graft.sources.JsonTools
import org.apache.spark.sql.types._

/**
 * Pins the JSON schema-inference type lattice against the reference's
 * widening rules (`JsonSchemaFinder.java:73-252`: pickType :73,
 * mergeType :153 — bool < byte < … < long < decimal < float < double;
 * string ⊔ timestamp → string; struct field union).
 *
 * One documented divergence: the reference tracks the NARROWEST fitting
 * integer subtype (byte/short/int/long) and widens on merge; Spark
 * infers LongType for any integer up front. Both preserve every corpus
 * value — the engine pins Spark's long.
 */
class JsonLatticeSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def infer(lines: String*): StructType =
    JsonTools.inferSchema(spark, lines.toDS())

  private def typeOf(s: StructType, field: String): DataType =
    s(field).dataType

  test("integer-family promotion: int ⊔ long-range → long") {
    val s = infer("""{"v": 1}""", """{"v": 9999999999}""")
    assert(typeOf(s, "v") == LongType)
  }

  test("integer ⊔ fractional → double (long < float < double)") {
    val s = infer("""{"v": 1}""", """{"v": 1.5}""")
    assert(typeOf(s, "v") == DoubleType)
  }

  test("number ⊔ string → string (top of the scalar lattice)") {
    val s = infer("""{"v": 1}""", """{"v": "x"}""")
    assert(typeOf(s, "v") == StringType)
  }

  test("datetime-shaped strings alone infer TIMESTAMP (DATE_PATTERN)") {
    val s = infer(
      """{"v": "2021-03-01T12:00:00Z"}""",
      """{"v": "2021-03-02T09:30:00Z"}""")
    assert(typeOf(s, "v") == TimestampType)
  }

  test("timestamp ⊔ plain string → string (JsonSchemaFinder mergeType)") {
    val s = infer(
      """{"v": "2021-03-01T12:00:00Z"}""",
      """{"v": "not a date"}""")
    assert(typeOf(s, "v") == StringType)
  }

  test("struct inference unions fields across records") {
    val s = infer("""{"a": {"x": 1}}""", """{"a": {"y": "s"}}""")
    val a = typeOf(s, "a").asInstanceOf[StructType]
    assert(a.fieldNames.toSet == Set("x", "y"))
    assert(a("x").dataType == LongType)
    assert(a("y").dataType == StringType)
  }

  test("null ⊔ typed value → nullable typed (NULL is the lattice bottom)") {
    val s = infer("""{"v": null}""", """{"v": 3}""")
    assert(typeOf(s, "v") == LongType)
    assert(s("v").nullable)
  }

  test("boolean stays boolean; boolean ⊔ number → string fallback") {
    assert(typeOf(infer("""{"v": true}""", """{"v": false}"""), "v")
      == BooleanType)
    // the reference places BOOLEAN below the numeric chain and widens
    // bool ⊔ int upward; Spark has no bool→int widening and falls back
    // to string — both read every value losslessly, engine pins string
    assert(typeOf(infer("""{"v": true}""", """{"v": 1}"""), "v")
      == StringType)
  }

  test("quarantine: exactly the brace-stripped lines reject; valid " +
      "lines round-trip their fields") {
    val rows = JsonTools.jsonQuarantineQuery(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val valid = r.getBoolean(1)
      assert(valid == (id % 7 != 0), s"doc $id: wrong quarantine side")
      if (valid) {
        assert(r.getLong(2) == id)
        assert(r.getLong(4) == id % 100)
        assert(r.isNullAt(5))
      } else {
        assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
        assert(r.getString(5).length == 32, "quarantine digest missing")
      }
    }
  }
}
