package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** F1–F3 edge semantics (SURVEY §7.4-4): null-vs-missing JSON fields and
  * numeric coercion — pinned here because DuckDB's json_extract_string and
  * Spark's get_json_object must keep agreeing on them for the oracle
  * checks to stay meaningful.
  */
class JsonParitySpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = Seq(
    """{"a": 1, "b": "x", "nest": {"c": 2.5}}""",
    """{"a": null, "b": ""}""",
    """{"b": "y"}""",
    """{"a": "12"}""").toDF("raw_json")

  test("missing field and explicit null both extract as SQL NULL") {
    val got = docs.select(get_json_object(col("raw_json"), "$.a").as("a")).collect()
      .map(r => Option(r.getString(0)))
    assert(got.toSeq === Seq(Some("1"), None, None, Some("12")))
  }

  test("nested path extraction and numeric coercion") {
    val got = docs.select(
      get_json_object(col("raw_json"), "$.nest.c").cast("double").as("c"),
      get_json_object(col("raw_json"), "$.a").cast("int").as("a_int")).collect()
    assert(got(0).getDouble(0) === 2.5)
    assert(got(0).getInt(1) === 1)
    assert(got(3).getInt(1) === 12)    // numeric string coerces
    assert(got(2).isNullAt(0) && got(2).isNullAt(1))
  }

  test("from_json distinguishes present-null from absent only via schema defaults") {
    val schema = StructType(Seq(StructField("a", IntegerType),
      StructField("b", StringType)))
    val parsed = docs.select(from_json(col("raw_json"), schema).as("p")).collect()
    assert(parsed(0).getStruct(0).getInt(0) === 1)
    assert(parsed(1).getStruct(0).isNullAt(0)) // explicit null
    assert(parsed(2).getStruct(0).isNullAt(0)) // missing: same NULL
    assert(parsed(1).getStruct(0).getString(1) === "") // empty string preserved
  }

  test("empty string is not NULL; json_array_length analog via from_json") {
    val arrs = Seq("""{"prices": [1.0, 2.0, 3.0]}""", """{"prices": []}""",
      """{}""").toDF("raw_json")
    val n = arrs.select(size(from_json(get_json_object(col("raw_json"), "$.prices"),
      ArrayType(DoubleType))).as("n")).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(n.toSeq === Seq(Some(3), Some(0), None))
  }
}
