package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** JSON field profiling: per (event_name, json_path) — occurrences, null
  * fraction, inferred type (with "mixed" when payloads disagree), and a
  * cardinality class.
  *
  * Reference: the socket knowledge-base builder profiles every WS event's
  * JSON fields into `ws_event_summaries` rows (event_name, json_path,
  * cardinality, inferred_type, nullable_seen, occurrences) and marks
  * conflicting observations "mixed" (`scripts/build_socket_kb.py:21-60`,
  * consumed at `src/services/vector_indexer/indexer.py:190-196`). The same
  * operator is the schema-drift detector a training-data pipeline runs over
  * raw JSON crawls.
  *
  * Spark shape: explode key paths (bounded depth) → classify each value by
  * shape → one groupBy over (event_name, path). Type conflict detection is
  * collect_set over the per-row class (bounded: ≤7 classes), not a second
  * shuffle.
  */
object JsonProfiler {

  /** Shape-classify one extracted JSON value (string form, as
    * get_json_object returns it).
    */
  private def classify(v: Column): Column =
    when(v.isNull, "null")
      .when(v.startsWith("{"), "object")
      .when(v.startsWith("["), "array")
      .when(v === "true" || v === "false", "boolean")
      .when(v.rlike("^-?[0-9]+$"), "integer")
      .when(v.rlike("^-?[0-9]*\\.[0-9]+([eE][+-]?[0-9]+)?$"), "double")
      .otherwise("string")

  /** One row per (event_name, json_path) observed up to depth 2.
    *
    * Extraction uses bracket paths (`$['k']`) so keys containing JSONPath
    * metacharacters ('.', '*', '[') resolve to themselves rather than being
    * parsed as nested/wildcard paths; the reported json_path stays in the
    * familiar dotted form. Keys that cannot be bracket-quoted safely
    * (embedded quotes/backslashes/brackets — not valid in the profiled
    * feeds) are skipped rather than misattributed.
    */
  def profile(envelopes: DataFrame): DataFrame = {
    val base = envelopes.select(col("event_name"), col("raw_json"))
    def quotable(k: Column): Column = !k.rlike("['\\\\\\]]")
    val d1 = base
      .select(col("event_name"), col("raw_json"),
        explode(json_object_keys(col("raw_json"))).as("k1"))
      .filter(quotable(col("k1")))
      .withColumn("json_path", concat(lit("$."), col("k1")))
      .withColumn("xpath", concat(lit("$['"), col("k1"), lit("']")))
      .withColumn("v", expr("get_json_object(raw_json, xpath)"))
    val d2 = d1.filter(col("v").startsWith("{"))
      .select(col("event_name"), col("raw_json"), col("json_path").as("p1"),
        col("xpath").as("xp1"), explode(json_object_keys(col("v"))).as("k2"))
      .filter(quotable(col("k2")))
      .withColumn("json_path", concat(col("p1"), lit("."), col("k2")))
      .withColumn("xpath", concat(col("xp1"), lit("['"), col("k2"), lit("']")))
      .withColumn("v", expr("get_json_object(raw_json, xpath)"))
      .drop("p1", "xp1", "k2")
    val all = d1.select("event_name", "json_path", "v")
      .unionByName(d2.select("event_name", "json_path", "v"))
      .withColumn("vclass", classify(col("v")))
    all.groupBy("event_name", "json_path")
      .agg(
        count(lit(1)).as("occurrences"),
        sum(when(col("vclass") === "null", 1).otherwise(0)).as("null_seen"),
        // "mixed" when non-null observations disagree (build_socket_kb.py:43-49)
        array_sort(collect_set(when(col("vclass") =!= "null", col("vclass"))))
          .as("classes"),
        countDistinct(col("v")).as("n_distinct"))
      .withColumn("inferred_type",
        when(size(col("classes")) === 0, "null")
          .when(size(col("classes")) === 1, element_at(col("classes"), 1))
          .otherwise("mixed"))
      .withColumn("nullable_seen", col("null_seen") > 0)
      .withColumn("cardinality",
        when(col("n_distinct") <= 1, "constant")
          .when(col("n_distinct") < col("occurrences"), "categorical")
          .otherwise("unique-ish"))
      .select("event_name", "json_path", "occurrences", "inferred_type",
        "nullable_seen", "cardinality", "n_distinct")
      .orderBy("event_name", "json_path")
  }
}
