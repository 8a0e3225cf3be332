package graft.store

import graft.SparkSpec

class JsonProfilerSpec extends SparkSpec {

  import spark.implicits._

  private lazy val envelopes = Seq(
    ("gameStateUpdate", """{"price": 1.5, "tick": 10, "active": true, "data": {"phase": "ACTIVE"}}"""),
    ("gameStateUpdate", """{"price": 2.0, "tick": 11, "active": false, "data": {"phase": "ACTIVE"}}"""),
    ("gameStateUpdate", """{"price": null, "tick": 12, "data": {"phase": "RUGGED"}}"""),
    ("playerUpdate", """{"cash": "12.50", "tick": "not-a-number"}"""))
    .toDF("event_name", "raw_json")

  private lazy val prof = JsonProfiler.profile(envelopes)
    .collect()
    .map(r => (r.getString(0), r.getString(1)) -> r)
    .toMap

  test("profiles every observed path including nested depth-2") {
    assert(prof.contains(("gameStateUpdate", "$.price")))
    assert(prof.contains(("gameStateUpdate", "$.data.phase")))
    assert(prof.contains(("playerUpdate", "$.cash")))
  }

  test("type inference: stable types, null tracking, per-event independence") {
    val price = prof(("gameStateUpdate", "$.price"))
    assert(price.getAs[String]("inferred_type") === "double")
    assert(price.getAs[Boolean]("nullable_seen")) // one null observation
    assert(price.getAs[Long]("occurrences") === 3L)
    val tick = prof(("gameStateUpdate", "$.tick"))
    assert(tick.getAs[String]("inferred_type") === "integer")
    assert(!tick.getAs[Boolean]("nullable_seen"))
    // same path, different event: string ("not-a-number") stays separate
    assert(prof(("playerUpdate", "$.tick")).getAs[String]("inferred_type") === "string")
  }

  test("keys containing JSONPath metacharacters profile as themselves") {
    val env = Seq(
      ("evt", """{"a.b": 1, "c*d": "x", "plain": 2}"""),
      ("evt", """{"a.b": 2, "c*d": "y", "plain": 3}"""))
      .toDF("event_name", "raw_json")
    val p = JsonProfiler.profile(env).collect()
      .map(r => r.getString(1) -> r).toMap
    // "$.a.b" here MEANS the literal key "a.b" (bracket-extracted), so its
    // values 1,2 are integers — naive dotted extraction would yield null
    assert(p("$.a.b").getAs[String]("inferred_type") === "integer")
    assert(!p("$.a.b").getAs[Boolean]("nullable_seen"))
    assert(p("$.c*d").getAs[String]("inferred_type") === "string")
  }

  test("type conflicts collapse to mixed; objects classify as object") {
    assert(prof(("gameStateUpdate", "$.active")).getAs[String]("inferred_type")
      === "boolean")
    assert(prof(("gameStateUpdate", "$.data")).getAs[String]("inferred_type")
      === "object")
    val phase = prof(("gameStateUpdate", "$.data.phase"))
    assert(phase.getAs[String]("inferred_type") === "string")
    assert(phase.getAs[String]("cardinality") === "categorical") // 2 of 3 distinct
  }
}
