package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.store.ArrowExchange

/** S9: the Arrow IPC exchange must be a faithful, batched, order-preserving
  * serialization of any query result — checked by full round-trips through
  * the writer and reader, including the type matrix, nulls, empty results,
  * and multi-batch streams.
  */
class ArrowExchangeSpec extends SparkSpec {

  private def roundTrip(df: org.apache.spark.sql.DataFrame,
      batchRows: Int = ArrowExchange.DefaultBatchRows): Seq[Seq[Any]] = {
    val bos = new ByteArrayOutputStream()
    val n = ArrowExchange.writeIpcStream(df, bos, batchRows)
    val (_, rows) = ArrowExchange.readIpcStream(
      new ByteArrayInputStream(bos.toByteArray))
    assert(n === rows.size.toLong, "writer row count vs decoded rows")
    rows
  }

  test("full type matrix round-trips including nulls") {
    val schema = StructType(Seq(
      StructField("b", BooleanType), StructField("i", IntegerType),
      StructField("l", LongType), StructField("f", FloatType),
      StructField("d", DoubleType), StructField("s", StringType),
      StructField("bin", BinaryType),
      StructField("dec", DecimalType(12, 3)),
      StructField("dt", DateType), StructField("ts", TimestampType),
      StructField("arr_d", ArrayType(DoubleType)),
      StructField("arr_s", ArrayType(StringType))))
    val ts = Timestamp.valueOf("2024-03-01 12:34:56.789")
    val rows = Seq(
      Row(true, 7, 42L, 1.5f, 2.25, "héllo", Array[Byte](1, 2, 3),
        new java.math.BigDecimal("123.456"),
        java.sql.Date.valueOf("2024-03-01"), ts,
        Seq(1.0, 2.5), Seq("a", "b")),
      Row(null, null, null, null, null, null, null, null, null, null,
        null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    val got = roundTrip(df)
    assert(got.size === 2)
    val r0 = got.head
    assert(r0(0) === true && r0(1) === 7 && r0(2) === 42L)
    assert(r0(3) === 1.5f && r0(4) === 2.25 && r0(5) === "héllo")
    assert(r0(6).asInstanceOf[Array[Byte]].toSeq === Seq[Byte](1, 2, 3))
    assert(r0(7) === new java.math.BigDecimal("123.456"))
    // date travels as epoch days, timestamp as UTC micros — Arrow's wire
    // representation, converted here to prove the values (not just the
    // bits) survived
    assert(r0(8) === java.sql.Date.valueOf("2024-03-01")
      .toLocalDate.toEpochDay.toInt)
    assert(r0(9) ===
      ts.getTime * 1000L + (ts.getNanos % 1000000) / 1000)
    assert(r0(10) === Seq(1.0, 2.5))
    assert(r0(11) === Seq("a", "b"))
    assert(got(1).forall(_ == null), s"null row corrupted: ${got(1)}")
  }

  test("multi-batch stream preserves row order across partitions") {
    import spark.implicits._
    val df = spark.range(0, 1000).repartitionByRange(4, $"id")
      .select($"id", ($"id" * 2).as("x"))
    // 64-row batches force ~16 record batches across 4 partitions
    val got = roundTrip(df, batchRows = 64)
    assert(got.size === 1000)
    assert(got.map(_.head.asInstanceOf[Long]) === (0L until 1000L).toSeq,
      "partition-order serialization broke row order")
    assert(got.forall(r => r(1) == r.head.asInstanceOf[Long] * 2))
  }

  test("empty result is a valid stream: schema + EOS, zero rows") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("id", "s").filter($"id" < 0)
    val bos = new ByteArrayOutputStream()
    val n = ArrowExchange.writeIpcStream(df, bos)
    assert(n === 0L)
    val (schema, rows) = ArrowExchange.readIpcStream(
      new ByteArrayInputStream(bos.toByteArray))
    assert(rows.isEmpty)
    assert(schema.getFields.size === 2)
  }

  test("queryArrow mirrors the reference's SQL-in/Arrow-out surface") {
    import spark.implicits._
    Seq(("g1", 2.5), ("g1", 3.5), ("g2", 1.0)).toDF("game_id", "price")
      .createOrReplaceTempView("arrow_ticks")
    val bytes = ArrowExchange.queryArrow(spark,
      "SELECT game_id, avg(price) AS avg_price FROM arrow_ticks " +
        "GROUP BY game_id ORDER BY game_id")
    val (_, rows) = ArrowExchange.readIpcStream(
      new ByteArrayInputStream(bytes))
    assert(rows === Seq(Seq("g1", 3.0), Seq("g2", 1.0)))
  }

  test("a registered query result round-trips at sf0.001") {
    val sfDir = "/root/testdata/sf0.001"
    assume(new java.io.File(sfDir).exists)
    val df = SparkEntry.queries("q01_group_agg")(spark, sfDir)
    val expected = df.count()
    val got = roundTrip(df)
    assert(got.size.toLong === expected)
  }

  test("unsupported column type fails loudly at schema translation") {
    import spark.implicits._
    val df = Seq((1, Map("a" -> 1))).toDF("id", "m")
    val e = intercept[IllegalArgumentException] {
      ArrowExchange.writeIpcStream(df, new ByteArrayOutputStream())
    }
    assert(e.getMessage.contains("unsupported Spark type"))
  }
}
