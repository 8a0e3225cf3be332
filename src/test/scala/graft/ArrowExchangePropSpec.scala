package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.store.ArrowExchange

/** Property round-trips for the Arrow exchange: random row sets over mixed
  * nullable schemas must survive write→read bit-exactly, across batch-size
  * boundaries (the classic off-by-one surface: rows straddling record-batch
  * edges, all-null batches, final short batch). Sampling drives seeded Gens
  * directly — the scalatest-scalacheck bridge isn't on the offline
  * classpath (same pattern as PropertySpec).
  */
class ArrowExchangePropSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("l", LongType), StructField("d", DoubleType),
    StructField("s", StringType), StructField("a", ArrayType(LongType))))

  private val genRow: Gen[Row] = for {
    l <- Gen.option(Gen.choose(Long.MinValue, Long.MaxValue))
    d <- Gen.option(Gen.oneOf(Gen.choose(-1e18, 1e18), Gen.oneOf(
      Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity, -0.0)))
    s <- Gen.option(Gen.oneOf(Gen.asciiPrintableStr,
      Gen.const("snowman ☃ + astral 😀")))
    a <- Gen.option(Gen.listOf(Gen.choose(-1000L, 1000L)))
  } yield Row(l.orNull, d.map(_.doubleValue).orNull, s.orNull,
    a.map(_.toSeq).orNull)

  private val genCase: Gen[(List[Row], Int)] = for {
    n <- Gen.choose(0, 80)
    rows <- Gen.listOfN(n, genRow)
    batchRows <- Gen.oneOf(1, 7, 64, 65, 100)
  } yield (rows, batchRows)

  private def forAll[A](gen: Gen[A], n: Int)(f: A => Unit): Unit = {
    var seed = Seed(20260814L)
    var done = 0
    var attempts = 0
    while (done < n && attempts < n * 20) {
      gen.apply(Gen.Parameters.default.withSize(40), seed).foreach { a =>
        f(a); done += 1
      }
      seed = seed.next
      attempts += 1
    }
    assert(done === n, s"generator produced only $done/$n samples")
  }

  private def sameValue(g: Any, w: Any): Boolean = (g, w) match {
    case (null, null) => true
    case (a: Double, b: Double) =>
      java.lang.Double.doubleToLongBits(a) ==
        java.lang.Double.doubleToLongBits(b) // NaN == NaN, -0.0 != 0.0
    case (a: Seq[_], b: scala.collection.Seq[_]) =>
      a.size == b.size && a.zip(b).forall { case (x, y) => sameValue(x, y) }
    case (a, b) => a == b
  }

  test("random mixed-null rows round-trip across batch boundaries") {
    forAll(genCase, 12) { case (rows, batchRows) =>
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 3), schema)
      val bos = new ByteArrayOutputStream()
      val n = ArrowExchange.writeIpcStream(df, bos, batchRows)
      val (_, got) = ArrowExchange.readIpcStream(
        new ByteArrayInputStream(bos.toByteArray))
      assert(n === rows.size.toLong)
      assert(got.size === rows.size)
      // row order is partition order; compare positionally against what
      // Spark itself collects from the same partitioning
      val want = df.collect().toSeq
      got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
        (0 until 4).foreach { c =>
          assert(sameValue(g(c), w.get(c)),
            s"row $i col ${schema(c).name}: got ${g(c)} want ${w.get(c)}")
        }
      }
    }
  }
}
