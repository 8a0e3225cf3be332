package graft.store

import java.io.{InputStream, OutputStream}
import java.nio.channels.Channels

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.complex.ListVector
import org.apache.arrow.vector.ipc.{ArrowStreamReader, ArrowStreamWriter, WriteChannel}
import org.apache.arrow.vector.ipc.message.{IpcOption, MessageSerializer}
import org.apache.arrow.vector.types.{DateUnit, FloatingPointPrecision, TimeUnit}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row, SparkSession}
import org.apache.spark.sql.types._

/** Arrow IPC result exchange — the S9 surface.
  *
  * The reference exposes query results as Arrow tables
  * (`src/services/event_store/duckdb.py:104-123`, `query_arrow`) so the RL
  * trainer consumes columnar batches without a row-by-row copy. The Spark
  * analog is an Arrow IPC *stream*: schema message, then record batches,
  * then end-of-stream — the standard interchange format every Arrow
  * consumer (pyarrow, polars, duckdb, pandas) reads natively.
  *
  * Scale shape: columnarization happens EXECUTOR-side. Each partition
  * encodes its rows into serialized record-batch messages (`batchRows`
  * rows per batch) inside `mapPartitions`; the driver never materializes
  * the result — it streams one encoded batch at a time via
  * `toLocalIterator`, prepends the schema message, and appends EOS. Driver
  * memory is bounded by a single batch regardless of result size, and the
  * expensive row→column transpose is distributed. (This is the same
  * decomposition Spark's own python `toArrow` path uses; built here on
  * arrow-java's public `MessageSerializer`/`VectorSchemaRoot` API.)
  *
  * Type matrix covers every output type the engine's query surface
  * produces: boolean, byte/short/int/long, float/double, decimal, string,
  * binary, date, timestamp (micros, UTC — the session zone), and arrays of
  * any of those. An unsupported column type fails loudly at schema
  * translation, never by silently corrupting a batch.
  */
object ArrowExchange {

  /** Rows per record batch. Arrow consumers stream batch-at-a-time, so the
    * batch is the unit of both pipelining and memory: 1<<14 rows of a
    * ~100-byte row is ~1.6 MB — large enough to amortize per-batch framing,
    * small enough that a 1000-executor fan-in never holds more than a few
    * MB per connection.
    */
  val DefaultBatchRows: Int = 1 << 14

  // ---------------------------------------------------------------- schema

  private def arrowType(dt: DataType): ArrowType = dt match {
    case BooleanType => ArrowType.Bool.INSTANCE
    case ByteType => new ArrowType.Int(8, true)
    case ShortType => new ArrowType.Int(16, true)
    case IntegerType => new ArrowType.Int(32, true)
    case LongType => new ArrowType.Int(64, true)
    case FloatType => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
    case DoubleType => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
    case StringType => ArrowType.Utf8.INSTANCE
    case BinaryType => ArrowType.Binary.INSTANCE
    case d: DecimalType => new ArrowType.Decimal(d.precision, d.scale, 128)
    case DateType => new ArrowType.Date(DateUnit.DAY)
    case TimestampType => new ArrowType.Timestamp(TimeUnit.MICROSECOND, "UTC")
    // parquet timestamp[us] without isAdjustedToUTC reads as NTZ — the
    // testdata's date columns are this shape
    case TimestampNTZType => new ArrowType.Timestamp(TimeUnit.MICROSECOND, null)
    case other => throw new IllegalArgumentException(
      s"ArrowExchange: unsupported Spark type $other")
  }

  private def arrowField(name: String, dt: DataType, nullable: Boolean): Field =
    dt match {
      case ArrayType(elem, containsNull) =>
        new Field(name, new FieldType(nullable, new ArrowType.List(), null),
          Seq(arrowField("element", elem, containsNull)).asJava)
      case _ =>
        new Field(name, new FieldType(nullable, arrowType(dt), null),
          Seq.empty[Field].asJava)
    }

  def toArrowSchema(schema: StructType): ArrowSchema =
    new ArrowSchema(schema.fields.map(f =>
      arrowField(f.name, f.dataType, f.nullable)).toSeq.asJava)

  // ---------------------------------------------------------------- encode

  private def tsMicros(v: Any): Long = v match {
    case t: java.sql.Timestamp =>
      t.getTime * 1000L + (t.getNanos % 1000000) / 1000
    case i: java.time.Instant =>
      i.getEpochSecond * 1000000L + i.getNano / 1000
  }

  private def dateDays(v: Any): Int = v match {
    case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
    case d: java.time.LocalDate => d.toEpochDay.toInt
  }

  private def setValue(vec: FieldVector, i: Int, v: Any): Unit =
    if (v == null) vec.setNull(i)
    else vec match {
      case x: BitVector => x.setSafe(i, if (v.asInstanceOf[Boolean]) 1 else 0)
      case x: TinyIntVector => x.setSafe(i, v.asInstanceOf[Byte].toInt)
      case x: SmallIntVector => x.setSafe(i, v.asInstanceOf[Short].toInt)
      case x: IntVector => x.setSafe(i, v.asInstanceOf[Int])
      case x: BigIntVector => x.setSafe(i, v.asInstanceOf[Long])
      case x: Float4Vector => x.setSafe(i, v.asInstanceOf[Float])
      case x: Float8Vector => x.setSafe(i, v.asInstanceOf[Double])
      case x: VarCharVector =>
        x.setSafe(i, v.asInstanceOf[String].getBytes("UTF-8"))
      case x: VarBinaryVector => x.setSafe(i, v.asInstanceOf[Array[Byte]])
      case x: DecimalVector =>
        x.setSafe(i, v.asInstanceOf[java.math.BigDecimal]
          .setScale(x.getScale))
      case x: TimeStampMicroTZVector => x.setSafe(i, tsMicros(v))
      case x: TimeStampMicroVector =>
        val ldt = v.asInstanceOf[java.time.LocalDateTime]
        x.setSafe(i, ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
          ldt.getNano / 1000)
      case x: DateDayVector => x.setSafe(i, dateDays(v))
      case lv: ListVector =>
        val seq = v.asInstanceOf[scala.collection.Seq[Any]]
        val start = lv.startNewValue(i)
        val child = lv.getDataVector
        var j = 0
        seq.foreach { e => setValue(child, start + j, e); j += 1 }
        lv.endValue(i, seq.size)
      case other => throw new IllegalArgumentException(
        s"ArrowExchange: unsupported vector ${other.getClass.getName}")
    }

  /** One serialized record-batch MESSAGE (no schema framing) from a chunk
    * of rows — the executor-side unit. A fresh allocator per batch keeps
    * the off-heap lifecycle trivially correct under task retries.
    */
  def encodeBatch(schema: StructType, rows: Seq[Row]): Array[Byte] = {
    val alloc = new RootAllocator(Long.MaxValue)
    try {
      val root = VectorSchemaRoot.create(toArrowSchema(schema), alloc)
      try {
        val vecs = root.getFieldVectors.asScala
        var i = 0
        rows.foreach { r =>
          var c = 0
          while (c < vecs.size) { setValue(vecs(c), i, r.get(c)); c += 1 }
          i += 1
        }
        root.setRowCount(rows.size)
        val rb = new VectorUnloader(root).getRecordBatch
        try {
          val bos = new java.io.ByteArrayOutputStream()
          MessageSerializer.serialize(
            new WriteChannel(Channels.newChannel(bos)), rb)
          bos.toByteArray
        } finally rb.close()
      } finally root.close()
    } finally alloc.close()
  }

  /** Distributed encode: each partition yields (rowCount, batchMessage)
    * pairs. Partition order is preserved, so the stream is a faithful
    * row-order serialization of the DataFrame.
    */
  private def encodedBatches(df: DataFrame, batchRows: Int) = {
    val schema = df.schema
    implicit val enc: Encoder[(Long, Array[Byte])] =
      Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    df.mapPartitions { rows =>
      rows.grouped(batchRows).map(chunk =>
        (chunk.size.toLong, encodeBatch(schema, chunk)))
    }
  }

  /** Stream `df` as Arrow IPC onto `out`; returns the row count. The
    * driver pulls one encoded batch at a time (`toLocalIterator`), so peak
    * driver memory is one batch + one partition's pending blocks.
    */
  def writeIpcStream(df: DataFrame, out: OutputStream,
      batchRows: Int = DefaultBatchRows): Long = {
    val ch = new WriteChannel(Channels.newChannel(out))
    MessageSerializer.serialize(ch, toArrowSchema(df.schema))
    var rows = 0L
    encodedBatches(df, batchRows).toLocalIterator().asScala.foreach {
      case (n, bytes) => rows += n; out.write(bytes)
    }
    ArrowStreamWriter.writeEndOfStream(ch, IpcOption.DEFAULT)
    out.flush()
    rows
  }

  /** In-memory convenience mirroring the reference's `query_arrow`
    * (duckdb.py:104-123): run SQL, get one Arrow IPC stream back. For
    * results that might not fit the driver, use `writeIpcStream` with a
    * real sink instead.
    */
  def queryArrow(spark: SparkSession, sql: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    writeIpcStream(spark.sql(sql), bos)
    bos.toByteArray
  }

  // ---------------------------------------------------------------- decode

  private def fromArrow(v: Any): Any = v match {
    case null => null
    case t: org.apache.arrow.vector.util.Text => t.toString
    case l: java.lang.Long => l
    case l: java.util.List[_] => l.asScala.map(fromArrow).toSeq
    case other => other
  }

  /** Read a complete Arrow IPC stream back into rows (driver-side; the
    * ingestion half of the exchange and the round-trip check for the
    * writer). Timestamp columns come back as micros-since-epoch longs per
    * Arrow's wire type; callers wanting java.sql.Timestamp convert with
    * the schema in hand.
    */
  def readIpcStream(in: InputStream): (ArrowSchema, Seq[Seq[Any]]) = {
    val alloc = new RootAllocator(Long.MaxValue)
    try {
      val reader = new ArrowStreamReader(in, alloc)
      try {
        val root = reader.getVectorSchemaRoot
        val out = Seq.newBuilder[Seq[Any]]
        while (reader.loadNextBatch()) {
          val vecs = root.getFieldVectors.asScala
          var i = 0
          while (i < root.getRowCount) {
            out += vecs.map(v =>
              if (v.isNull(i)) null else fromArrow(v.getObject(i))).toSeq
            i += 1
          }
        }
        (root.getSchema, out.result())
      } finally reader.close()
    } finally alloc.close()
  }
}
