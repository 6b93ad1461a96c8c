package graft.io

import java.nio.ByteBuffer
import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.util.Utf8
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/**
 * Avro container-file source/sink built directly on the `org.apache.avro`
 * core library (the DataSource module is not on this classpath, the codec
 * library is). Closes the "Avro source/sink" gap from VERDICT r6: Glue-
 * adjacent pipelines around the reference
 * (/root/reference/README.md:21-123's staged zones) commonly land Avro, and
 * `io/TableIO` otherwise round-trips only JSON/CSV/ORC/Parquet.
 *
 * Design for a real cluster, exercised on local[32]:
 *  - The writer is a two-phase commit: every task streams its partition to
 *    a uniquely-named file under `_staging_<uuid>/` (task attempt number in
 *    the name, so speculative retries never collide), and the driver then
 *    promotes exactly the files reported by the *successful* attempt of
 *    each partition — half-written output from failed attempts is never
 *    visible, same job-commit contract as `io/Manifest`.
 *  - Hadoop conf is shipped to tasks as an explicit key/value snapshot
 *    (the serializable-conf pattern), so `fs.*` settings (s3a credentials,
 *    endpoints) survive into executors; paths stay URI-agnostic like the
 *    rest of TableIO.
 *  - The reader schedules one task per file — Avro write parallelism is
 *    preserved on read because the writer emits one file per input
 *    partition. (Block-level splitting inside one huge file is the next
 *    step if a producer hands us monolithic Avro; our own sink never does.)
 *  - The exact Spark schema is embedded in each file's metadata
 *    (`graft.sparkSchema`), so a round-trip is type-lossless even where
 *    the Avro type system is coarser (e.g. TimestampNTZ vs local-ts).
 */
object AvroIO {

  val SparkSchemaMetaKey = "graft.sparkSchema"

  // ---- schema mapping ------------------------------------------------------

  /** Spark → Avro schema. Nullable fields become union(null, T); nested
    * records are named by field path to keep Avro names unique. */
  def toAvroSchema(st: StructType, recordName: String = "graft_record"): Schema =
    structToAvro(st, recordName, "graft.avro")

  private def structToAvro(st: StructType, name: String, namespace: String): Schema = {
    val fields = st.fields.map { f =>
      val base = typeToAvro(f.dataType, s"${name}_${f.name}", namespace)
      val sch = if (f.nullable) Schema.createUnion(Schema.create(Schema.Type.NULL), base) else base
      new Schema.Field(f.name, sch, null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord(name, null, namespace, false, fields.toList.asJava)
  }

  private def typeToAvro(dt: DataType, path: String, ns: String): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case ByteType | ShortType | IntegerType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case DateType =>
      LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case TimestampNTZType =>
      LogicalTypes.localTimestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case d: DecimalType =>
      LogicalTypes.decimal(d.precision, d.scale).addToSchema(Schema.create(Schema.Type.BYTES))
    case ArrayType(elem, containsNull) =>
      val e = typeToAvro(elem, s"${path}_item", ns)
      Schema.createArray(if (containsNull) Schema.createUnion(Schema.create(Schema.Type.NULL), e) else e)
    case MapType(StringType, v, valueContainsNull) =>
      val ve = typeToAvro(v, s"${path}_value", ns)
      Schema.createMap(if (valueContainsNull) Schema.createUnion(Schema.create(Schema.Type.NULL), ve) else ve)
    case s: StructType => structToAvro(s, path, ns)
    case other => throw new IllegalArgumentException(s"AvroIO: unsupported Spark type $other at $path")
  }

  // ---- value conversion ----------------------------------------------------

  private[graft] def rowToRecord(row: Row, st: StructType, schema: Schema): GenericRecord = {
    val rec = new GenericData.Record(schema)
    var i = 0
    while (i < st.length) {
      val f = st.fields(i)
      val v = if (row.isNullAt(i)) null else sparkToAvro(row.get(i), f.dataType, nonNull(schema.getFields.get(i).schema()))
      rec.put(i, v)
      i += 1
    }
    rec
  }

  private def nonNull(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION) s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get else s

  private def sparkToAvro(v: Any, dt: DataType, sch: Schema): AnyRef = (v, dt) match {
    case (null, _) => null
    case (b: Boolean, BooleanType) => java.lang.Boolean.valueOf(b)
    case (b: Byte, ByteType) => java.lang.Integer.valueOf(b.toInt)
    case (s: Short, ShortType) => java.lang.Integer.valueOf(s.toInt)
    case (i: Int, IntegerType) => java.lang.Integer.valueOf(i)
    case (l: Long, LongType) => java.lang.Long.valueOf(l)
    case (f: Float, FloatType) => java.lang.Float.valueOf(f)
    case (d: Double, DoubleType) => java.lang.Double.valueOf(d)
    case (s: String, StringType) => s
    case (b: Array[Byte], BinaryType) => ByteBuffer.wrap(b)
    case (d: java.sql.Date, DateType) => java.lang.Integer.valueOf(d.toLocalDate.toEpochDay.toInt)
    case (d: LocalDate, DateType) => java.lang.Integer.valueOf(d.toEpochDay.toInt)
    case (t: java.sql.Timestamp, TimestampType) =>
      java.lang.Long.valueOf(Math.multiplyExact(t.getTime, 1000L) + (t.getNanos / 1000) % 1000)
    case (t: Instant, TimestampType) =>
      java.lang.Long.valueOf(Math.addExact(Math.multiplyExact(t.getEpochSecond, 1000000L), t.getNano / 1000L))
    case (t: LocalDateTime, TimestampNTZType) =>
      val inst = t.toInstant(ZoneOffset.UTC)
      java.lang.Long.valueOf(Math.addExact(Math.multiplyExact(inst.getEpochSecond, 1000000L), inst.getNano / 1000L))
    case (d: java.math.BigDecimal, dec: DecimalType) =>
      ByteBuffer.wrap(d.setScale(dec.scale).unscaledValue().toByteArray)
    case (seq: scala.collection.Seq[_], ArrayType(elem, _)) =>
      val es = nonNull(sch.getElementType)
      val out = new java.util.ArrayList[AnyRef](seq.length)
      seq.foreach(e => out.add(if (e == null) null else sparkToAvro(e, elem, es)))
      out
    case (m: scala.collection.Map[_, _], MapType(StringType, vt, _)) =>
      val vs = nonNull(sch.getValueType)
      val out = new java.util.HashMap[String, AnyRef](m.size)
      m.foreach { case (k, value) =>
        out.put(k.asInstanceOf[String], if (value == null) null else sparkToAvro(value, vt, vs))
      }
      out
    case (r: Row, s: StructType) => rowToRecord(r, s, sch)
    case (other, t) => throw new IllegalArgumentException(s"AvroIO: cannot encode $other as $t")
  }

  private[graft] def recordToRow(rec: GenericRecord, st: StructType): Row = {
    val vals = new Array[Any](st.length)
    var i = 0
    while (i < st.length) {
      vals(i) = avroToSpark(rec.get(i), st.fields(i).dataType)
      i += 1
    }
    Row.fromSeq(vals.toIndexedSeq)
  }

  private def avroToSpark(v: AnyRef, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (b: java.lang.Boolean, BooleanType) => b.booleanValue()
    case (i: java.lang.Integer, ByteType) => i.byteValue()
    case (i: java.lang.Integer, ShortType) => i.shortValue()
    case (i: java.lang.Integer, IntegerType) => i.intValue()
    case (l: java.lang.Long, LongType) => l.longValue()
    case (f: java.lang.Float, FloatType) => f.floatValue()
    case (d: java.lang.Double, DoubleType) => d.doubleValue()
    case (s: Utf8, StringType) => s.toString
    case (s: String, StringType) => s
    // foreign-file shapes: ENUM symbols surface as StringType, FIXED as
    // BinaryType (avroSchemaToSpark maps them; our writer never emits them)
    case (e: org.apache.avro.generic.GenericEnumSymbol[_], StringType) => e.toString
    case (f: org.apache.avro.generic.GenericFixed, BinaryType) => f.bytes().clone()
    case (b: ByteBuffer, BinaryType) =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    case (i: java.lang.Integer, DateType) => java.sql.Date.valueOf(LocalDate.ofEpochDay(i.longValue()))
    case (l: java.lang.Long, TimestampType) =>
      val micros = l.longValue()
      val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000L))
      ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
      ts
    case (l: java.lang.Long, TimestampNTZType) =>
      val micros = l.longValue()
      LocalDateTime.ofInstant(
        Instant.ofEpochSecond(Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L),
        ZoneOffset.UTC)
    case (b: ByteBuffer, dec: DecimalType) =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr)
      new java.math.BigDecimal(new java.math.BigInteger(arr), dec.scale)
    case (l: java.util.List[_], ArrayType(elem, _)) =>
      l.asScala.map(e => avroToSpark(e.asInstanceOf[AnyRef], elem)).toSeq
    case (m: java.util.Map[_, _], MapType(StringType, vt, _)) =>
      m.asScala.map { case (k, value) => k.toString -> avroToSpark(value.asInstanceOf[AnyRef], vt) }.toMap
    case (r: GenericRecord, s: StructType) => recordToRow(r, s)
    case (other, t) => throw new IllegalArgumentException(s"AvroIO: cannot decode $other as $t")
  }

  // ---- conf shipping -------------------------------------------------------

  private[graft] def confSnapshot(conf: Configuration): Array[(String, String)] =
    conf.iterator().asScala.map(e => (e.getKey, e.getValue)).toArray

  private[graft] def restoreConf(snapshot: Array[(String, String)]): Configuration = {
    val c = new Configuration(false)
    snapshot.foreach { case (k, v) => c.set(k, v) }
    c
  }

  // ---- sink ----------------------------------------------------------------

  /** Distributed Avro write with job-commit semantics (overwrite). One
    * container file per input partition; `codec` is `deflate` (always
    * available) or `snappy`/`null`. */
  def writeAvro(df: DataFrame, path: String, codec: String = "deflate"): Unit = {
    val spark = df.sparkSession
    val st = df.schema
    val avroJson = toAvroSchema(st).toString
    val sparkJson = st.json
    val confSnap = confSnapshot(spark.sparkContext.hadoopConfiguration)
    val stagingName = s"_staging_${UUID.randomUUID().toString.replace("-", "")}"
    val stagingBase = s"${path.stripSuffix("/")}/$stagingName"

    // phase 1: each task streams its partition into a unique staged file
    val reported: Array[(Int, String, Long)] = df.rdd.mapPartitionsWithIndex { (idx, rows) =>
      val conf = restoreConf(confSnap)
      val schema = new Schema.Parser().parse(avroJson)
      val attempt = Option(TaskContext.get()).map(_.attemptNumber()).getOrElse(0)
      val fileName = f"part-$idx%05d-a$attempt.avro"
      val p = new Path(s"$stagingBase/$fileName")
      val fs = p.getFileSystem(conf)
      val out = fs.create(p, true)
      val writer = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
      writer.setCodec(codec match {
        case "deflate" => CodecFactory.deflateCodec(6)
        case "snappy" => CodecFactory.snappyCodec()
        case "null" | "none" => CodecFactory.nullCodec()
        case other => throw new IllegalArgumentException(s"AvroIO: unknown codec $other")
      })
      writer.setMeta(SparkSchemaMetaKey, sparkJson)
      var n = 0L
      try {
        writer.create(schema, out)
        while (rows.hasNext) { writer.append(rowToRecord(rows.next(), st, schema)); n += 1 }
      } finally writer.close()
      Iterator.single((idx, fileName, n))
    }.collect() // driver-bounded: one tuple per partition

    // phase 2: driver promotes exactly the reported files (first successful
    // attempt per partition wins — Spark delivers one result per partition)
    val conf = spark.sparkContext.hadoopConfiguration
    val dest = new Path(path)
    val fs = dest.getFileSystem(conf)
    if (fs.exists(dest)) {
      fs.listStatus(dest).foreach { s =>
        if (s.getPath.getName != stagingName) fs.delete(s.getPath, true)
      }
    } else fs.mkdirs(dest)
    reported.sortBy(_._1).foreach { case (idx, fileName, _) =>
      val from = new Path(s"$stagingBase/$fileName")
      val to = new Path(dest, f"part-$idx%05d.avro")
      if (!fs.rename(from, to))
        throw new java.io.IOException(s"AvroIO: commit rename failed: $from -> $to")
    }
    fs.delete(new Path(stagingBase), true) // drops orphaned failed attempts too
  }

  // ---- source --------------------------------------------------------------

  /** Read back an Avro directory (or single file). Schema comes from the
    * embedded Spark schema when present (type-lossless round-trip), else
    * from the Avro schema. One task per file. `columns` prunes at DECODE
    * time: a projected Avro READER schema makes the datum reader skip
    * non-selected fields inside each block (Avro schema resolution) —
    * the column-pruning analogue of a parquet `ReadSchema`, so a
    * 2-column projection never pays the full-row decode cost. */
  def readAvro(spark: SparkSession, path: String,
      columns: Seq[String] = Nil): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val files = TableIO.listDataFiles(spark, path).filter(_.endsWith(".avro"))
    require(files.nonEmpty, s"AvroIO: no .avro files under $path")
    val full = schemaOfFile(spark, files.head)
    val st =
      if (columns.isEmpty) full
      else {
        val missing = columns.filterNot(full.fieldNames.contains)
        require(missing.isEmpty, s"AvroIO: columns not in schema: ${missing.mkString(", ")}")
        // keep file field order so the reader schema resolves positionally
        StructType(full.fields.filter(f => columns.contains(f.name)))
      }
    val confSnap = confSnapshot(conf)
    val stJson = st.json
    val fullWidth = full.length
    val rows = spark.sparkContext
      .parallelize(files, files.size)
      .mapPartitions { paths =>
        val taskConf = restoreConf(confSnap)
        val schema = DataType.fromJson(stJson).asInstanceOf[StructType]
        // only project when pruning: record-name-based schema resolution
        // would reject a foreign file's record name on a full read
        val pruning = schema.length < fullWidth
        paths.flatMap { f =>
          val p = new Path(f)
          val in = p.getFileSystem(taskConf).open(p)
          // writer schema comes from the file header; a projected reader
          // schema drives per-field skip during decode
          val reader =
            if (pruning) new GenericDatumReader[GenericRecord](null, toAvroSchema(schema))
            else new GenericDatumReader[GenericRecord]()
          val stream = new DataFileStream[GenericRecord](in, reader)
          // early-terminated scans (limit/take/exception) never drive
          // hasNext to false — close at task completion, not exhaustion
          Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] { _ =>
            try stream.close() catch { case _: java.io.IOException => () }
          })
          new Iterator[Row] {
            def hasNext: Boolean = { val h = stream.hasNext; if (!h) stream.close(); h }
            def next(): Row = recordToRow(stream.next(), schema)
          }
        }
      }
    spark.createDataFrame(rows, st)
  }

  /** Spark schema of one container file: the embedded exact schema when
    * present, else the Avro schema mapping. The ONE copy of this logic —
    * the DSv2 face delegates here. */
  def schemaOfFile(spark: SparkSession, file: String): StructType = {
    val p = new Path(file)
    val in = p.getFileSystem(spark.sparkContext.hadoopConfiguration).open(p)
    val stream = new DataFileStream[GenericRecord](in, new GenericDatumReader[GenericRecord]())
    try {
      Option(stream.getMetaString(SparkSchemaMetaKey))
        .map(j => DataType.fromJson(j).asInstanceOf[StructType])
        .getOrElse(avroSchemaToSpark(stream.getSchema))
    } finally stream.close()
  }

  /** Avro → Spark schema, for files written by other producers (no
    * embedded Spark schema). Inverse of `toAvroSchema` on its image. */
  def avroSchemaToSpark(schema: Schema): StructType = {
    avroTypeToSpark(schema) match {
      case (s: StructType, _) => s
      case (other, _) => throw new IllegalArgumentException(s"AvroIO: top-level Avro type must be record, got $other")
    }
  }

  private def avroTypeToSpark(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val nonNulls = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(nonNulls.size == 1, s"AvroIO: only union(null, T) supported, got $s")
      val (dt, _) = avroTypeToSpark(nonNulls.head)
      (dt, true)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.INT =>
      if (s.getLogicalType.isInstanceOf[LogicalTypes.Date]) (DateType, false) else (IntegerType, false)
    case Schema.Type.LONG => s.getLogicalType match {
      case _: LogicalTypes.TimestampMicros => (TimestampType, false)
      // timestamp-millis maps to raw LONG, not TimestampType: the decode
      // path interprets TimestampType longs as MICROS, so mapping millis
      // to TimestampType would silently read values 1000x too small.
      // Callers convert explicitly with timestamp_millis(col).
      case _: LogicalTypes.TimestampMillis => (LongType, false)
      case _: LogicalTypes.LocalTimestampMicros => (TimestampNTZType, false)
      case _ => (LongType, false)
    }
    case Schema.Type.FLOAT => (FloatType, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.STRING | Schema.Type.ENUM => (StringType, false)
    case Schema.Type.BYTES | Schema.Type.FIXED => s.getLogicalType match {
      case d: LogicalTypes.Decimal => (DecimalType(d.getPrecision, d.getScale), false)
      case _ => (BinaryType, false)
    }
    case Schema.Type.ARRAY =>
      val (e, n) = avroTypeToSpark(s.getElementType)
      (ArrayType(e, n), false)
    case Schema.Type.MAP =>
      val (v, n) = avroTypeToSpark(s.getValueType)
      (MapType(StringType, v, n), false)
    case Schema.Type.RECORD =>
      val fields = s.getFields.asScala.map { f =>
        val (dt, nullable) = avroTypeToSpark(f.schema())
        StructField(f.name(), dt, nullable)
      }
      (StructType(fields.toArray), false)
    case other => throw new IllegalArgumentException(s"AvroIO: unsupported Avro type $other")
  }
}
