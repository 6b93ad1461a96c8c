package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.io.{AvroIO, TableIO}

/**
 * DataSourceV2 read face over [[graft.io.AvroIO]]-written directories —
 * makes Avro a first-class `spark.read.format(...)` citizen so it
 * composes with SQL, joins, and the rest of the planner instead of
 * living behind a library call:
 *
 *   spark.read.format("graft.sources.AvroSourceV2")
 *     .load("/path/to/avro-dir")
 *
 * Planner integration, not just plumbing:
 *  - **column pruning pushes into the decoder**
 *    (`SupportsPushDownRequiredColumns`): the pruned schema becomes a
 *    projected Avro READER schema, so skipped fields are never decoded —
 *    `df.select(a, b)` pays 2 columns of decode, like a parquet
 *    `ReadSchema`;
 *  - one `InputPartition` per container file — the writer's one-file-
 *    per-partition layout makes read parallelism mirror write
 *    parallelism;
 *  - the exact Spark schema comes from the file's embedded
 *    `graft.sparkSchema` metadata (type-lossless), falling back to the
 *    Avro schema mapping for foreign files.
 */
class AvroSourceV2 extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    AvroSourceV2.schemaOf(AvroSourceV2.pathOf(options))
  // write-side schema comes from the DataFrame (an empty target dir has
  // nothing to infer from)
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("AvroSourceV2: .load(path)/.save(path) is required"))
    new AvroV2Table(path, schema)
  }
}

object AvroSourceV2 {
  private[sources] def pathOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("AvroSourceV2: .load(path) is required"))

  private[sources] def listFiles(path: String): Seq[String] = {
    val spark = SparkSession.active
    val files = TableIO.listDataFiles(spark, path).filter(_.endsWith(".avro"))
    require(files.nonEmpty, s"AvroSourceV2: no .avro files under $path")
    files
  }

  private[sources] def schemaOf(path: String): StructType =
    AvroIO.schemaOfFile(SparkSession.active, listFiles(path).head)
}

class AvroV2Table(path: String, schema: StructType)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft_avro($path)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(path, schema)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new AvroWriteBuilder(path, info)
}

/** V2 write face: Spark's own task-commit coordination replaces the
  * library writer's hand-rolled protocol. Each `DataWriter` streams its
  * partition into a uniquely-named staged file and reports it in its
  * commit MESSAGE; the driver's `BatchWrite.commit` promotes exactly the
  * reported files (the commit coordinator guarantees one committed
  * attempt per partition), `abort` deletes the staging dir. `TRUNCATE`
  * capability maps `.mode("overwrite")`: prior output is cleared at
  * job-commit time, after every task has succeeded — never before. */
class AvroWriteBuilder(path: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new AvroBatchWrite(path, info.schema(), info.queryId(), doTruncate)
  }
}

case class AvroFileCommit(partitionId: Int, fileName: String, rows: Long)
  extends WriterCommitMessage

class AvroBatchWrite(path: String, schema: StructType, queryId: String,
    truncate: Boolean) extends BatchWrite {
  private val stagingName = s"_staging_${queryId.replace("-", "")}"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val spark = SparkSession.active
    new AvroWriterFactory(
      AvroIO.confSnapshot(spark.sparkContext.hadoopConfiguration),
      schema.json, s"${path.stripSuffix("/")}/$stagingName")
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val dest = new Path(path)
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dest) && truncate) {
      fs.listStatus(dest).foreach { s =>
        if (s.getPath.getName != stagingName) fs.delete(s.getPath, true)
      }
    }
    if (!fs.exists(dest)) fs.mkdirs(dest)
    // job-unique committed names: append mode must not collide with files
    // from earlier writes (rename does not overwrite)
    val jobTag = stagingName.stripPrefix("_staging_").take(8)
    messages.map(_.asInstanceOf[AvroFileCommit]).sortBy(_.partitionId).foreach { m =>
      val from = new Path(s"${path.stripSuffix("/")}/$stagingName/${m.fileName}")
      val to = new Path(dest, f"part-${m.partitionId}%05d-$jobTag.avro")
      if (!fs.rename(from, to))
        throw new java.io.IOException(s"AvroSourceV2: commit rename failed: $from -> $to")
    }
    fs.delete(new Path(s"${path.stripSuffix("/")}/$stagingName"), true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val staging = new Path(s"${path.stripSuffix("/")}/$stagingName")
    staging.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(staging, true)
  }
}

class AvroWriterFactory(confSnap: Array[(String, String)], schemaJson: String,
    stagingBase: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    val avroSchema = AvroIO.toAvroSchema(schema)
    val conf = AvroIO.restoreConf(confSnap)
    val fileName = f"part-$partitionId%05d-t$taskId.avro"
    val p = new Path(s"$stagingBase/$fileName")
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    val writer = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](avroSchema))
    writer.setCodec(CodecFactory.deflateCodec(6))
    writer.setMeta(AvroIO.SparkSchemaMetaKey, schemaJson)
    writer.create(avroSchema, out)
    val toScala = CatalystTypeConverters.createToScalaConverter(schema)
    new DataWriter[InternalRow] {
      private var n = 0L
      override def write(record: InternalRow): Unit = {
        writer.append(AvroIO.rowToRecord(
          toScala(record).asInstanceOf[Row], schema, avroSchema))
        n += 1
      }
      override def commit(): WriterCommitMessage = {
        writer.close()
        AvroFileCommit(partitionId, fileName, n)
      }
      override def abort(): Unit = {
        writer.close()
        fs.delete(p, false)
      }
      override def close(): Unit = ()
    }
  }
}

class AvroScanBuilder(path: String, full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {
  import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}

  private var required: StructType = full
  private var countStars = 0
  override def pruneColumns(requiredSchema: StructType): Unit =
    // keep file field order so the projected reader schema resolves cleanly
    required = StructType(full.fields.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))

  /** COUNT(*) without grouping is answered from the container BLOCK
    * HEADERS (every Avro block carries its record count) — no
    * decompress, no per-record decode. Pushdown is PARTIAL
    * (`supportCompletePushDown` false): each file contributes one
    * per-partition count row and Spark's final agg sums them, so the
    * plan stays correct however many files there are. Anything beyond
    * CountStar (COUNT(col) needs null inspection, MIN/MAX need values —
    * Avro files carry no column statistics) declines the pushdown and
    * takes the decoding scan. */
  override def supportCompletePushDown(aggregation: Aggregation): Boolean = false
  override def pushAggregation(aggregation: Aggregation): Boolean = {
    val ok = aggregation.groupByExpressions.isEmpty &&
      aggregation.aggregateExpressions.nonEmpty &&
      aggregation.aggregateExpressions.forall(_.isInstanceOf[CountStar])
    if (ok) countStars = aggregation.aggregateExpressions.length
    ok
  }

  override def build(): Scan =
    if (countStars > 0) new AvroCountScan(path, countStars)
    else new AvroScan(path, full, required)
}

/** Block-header COUNT(*) scan: one partition per container file, each
  * emitting a single partial-count row summed by Spark's final agg. */
class AvroCountScan(path: String, nAggs: Int) extends Scan with Batch {
  override def readSchema(): StructType =
    StructType((0 until nAggs).map(i =>
      StructField(s"agg_$i", LongType, nullable = false)))
  override def toBatch: Batch = this
  override def description(): String = s"graft-avro $path count-pushdown(block-headers)"
  override def planInputPartitions(): Array[InputPartition] =
    AvroSourceV2.listFiles(path).map(f => AvroFilePartition(f): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = SparkSession.active
    new AvroCountReaderFactory(
      AvroIO.confSnapshot(spark.sparkContext.hadoopConfiguration), nAggs)
  }
}

class AvroCountReaderFactory(confSnap: Array[(String, String)], nAggs: Int)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[AvroFilePartition].file
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = {
        val p = new Path(file)
        val in = p.getFileSystem(AvroIO.restoreConf(confSnap)).open(p)
        val stream = new DataFileStream[GenericRecord](in,
          new GenericDatumReader[GenericRecord]())
        // walk block headers only: getBlockCount reads the count varint,
        // nextBlock skips the payload without decoding records
        var n = 0L
        try {
          while (stream.hasNext) { n += stream.getBlockCount; stream.nextBlock() }
        } finally stream.close()
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array.fill[Any](nAggs)(n))
      }
      override def close(): Unit = ()
    }
  }
}

class AvroScan(path: String, full: StructType, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-avro $path ReadSchema: ${required.fieldNames.mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] =
    AvroSourceV2.listFiles(path).map(f => AvroFilePartition(f): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = SparkSession.active
    new AvroReaderFactory(
      AvroIO.confSnapshot(spark.sparkContext.hadoopConfiguration),
      required.json, pruning = required.length < full.length)
  }
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new AvroMicroBatchStream(path, full, required)
}

/** Micro-batch face: each trigger picks up container files not seen at
  * the previous offset — an Avro LAND ZONE becomes a stream, the same
  * cadence as `streaming/LandIngest.drainLandZone` over JSONL. The
  * offset IS the sorted list of consumed files, so a restart replays
  * any batch deterministically from the checkpointed offset JSON alone
  * (no reliance on file-name ordering; our writers restart part
  * numbering per job). A production-hardened variant would compact that
  * list into a file log the way Spark's FileStreamSource does — the
  * batch-planning semantics here are exactly those, uncompacted. */
class AvroMicroBatchStream(path: String, full: StructType, required: StructType)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private val confSnap =
    AvroIO.confSnapshot(SparkSession.active.sparkContext.hadoopConfiguration)

  override def initialOffset(): Offset = AvroFilesOffset(Nil)
  override def latestOffset(): Offset =
    AvroFilesOffset(
      try AvroSourceV2.listFiles(path).sorted
      catch { case _: IllegalArgumentException => Nil }) // empty land zone
  override def deserializeOffset(json: String): Offset =
    AvroFilesOffset.fromJson(json)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[AvroFilesOffset].files.toSet
    end.asInstanceOf[AvroFilesOffset].files.filterNot(seen)
      .map(f => AvroFilePartition(f): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new AvroReaderFactory(confSnap, required.json,
      pruning = required.length < full.length)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class AvroFilesOffset(files: Seq[String])
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String =
    files.map(f => "\"" + f.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
      .mkString("[", ",", "]")
}

object AvroFilesOffset {
  def fromJson(json: String): AvroFilesOffset = {
    val t = json.trim.stripPrefix("[").stripSuffix("]").trim
    if (t.isEmpty) AvroFilesOffset(Nil)
    else AvroFilesOffset(t.split("\",\\s*\"").toSeq
      .map(_.stripPrefix("\"").stripSuffix("\"")
        .replace("\\\"", "\"").replace("\\\\", "\\")))
  }
}

case class AvroFilePartition(file: String) extends InputPartition

class AvroReaderFactory(confSnap: Array[(String, String)],
    schemaJson: String, pruning: Boolean) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[AvroFilePartition].file
    val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    val conf = AvroIO.restoreConf(confSnap)
    val p = new Path(file)
    val in = p.getFileSystem(conf).open(p)
    val reader =
      if (pruning)
        new GenericDatumReader[GenericRecord](null, AvroIO.toAvroSchema(schema))
      else new GenericDatumReader[GenericRecord]()
    val stream = new DataFileStream[GenericRecord](in, reader)
    val toCatalyst = CatalystTypeConverters.createToCatalystConverter(schema)
    new PartitionReader[InternalRow] {
      override def next(): Boolean = stream.hasNext
      override def get(): InternalRow =
        toCatalyst(AvroIO.recordToRow(stream.next(), schema)).asInstanceOf[InternalRow]
      override def close(): Unit = stream.close()
    }
  }
}
