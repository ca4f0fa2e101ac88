package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 WRITE path with an explicit commit protocol — the shape a
  * bespoke destination (the reference is one) must implement to get
  * exactly-once batch writes out of Spark's task model:
  *
  *   - each task attempt writes its own uniquely-named file under `data/`
  *     and reports it in a [[WriterCommitMessage]] on task commit;
  *   - the DRIVER's `BatchWrite.commit` makes the job visible atomically
  *     by writing a manifest that lists exactly the committed files —
  *     readers resolve visibility through manifests ONLY, so files from
  *     failed/speculative/orphaned attempts are never observed even
  *     though they physically exist;
  *   - task `abort` deletes the attempt's file; job `abort` deletes every
  *     file named in the received commit messages.
  *
  * This mirrors the FileOutputCommitter/Iceberg-manifest idea in the
  * smallest form that still demonstrates every hook. The row format is a
  * deliberately simple TSV over long/int/double/boolean/string (nulls as
  * `\N`; tabs/newlines in strings unsupported) — the protocol, not the
  * encoding, is the point. Appends accumulate: each job adds one
  * manifest; a read is the union of all manifests. */
class ManifestFileSink extends TableProvider {

  override def supportsExternalMetadata(): Boolean = true

  /** Reads resolve the schema from the newest manifest; an empty target
    * has no schema (writes never consult it — ACCEPT_ANY_SCHEMA). */
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ManifestFileSink.storedSchema(options.get("path")).getOrElse(new StructType())

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ManifestTable(properties.get("path"), schema)
}

object ManifestFileSink {
  private[sources] def manifests(path: String): Seq[File] = {
    val d = new File(path)
    if (!d.isDirectory) Seq.empty
    else d.listFiles().filter(_.getName.startsWith("manifest-")).sortBy(_.getName).toSeq
  }

  private[sources] def storedSchema(path: String): Option[StructType] =
    manifests(path).lastOption.map { m =>
      StructType.fromDDL(Files.readAllLines(m.toPath).get(0))
    }

  /** (file, rows) entries of every manifest — the complete visible set. */
  private[sources] def visibleFiles(path: String): Seq[(String, Long)] =
    manifests(path).flatMap { m =>
      Files.readAllLines(m.toPath).asScala.drop(1).map { line =>
        val Array(f, n) = line.split("\t")
        (f, n.toLong)
      }
    }

  private[sources] def render(row: InternalRow, schema: StructType): String =
    schema.fields.indices.map { i =>
      if (row.isNullAt(i)) "\\N"
      else schema.fields(i).dataType match {
        case LongType    => row.getLong(i).toString
        case IntegerType => row.getInt(i).toString
        case DoubleType  => row.getDouble(i).toString
        case BooleanType => row.getBoolean(i).toString
        case StringType  => row.getUTF8String(i).toString
        case dt => throw new IllegalArgumentException(s"unsupported type $dt")
      }
    }.mkString("\t")

  private[sources] def parse(line: String, schema: StructType): InternalRow = {
    val parts = line.split("\t", -1)
    InternalRow.fromSeq(schema.fields.indices.map { i =>
      val v = parts(i)
      if (v == "\\N") null
      else schema.fields(i).dataType match {
        case LongType    => v.toLong
        case IntegerType => v.toInt
        case DoubleType  => v.toDouble
        case BooleanType => v.toBoolean
        case StringType  => UTF8String.fromString(v)
        case dt => throw new IllegalArgumentException(s"unsupported type $dt")
      }
    })
  }
}

private class ManifestTable(path: String, schema: StructType)
  extends Table with SupportsWrite with SupportsRead {

  override def name(): String = s"manifest_sink($path)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.ACCEPT_ANY_SCHEMA)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new ManifestBatchWrite(path, info.schema())
      }
    }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new ManifestScan(path,
        ManifestFileSink.storedSchema(path).getOrElse(new StructType()))
    }
}

private case class CommittedFile(file: String, rows: Long) extends WriterCommitMessage

private class ManifestBatchWrite(path: String, schema: StructType) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new ManifestWriterFactory(path, schema)

  /** The atomic visibility point: write-to-temp + rename keeps a reader
    * from ever observing a half-written manifest. Only files that made it
    * into a task commit message are listed — an attempt that wrote bytes
    * but never committed stays permanently invisible. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val id = java.util.UUID.randomUUID().toString
    val lines = schema.toDDL +: messages.collect {
      case CommittedFile(f, n) => s"$f\t$n"
    }.toSeq
    val tmp = Paths.get(path, s".manifest-$id.tmp")
    Files.write(tmp, lines.asJava, StandardCharsets.UTF_8,
      StandardOpenOption.CREATE_NEW)
    Files.move(tmp, Paths.get(path, s"manifest-$id"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case CommittedFile(f, _) => Files.deleteIfExists(Paths.get(path, "data", f))
      case _ =>
    }
}

private class ManifestWriterFactory(path: String, schema: StructType)
  extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      // taskId is unique per attempt, so a speculative/retried attempt
      // can never clobber another attempt's file.
      private val name = f"part-$partitionId%05d-$taskId"
      private val file = Paths.get(path, "data", name)
      Files.createDirectories(file.getParent)
      private val out = Files.newBufferedWriter(file, StandardCharsets.UTF_8,
        StandardOpenOption.CREATE_NEW)
      private var rows = 0L

      override def write(record: InternalRow): Unit = {
        out.write(ManifestFileSink.render(record, schema)); out.write("\n")
        rows += 1
      }
      override def commit(): WriterCommitMessage = {
        out.close()
        CommittedFile(name, rows)
      }
      override def abort(): Unit = {
        out.close()
        Files.deleteIfExists(file)
      }
      override def close(): Unit = ()
    }
}

private case class FileSplit(file: String) extends InputPartition

private class ManifestScan(path: String, schema: StructType) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String = s"ManifestScan($path)"

  override def planInputPartitions(): Array[InputPartition] =
    ManifestFileSink.visibleFiles(path).map(f => FileSplit(f._1): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory = {
    val (p, s) = (path, schema)
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val lines = Files.readAllLines(
          Paths.get(p, "data", partition.asInstanceOf[FileSplit].file)).iterator()
        new PartitionReader[InternalRow] {
          private var cur: InternalRow = _
          override def next(): Boolean = {
            val has = lines.hasNext
            if (has) cur = ManifestFileSink.parse(lines.next(), s)
            has
          }
          override def get(): InternalRow = cur
          override def close(): Unit = ()
        }
      }
    }
  }
}
