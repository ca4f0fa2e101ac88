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
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
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
  * manifest; a read is the union of all manifests — or, with
  * `option("asOfManifest", <name>)`, of the snapshot sealed when that
  * manifest's job committed (time travel: the read is repeatable no
  * matter how many appends land afterwards).
  *
  * The STREAMING half ([[ManifestStreamingWrite]]) reuses the same task
  * mechanics but names the manifest by epochId, so a replayed micro-batch
  * finds its manifest already published and discards its duplicate files —
  * sink-side idempotency that upgrades the engine's at-least-once replay
  * to exactly-once. */
class ManifestFileSink extends TableProvider {

  override def supportsExternalMetadata(): Boolean = true

  /** Reads resolve the schema from the newest visible manifest (or the
    * `asOfManifest` snapshot when time-traveling); an empty target has no
    * schema (writes never consult it — ACCEPT_ANY_SCHEMA). */
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ManifestFileSink.storedSchema(
      options.get("path"), Option(options.get("asOfManifest")))
      .getOrElse(new StructType())

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

  /** Manifests in PUBLICATION order — modification time, not name (batch
    * manifests carry random UUID names, so name-order says nothing about
    * write order; ties break on name for determinism on coarse-mtime
    * filesystems). This order is also the snapshot timeline for
    * [[visibleFiles]]' time travel. */
  private[sources] def orderedManifests(path: String): Seq[File] =
    manifests(path).sortBy(f => (
      Files.getLastModifiedTime(f.toPath).to(java.util.concurrent.TimeUnit.NANOSECONDS),
      f.getName))

  /** Schema as of a snapshot (default: the most recently published). */
  private[sources] def storedSchema(
      path: String, asOf: Option[String] = None): Option[StructType] =
    snapshot(path, asOf).lastOption.map { m =>
      StructType.fromDDL(Files.readAllLines(m.toPath).get(0))
    }

  /** The manifest set visible at a snapshot: every manifest published at
    * or before `asOf` (a manifest file name), in publication order — each
    * job's commit is one manifest, so "as of manifest M" is exactly the
    * table state the moment M's job committed. Unknown names resolve to
    * the empty snapshot (nothing was visible "as of" a manifest that
    * never published). */
  private[sources] def snapshot(path: String, asOf: Option[String]): Seq[File] = {
    val ordered = orderedManifests(path)
    asOf match {
      case None => ordered
      case Some(name) => ordered.take(ordered.indexWhere(_.getName == name) + 1)
    }
  }

  /** (file, rows) entries visible at the snapshot. Distinct by file name:
    * task files are immutable once committed, so a file listed twice
    * (e.g. by a [[compact]] that crashed between publishing the combined
    * manifest and deleting its inputs) is the same data — deduping here
    * makes that crash window harmless instead of a double-read. */
  private[sources] def visibleFiles(
      path: String, asOf: Option[String] = None): Seq[(String, Long)] =
    snapshot(path, asOf).flatMap { m =>
      Files.readAllLines(m.toPath).asScala.drop(1).map { line =>
        val Array(f, n) = line.split("\t")
        (f, n.toLong)
      }
    }.distinctBy(_._1)

  /** Metadata maintenance: rewrite every published manifest into ONE
    * combined manifest, then delete the inputs — a long-lived append
    * target otherwise accumulates a manifest per job and pays an O(jobs)
    * listing on every read. Returns the number of manifests compacted
    * (0 = nothing to do). Crash-safe at every point: the combined
    * manifest publishes via the same atomic rename, a crash before the
    * input deletes leaves duplicate listings that [[visibleFiles]]
    * dedupes, and a concurrent append's new manifest is not in the input
    * set so it survives untouched. Snapshots sealed by the deleted
    * manifests are retired (the standard expire-snapshots trade). */
  def compact(path: String): Int = {
    val ms = orderedManifests(path)
    if (ms.size < 2) return 0
    val schema = StructType.fromDDL(Files.readAllLines(ms.last.toPath).get(0))
    val entries = ms.flatMap(m => Files.readAllLines(m.toPath).asScala.drop(1)).distinct
    val name = s"manifest-${java.util.UUID.randomUUID().toString}"
    val tmp = Paths.get(path, s".$name.tmp")
    Files.write(tmp, (schema.toDDL +: entries).asJava, StandardCharsets.UTF_8,
      StandardOpenOption.CREATE_NEW)
    Files.move(tmp, Paths.get(path, name),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    ms.foreach(m => Files.deleteIfExists(m.toPath))
    ms.size
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

  /** Publish a manifest listing `messages`' files under `name`, via
    * write-to-temp + atomic rename (a reader can never observe a
    * half-written manifest). Returns false — publishing NOTHING — if a
    * manifest of that name already exists: with epoch-derived names this
    * is the idempotency point for REPLAYED micro-batches, which is the
    * engine's actual contract (one driver; replays are sequential, after
    * the previous attempt crashed or finished). A stale `.tmp` from an
    * attempt that died between write and rename is deleted up front, so
    * the replay can't wedge on `CREATE_NEW`. A concurrent zombie-driver
    * race is NOT fenced here (POSIX rename replaces): both attempts carry
    * the same epoch's data, so the epoch converges to whichever complete
    * manifest landed last, and the loser's task files stay invisible —
    * readers resolve through manifests only. */
  private[sources] def publish(
      path: String,
      name: String,
      schema: StructType,
      messages: Array[WriterCommitMessage]): Boolean = {
    if (Files.exists(Paths.get(path, name))) return false
    val lines = schema.toDDL +: messages.collect {
      case CommittedFile(f, n) => s"$f\t$n"
    }.toSeq
    val tmp = Paths.get(path, s".$name.tmp")
    Files.deleteIfExists(tmp)
    Files.write(tmp, lines.asJava, StandardCharsets.UTF_8,
      StandardOpenOption.CREATE_NEW)
    Files.move(tmp, Paths.get(path, name),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    true
  }

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
      TableCapability.STREAMING_WRITE, TableCapability.ACCEPT_ANY_SCHEMA)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new ManifestBatchWrite(path, info.schema())
        override def toStreaming: StreamingWrite =
          new ManifestStreamingWrite(path, info.schema())
      }
    }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      // Time travel: `asOfManifest` pins the scan to the snapshot sealed
      // by that manifest's commit — reads are repeatable against it no
      // matter how many appends land afterwards.
      private val asOf = Option(options.get("asOfManifest"))
      override def build(): Scan = new ManifestScan(path,
        ManifestFileSink.storedSchema(path, asOf).getOrElse(new StructType()),
        asOf)
    }
}

private case class CommittedFile(file: String, rows: Long) extends WriterCommitMessage

private class ManifestBatchWrite(path: String, schema: StructType) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new ManifestWriterFactory(path, schema)

  /** The atomic visibility point: only files that made it into a task
    * commit message are listed — an attempt that wrote bytes but never
    * committed stays permanently invisible. The UUID name never collides,
    * so batch publication is unconditional. */
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    ManifestFileSink.publish(path,
      s"manifest-${java.util.UUID.randomUUID().toString}", schema, messages)

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case CommittedFile(f, _) => Files.deleteIfExists(Paths.get(path, "data", f))
      case _ =>
    }
}

private class ManifestWriterFactory(path: String, schema: StructType)
  extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    // taskId is unique per attempt, so a speculative/retried attempt
    // can never clobber another attempt's file.
    new ManifestDataWriter(path, schema, f"part-$partitionId%05d-$taskId")
}

private class ManifestDataWriter(path: String, schema: StructType, name: String)
  extends DataWriter[InternalRow] {

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

/** Streaming half of the write protocol: identical task-file mechanics,
  * but the job-level commit is keyed by `epochId` — the micro-batch id the
  * engine replays VERBATIM after a failure. The manifest is named by
  * epoch, so a replayed epoch whose predecessor already published finds
  * the manifest present, deletes its own (duplicate) task files, and
  * publishes nothing — see [[ManifestFileSink.publish]] for the exact
  * guarantee (sequential replay fenced; a concurrent zombie driver
  * converges to one complete manifest of the same epoch's data). Sink-side
  * idempotency + the engine's replay = end-to-end exactly-once, the same
  * contract H2Sink.writeBatch implements with a staging-table swap. */
private class ManifestStreamingWrite(path: String, schema: StructType)
  extends StreamingWrite {

  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new ManifestStreamingWriterFactory(path, schema)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val published = ManifestFileSink.publish(
      path, f"manifest-e$epochId%012d", schema, messages)
    if (!published) messages.foreach {
      case CommittedFile(f, _) => Files.deleteIfExists(Paths.get(path, "data", f))
      case _ =>
    }
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case CommittedFile(f, _) => Files.deleteIfExists(Paths.get(path, "data", f))
      case _ =>
    }
}

/** Top-level (not an inner class of the non-serializable write) — it is
  * shipped to executors. */
private class ManifestStreamingWriterFactory(path: String, schema: StructType)
  extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    // Epoch in the name is for operator forensics only; uniqueness
    // still rests on the attempt-unique taskId.
    new ManifestDataWriter(path, schema, f"part-e$epochId-$partitionId%05d-$taskId")
}

private case class FileSplit(file: String) extends InputPartition

private class ManifestScan(
    path: String, schema: StructType, asOf: Option[String] = None)
  extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"ManifestScan($path${asOf.fold("")(m => s", asOf=$m")})"

  override def planInputPartitions(): Array[InputPartition] =
    ManifestFileSink.visibleFiles(path, asOf)
      .map(f => FileSplit(f._1): InputPartition).toArray

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
