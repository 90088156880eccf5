package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.SpecificInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 for the 1BRC text format (`station;d?d.d` lines): the
  * reference's chunk-aligned byte scanner (rust_1brc/src/main.rs:174-198,
  * thebracket.rs:112-150) re-expressed as a Spark connector.
  *
  * The generic path (`spark.read.text` + parse expressions) materializes a
  * Hadoop `Text` and a line `UTF8String` per row before parsing. This
  * reader fuses line splitting and parsing into one pass over a reused
  * 4 MiB buffer: per row it allocates exactly the station key slice and
  * writes the measure as a primitive long (integer tenths, R4/R5
  * semantics) into a reused mutable row — nothing else.
  *
  * Split semantics are the standard chunk-aligned contract (identical to
  * LineRecordReader, and to the reference's CHUNK boundary rule at
  * rust_1brc/src/main.rs:177-186): a split owns every line that STARTS in
  * (start, end] — plus offset 0 for the first split — because a split
  * starting at `start > 0` unconditionally skips forward past its first
  * '\n'. Splits default to 128 MiB ("brc.split.bytes").
  *
  * Usage: `spark.read.format("brc").load(paths...)` → schema
  * `(station STRING, t LONG)`. Malformed measures are hard errors
  * (the reference's error-not-skip semantics, main.rs:141-150) whenever
  * `t` is projected; a pruned scan (count(*), station-only) validates
  * only line structure, not the measure bytes it never reads.
  */
class BrcDataSource extends TableProvider
  with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "brc" // spark.read.format("brc")

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BrcDataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // DataFrameReader stores one load() path under "path", several under
    // "paths" as a JSON array
    val paths = (Option(properties.get("path")).map(Seq(_)) orElse
      Option(properties.get("paths")).map { js =>
        new com.fasterxml.jackson.databind.ObjectMapper()
          .readValue(js, classOf[Array[String]]).toSeq
      }).getOrElse(Seq.empty)
    require(paths.nonEmpty,
      "brc source requires at least one path: spark.read.format(\"brc\").load(path, ...)")
    // option names are case-insensitive, like every built-in source
    val opts = new CaseInsensitiveStringMap(properties)
    new BrcTable(paths,
      opts.getLong("brc.split.bytes", 128L * 1024 * 1024))
  }
}

object BrcDataSource {
  val schema: StructType = StructType(Seq(
    StructField("station", StringType, nullable = false),
    StructField("t", LongType, nullable = false)))
}

class BrcTable(paths: Seq[String], splitBytes: Long)
  extends Table with SupportsRead
  with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"brc(${paths.mkString(",")})"
  override def schema(): StructType = BrcDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE).asJava

  /** The WRITE half of the connector (q176): rows (station, t-tenths)
    * serialize back to `station;d?dd.d` lines — the same wire format the
    * scan parses, so write→read round-trips bit-exactly. Each task
    * streams its partition through one buffered output (no row
    * materialization beyond the line bytes); files are task-unique
    * (partitionId-taskId), so retries/speculation never clobber, commit
    * is a no-op and abort best-effort deletes. Overwrite mode arrives as
    * SupportsTruncate — existing data files are cleared once,
    * driver-side, before the factory ships. */
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    require(paths.length == 1,
      s"brc sink writes to exactly one directory, got $paths")
    require(info.schema().map(f => (f.name, f.dataType)) ==
      BrcDataSource.schema.map(f => (f.name, f.dataType)),
      s"brc sink requires schema (station STRING, t LONG), got ${info.schema()}")
    val sconf = new org.apache.spark.util.SerializableConfiguration(
      org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())
    new org.apache.spark.sql.connector.write.WriteBuilder
      with org.apache.spark.sql.connector.write.SupportsTruncate {
      private var doTruncate = false
      override def truncate()
          : org.apache.spark.sql.connector.write.WriteBuilder = {
        doTruncate = true; this
      }
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.Write {
          override def toBatch
              : org.apache.spark.sql.connector.write.BatchWrite =
            new BrcBatchWrite(paths.head, doTruncate, sconf)
        }
    }
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // capture the BUILDING session's Hadoop conf (spark.hadoop.* creds,
    // fs.defaultFS) here, while that session is active on this thread —
    // resolving SparkSession.active later, at plan/execute time, can pick a
    // different session's conf (or none) in multi-session apps
    val sconf = new org.apache.spark.util.SerializableConfiguration(
      org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())
    new ScanBuilder with SupportsPushDownRequiredColumns {
      private var pruned = BrcDataSource.schema
      override def pruneColumns(requiredSchema: StructType): Unit =
        pruned = requiredSchema
      override def build(): Scan = new BrcScanV2(paths, splitBytes, pruned, sconf)
    }
  }
}

case class BrcCommitMessage(path: String)
  extends org.apache.spark.sql.connector.write.WriterCommitMessage

class BrcBatchWrite(dir: String, truncate: Boolean,
    sconf: org.apache.spark.util.SerializableConfiguration)
  extends org.apache.spark.sql.connector.write.BatchWrite {

  override def createBatchWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.DataWriterFactory = {
    // driver-side, once per job: prepare the target dir
    val p = new Path(dir)
    val fs = p.getFileSystem(sconf.value)
    if (truncate && fs.exists(p))
      fs.listStatus(p).filter(s =>
        !(s.getPath.getName.startsWith("_") ||
          s.getPath.getName.startsWith(".")) ||
          s.getPath.getName.endsWith(".inprogress")) // crashed-writer orphans
        .foreach(s => fs.delete(s.getPath, false))
    fs.mkdirs(p)
    BrcWriterFactory(dir, sconf)
  }
  override def commit(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage])
      : Unit = {} // task files are final already
  override def abort(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage])
      : Unit = {
    val fs = new Path(dir).getFileSystem(sconf.value)
    messages.collect { case BrcCommitMessage(p) =>
      fs.delete(new Path(p), false)
    }
    ()
  }
}

case class BrcWriterFactory(dir: String,
    sconf: org.apache.spark.util.SerializableConfiguration)
  extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new BrcDataWriter(s"$dir/part-$partitionId-$taskId.brc", sconf)
}

/** Serializes (station UTF8String, t tenths) to `station;d?dd.d\n` —
  * digit arithmetic, no String/format allocation per row. */
class BrcDataWriter(path: String,
    sconf: org.apache.spark.util.SerializableConfiguration)
  extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {

  private val p = new Path(path)
  // COMMIT PROTOCOL: bytes go to a dot-prefixed staging name and the
  // task COMMIT renames it to the final name (an atomic same-dir rename
  // on posix/HDFS). Readers — this connector and every built-in file
  // source — skip hidden names, so a writer that dies mid-write (its
  // abort() never runs: executor loss) leaves only an invisible orphan,
  // never a partial file that a later read silently unions with the
  // retry's output. Double-commit of one partition is excluded by
  // Spark's output commit coordinator (BatchWrite.useCommitCoordinator
  // defaults true); truncate-mode job setup sweeps old orphans.
  private val fs = p.getFileSystem(sconf.value)
  private val staging = new Path(p.getParent, s".${p.getName}.inprogress")
  private val out = new java.io.BufferedOutputStream(
    fs.create(staging, true), 1 << 20)

  override def write(row: InternalRow): Unit = {
    out.write(row.getUTF8String(0).getBytes)
    out.write(';')
    var t = row.getLong(1)
    if (t < 0) { out.write('-'); t = -t }
    val ip = t / 10
    if (ip > 999) // the read side's honest 1-3-digit domain, enforced
      throw new IllegalArgumentException(
        s"brc sink: |t| = $t tenths exceeds the 1BRC 999.9 domain")
    if (ip >= 100) out.write('0' + (ip / 100).toInt)
    if (ip >= 10) out.write('0' + (ip / 10 % 10).toInt)
    out.write('0' + (ip % 10).toInt)
    out.write('.')
    out.write('0' + (t % 10).toInt)
    out.write('\n')
  }
  override def commit()
      : org.apache.spark.sql.connector.write.WriterCommitMessage = {
    out.close()
    if (!fs.rename(staging, p))
      throw new java.io.IOException(
        s"brc sink: failed to publish $staging as $p")
    BrcCommitMessage(path)
  }
  override def abort(): Unit = {
    out.close()
    fs.delete(staging, false)
    ()
  }
  override def close(): Unit = {}
}

class BrcScanV2(paths: Seq[String], splitBytes: Long, pruned: StructType,
    sconf: org.apache.spark.util.SerializableConfiguration)
  extends Scan with Batch {
  override def readSchema(): StructType = pruned
  override def toBatch: Batch = this
  override def description(): String =
    s"BrcScan ${paths.mkString(",")} ${pruned.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = sconf.value
    paths.flatMap { path =>
      val p = new Path(path)
      val fs = p.getFileSystem(conf)
      def files(st: FileStatus): Seq[FileStatus] =
        if (st.isDirectory)
          fs.listStatus(st.getPath).toSeq
            .filterNot(s => s.getPath.getName.startsWith("_") ||
              s.getPath.getName.startsWith("."))
            .flatMap(files)
        else Seq(st)
      // globStatus expands dir/*.csv like every built-in file source;
      // for a non-glob path it returns the plain status (or null when the
      // path does not exist — fall back to getFileStatus for its
      // FileNotFoundException message). Glob matches exclude hidden /
      // metadata names (_SUCCESS, .crc) just like the directory-listing
      // branch and the built-in sources; an explicitly named literal path
      // is honored even if hidden (the user asked for that exact file).
      val isGlob = path.exists("{}[]*?\\".contains(_))
      val matched = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
        .filterNot(s => isGlob &&
          (s.getPath.getName.startsWith("_") || s.getPath.getName.startsWith(".")))
      val roots = if (matched.nonEmpty) matched else Seq(fs.getFileStatus(p))
      roots.flatMap(files).flatMap { st =>
        (0L until st.getLen by splitBytes).map { off =>
          BrcInputPartition(st.getPath.toString, off,
            math.min(off + splitBytes, st.getLen))
        }
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // capture only serializable values, not `this`
    val fieldNames = pruned.fieldNames.toSeq
    val confForReaders = sconf
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new BrcPartitionReader(partition.asInstanceOf[BrcInputPartition],
          fieldNames, confForReaders)
    }
  }
}

case class BrcInputPartition(path: String, start: Long, end: Long)
  extends InputPartition

/** One pass over [start, end): reused 4 MiB buffer, reused mutable row.
  * Lines span buffer refills via compaction (the tail fragment is moved to
  * the buffer head before the next read — the CHUNK_EXCESS carry-over,
  * rust_1brc/src/main.rs:22-25, without the bounded-line-length bet). */
class BrcPartitionReader(p: BrcInputPartition, fields: Seq[String],
    sconf: org.apache.spark.util.SerializableConfiguration)
  extends PartitionReader[InternalRow] {

  // column pruning: parse work is proportional to the projected columns —
  // a count(*) scan only splits lines, a station-only scan never parses
  // the measure (so measure malformation surfaces only when `t` is read)
  private val stationOrd = fields.indexOf("station")
  private val tOrd = fields.indexOf("t")

  private val in = {
    val hp = new Path(p.path)
    val stream = hp.getFileSystem(sconf.value).open(hp)
    stream.seek(p.start)
    stream
  }
  private val buf = new Array[Byte](4 * 1024 * 1024)
  private var limit = 0           // valid bytes in buf
  private var pos = 0             // cursor within buf
  private var filePos = p.start   // file offset of buf(0)
  private var exhausted = false
  private val row = new SpecificInternalRow(
    StructType(fields.map(BrcDataSource.schema(_))))

  // a split starting mid-file begins at the first line AFTER the next '\n'
  // (that partial line belongs to the previous split)
  if (p.start > 0) { fill(); skipPastNewline() }

  /** refill buf, compacting [pos, limit) to the front. @return got bytes */
  private def fill(): Boolean = {
    if (pos > 0) {
      System.arraycopy(buf, pos, buf, 0, limit - pos)
      filePos += pos; limit -= pos; pos = 0
    }
    var n = 0
    while (limit < buf.length && n >= 0) {
      n = in.read(buf, limit, buf.length - limit)
      if (n > 0) limit += n
    }
    if (n < 0 && limit == pos) { exhausted = true; false } else limit > pos
  }

  private def skipPastNewline(): Unit = {
    while (true) {
      while (pos < limit) {
        if (buf(pos) == '\n') { pos += 1; return }
        pos += 1
      }
      if (!fill()) return
    }
  }

  override def next(): Boolean = {
    // own lines that START in (start, end] — a line starting exactly at
    // `end` is ours, because the next split (seeking to `end` mid-line or
    // at its start) unconditionally skips past its first '\n'
    while (true) {
      if (filePos + pos > p.end || exhausted) return false
      // find the line terminator; refill (compacting) if it's cut off
      var nl = pos
      while (nl < limit && buf(nl) != '\n') nl += 1
      if (nl >= limit) {
        val before = limit - pos
        if (!fill()) {
          if (limit == pos) return false
          nl = limit // final line without trailing newline
        } else {
          nl = before // resume scan after compaction (pos is now 0)
          while (nl < limit && buf(nl) != '\n') nl += 1
          if (nl >= limit && limit == buf.length)
            throw new IllegalStateException(
              s"line longer than ${buf.length} bytes in ${p.path}")
        }
      }
      val lineStart = pos
      val lineEnd = if (nl > lineStart && buf(nl - 1) == '\r') nl - 1 else nl
      pos = math.min(nl + 1, limit)
      if (lineEnd > lineStart) {
        if (stationOrd >= 0 || tOrd >= 0) {
          var sep = lineStart
          while (sep < lineEnd && buf(sep) != ';') sep += 1
          if (tOrd >= 0) {
            val t = if (sep < lineEnd)
              graft.functions.BrcParse.parseTenthsRange(buf, sep + 1, lineEnd)
            else Long.MinValue
            if (t == Long.MinValue)
              throw new IllegalArgumentException("malformed 1BRC line: " +
                new String(buf, lineStart, lineEnd - lineStart, "UTF-8"))
            row.setLong(tOrd, t)
          }
          if (stationOrd >= 0) {
            if (sep >= lineEnd)
              throw new IllegalArgumentException("missing ';' in 1BRC line: " +
                new String(buf, lineStart, lineEnd - lineStart, "UTF-8"))
            row.update(stationOrd, UTF8String.fromBytes(
              java.util.Arrays.copyOfRange(buf, lineStart, sep)))
          }
        }
        return true
      }
      // empty line: loop to the next one
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}
