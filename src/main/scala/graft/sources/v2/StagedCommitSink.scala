package graft.sources.v2

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.jdk.CollectionConverters._

/** DataSource V2 WRITE path: a two-phase-commit file sink demonstrating
  * the exactly-once batch-write protocol —
  *
  *  1. each task writes its rows to a STAGING file only at task
  *     `commit()` (nothing touches disk for failed/retried attempts;
  *     the attempt id makes concurrent speculative attempts collide-free);
  *  2. the `WriterCommitMessage` carries the staged file name + row
  *     count back to the driver;
  *  3. the driver's job `commit()` atomically promotes every staged
  *     file into the destination and stamps `_SUCCESS` with the file
  *     manifest; `abort()` deletes the staging area instead.
  *
  * Readers that require `_SUCCESS` therefore see all-or-nothing output —
  * the same rename-manifest protocol cloud committers use (staging =
  * task-attempt namespace, promote = driver-side finalize). Rows are
  * encoded as TSV (the protocol, not the format, is the point).
  *
  * Usage: `df.write.format(classOf[StagedCommitSink].getName)
  *   .option("path", dir).save()`.
  *
  * Filesystem contract: staging and promotion use java.nio local-path
  * moves, so executors and the driver MUST share one filesystem — true in
  * local mode and on a shared mount (NFS/FUSE-mounted object store). On a
  * real cluster with executor-local disks, the same protocol runs over
  * `org.apache.hadoop.fs.FileSystem` (task stages to
  * `hdfs://.../_staging/`, driver renames within the store) — the commit
  * sequence below is unchanged, only the path API differs.
  *
  * Re-writing an existing destination is overwrite-by-replacement: job
  * commit first removes the previous `_SUCCESS` (readers keyed on it stop
  * seeing the old output), then any previously committed part files, then
  * promotes the new staged set and stamps a fresh manifest — so a second
  * save never leaves stale parts alongside the new manifest.
  */
class StagedCommitSink extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true // schema := df schema
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StructType(Nil) // write-only source
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new StagedSinkTable(properties.get("path"), schema)
}

class StagedSinkTable(path: String, writeSchema: StructType)
    extends Table with SupportsWrite {
  require(path != null, "StagedCommitSink requires .option(\"path\", ...)")
  override def name(): String = s"staged_sink($path)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new StagedWrite(path, info.schema())
    }
}

case class StagedFile(name: String, rows: Long) extends WriterCommitMessage

class StagedWrite(path: String, schema: StructType) extends Write with BatchWrite {
  override def toBatch: BatchWrite = this
  override def description(): String = s"StagedCommitSink($path)"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val dest = path
    val fields = schema.fields.map(_.dataType)
    (partitionId: Int, taskId: Long) =>
      new DataWriter[InternalRow] {
        // rows stream straight to the attempt-unique staging file — O(1)
        // task memory (buffering the partition would OOM on a multi-GB
        // split). Two-phase safety is unchanged: the file is invisible
        // until the DRIVER promotes it at job commit; abort() deletes
        // the partial file, and stray files from dead attempts are swept
        // by cleanupStaging at job commit/abort, never promoted.
        private val staging = Paths.get(dest, "_staging")
        Files.createDirectories(staging)
        private val name = f"part-$partitionId%05d-$taskId"
        private val out = Files.newBufferedWriter(staging.resolve(name),
          java.nio.charset.StandardCharsets.UTF_8)
        private var rows = 0L
        override def write(row: InternalRow): Unit = {
          out.write(fields.zipWithIndex.map { case (dt, i) =>
            if (row.isNullAt(i)) "" else String.valueOf(row.get(i, dt))
          }.mkString("\t"))
          out.write("\n")
          rows += 1
        }
        override def commit(): WriterCommitMessage = {
          out.close()
          StagedFile(name, rows)
        }
        override def abort(): Unit = {
          out.close()
          Files.deleteIfExists(staging.resolve(name))
        }
        override def close(): Unit = ()
      }
  }

  // driver-side finalize: promote every staged file, then the manifest —
  // readers keyed on _SUCCESS see all-or-nothing output
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val destDir = Paths.get(path)
    Files.createDirectories(destDir)
    val staged = messages.map(_.asInstanceOf[StagedFile])
    // Overwrite-by-replacement: drop the old manifest FIRST (readers keyed
    // on _SUCCESS stop trusting the directory), then stale parts from any
    // prior commit — otherwise a smaller re-write leaves the previous
    // run's extra part files under the new manifest.
    Files.deleteIfExists(destDir.resolve("_SUCCESS"))
    // close the listing stream: an unclosed Files.list leaks a directory
    // fd per write job on a long-lived driver
    locally {
      val listing = Files.list(destDir)
      try listing.iterator().asScala
        .filter(p => Files.isRegularFile(p))
        .foreach(Files.delete)
      finally listing.close()
    }
    staged.foreach { m =>
      Files.move(destDir.resolve("_staging").resolve(m.name),
        destDir.resolve(m.name), StandardCopyOption.ATOMIC_MOVE)
    }
    Files.write(destDir.resolve("_SUCCESS"),
      staged.map(m => s"${m.name}\t${m.rows}").sorted.mkString("\n").getBytes("UTF-8"))
    cleanupStaging()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = cleanupStaging()

  private def cleanupStaging(): Unit = {
    val staging = Paths.get(path, "_staging")
    if (Files.exists(staging)) {
      val listing = Files.list(staging)
      try listing.iterator().asScala.foreach(Files.delete)
      finally listing.close()
      Files.delete(staging)
    }
  }
}
