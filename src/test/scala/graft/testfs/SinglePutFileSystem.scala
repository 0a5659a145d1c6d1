package graft.testfs

import java.io.{ByteArrayOutputStream, OutputStream}
import java.net.URI
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Object-store EMULATION for the fault-injection matrix: a Hadoop
  * FileSystem over local disk with single-PUT create semantics —
  *
  *   - `create` buffers the whole object and publishes it atomically
  *     on `close()`; an unclosed (crashed) write leaves NOTHING
  *     visible, exactly the S3/GCS contract the metadata plane's
  *     direct-PUT commit path (FileIO.writeAtomic) relies on;
  *   - `append` refuses (object stores cannot append);
  *   - every `rename` is RECORDED in [[SinglePutFileSystem.renames]]
  *     before delegating, so a spec can assert the metadata plane
  *     performed ZERO stage-then-rename commits over this scheme (the
  *     `path + ".tmp"` pattern that is only correct where rename is
  *     atomic).
  *
  * Wire it in with
  * `spark.hadoop.fs.graftput.impl = classOf[SinglePutFileSystem]` and
  * `spark.hadoop.graft.fileio.direct-put-schemes = graftput`, then run
  * any store contract over `graftput:` paths.
  */
class SinglePutFileSystem extends RawLocalFileSystem {

  override def getScheme: String = "graftput"
  override def getUri: URI = URI.create("graftput:///")

  // `create(overwrite = false)` emulates the CONDITIONAL PUT
  // (`If-None-Match: *`): the existence precondition is enforced AT
  // PUBLISH TIME (close), atomically — not by the check-then-act
  // upstream `exists` test — so a racing-committers spec exercises
  // the same all-or-nothing decide-at-PUT contract the real stores
  // give. The flag rides a ThreadLocal from the create overload into
  // the stream (createOutputStreamWithMode does not see `overwrite`).
  private val conditional = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = java.lang.Boolean.FALSE
  }

  override def create(
      f: Path, overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long,
      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream = {
    conditional.set(!overwrite)
    try super.create(f, overwrite, bufferSize, replication, blockSize,
      progress)
    finally conditional.set(java.lang.Boolean.FALSE)
  }

  // EVERY RawLocalFileSystem create/append funnels through this hook
  // (the permission-variant `create` overloads do not — RawLocal's own
  // overloads bypass them), so this is the one interception point that
  // covers the metadata plane AND Spark's parquet writers alike.
  override protected def createOutputStreamWithMode(
      f: Path, append: Boolean,
      permission: FsPermission): OutputStream = {
    if (append)
      throw new UnsupportedOperationException(
        "graftput emulates an object store: append is not supported")
    val target = pathToFile(f)
    if (target.getParentFile != null) target.getParentFile.mkdirs()
    val ifNoneMatch: Boolean = conditional.get()
    val buf = new ByteArrayOutputStream()
    new OutputStream {
      private var closed = false
      override def write(b: Int): Unit = buf.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        buf.write(b, off, len)
      override def close(): Unit = {
        if (closed) return
        closed = true
        // the PUT: all-or-nothing publication (internal mechanics —
        // the hidden staging name is never visible to list())
        val tmp = java.nio.file.Files.createTempFile(
          target.getParentFile.toPath, ".inflight-", ".put")
        java.nio.file.Files.write(tmp, buf.toByteArray)
        if (ifNoneMatch) {
          // conditional publish: hard-link creation is atomic AND
          // refuses an existing target (If-None-Match semantics —
          // a plain rename(2) would silently replace)
          try java.nio.file.Files.createLink(target.toPath, tmp)
          catch {
            case _: java.nio.file.FileAlreadyExistsException =>
              throw new org.apache.hadoop.fs.FileAlreadyExistsException(
                s"conditional PUT lost: $f already exists")
          } finally java.nio.file.Files.deleteIfExists(tmp)
        } else
          java.nio.file.Files.move(tmp, target.toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      }
    }
  }

  override def rename(src: Path, dst: Path): Boolean = {
    SinglePutFileSystem.renames.add(src.toString -> dst.toString)
    super.rename(src, dst)
  }
}

object SinglePutFileSystem {
  /** Every rename ever routed through the scheme, for assertions. */
  val renames = new ConcurrentLinkedQueue[(String, String)]()

  /** Idempotent wiring of the scheme into a session (Hadoop FS conf +
    * the FileIO direct-PUT scheme list, via both the SparkContext
    * Hadoop conf and the SQL `spark.hadoop.*` overlay so every
    * `newHadoopConf()` clone carries it). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cls = classOf[SinglePutFileSystem].getName
    spark.sparkContext.hadoopConfiguration.set("fs.graftput.impl", cls)
    spark.sparkContext.hadoopConfiguration.set(
      "graft.fileio.direct-put-schemes", "graftput")
    spark.conf.set("spark.hadoop.fs.graftput.impl", cls)
    spark.conf.set(
      "spark.hadoop.graft.fileio.direct-put-schemes", "graftput")
  }
}
