package graft.storage

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.UUID
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** A small manifest-committed parquet table: append-only segments with
  * atomic visibility and copy-on-write rewrite. The shared storage
  * primitive under the derived-view layers ([[graft.multilog.MultiLog]]
  * index table, [[graft.indexes.KVIndex]] upsert table) — the Spark
  * analogue of the reference's pluggable `persist.Saver` KV backends
  * (internal/persist/interface.go:13-35): where the reference has
  * fs/SQLite/Badger/mkv, we have immutable parquet + a manifest, and
  * backend plurality collapses into path configuration.
  *
  * `version` doubles as an update-ordering epoch: each committed batch
  * gets a strictly increasing version, which the KV layer uses for
  * last-write-wins resolution.
  */
final class TableStore private (
    val spark: SparkSession,
    val dir: String,
    val schema: StructType,
    @volatile private var manifest: Manifest
) {

  def version: Long = manifest.version

  /** Append one batch as a new segment; returns the commit version. */
  def append(df: DataFrame): Long = synchronized {
    val tmp = Paths.get(dir, s"tmp-${UUID.randomUUID()}")
    df.select(schema.fieldNames.map(col).toIndexedSeq: _*)
      .write
      .mode(SaveMode.Overwrite)
      .parquet(tmp.toString)
    val files = Files
      .list(tmp)
      .iterator()
      .asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .toList
    val dataDir = Paths.get(dir, "data")
    Files.createDirectories(dataDir)
    val ver = manifest.version + 1
    val segs = files.map { f =>
      val name = f"seg-$ver%08d-${UUID.randomUUID().toString.take(8)}.parquet"
      Files.move(f, dataDir.resolve(name), StandardCopyOption.ATOMIC_MOVE)
      Segment(s"data/$name", ver, ver, 0L)
    }
    deleteRecursively(tmp)
    manifest =
      manifest.copy(version = ver, segments = manifest.segments ++ segs)
    Manifest.commit(dir, manifest)
    ver
  }

  /** The committed table, with a `_ver` column carrying each row's
    * commit version (for last-write-wins upserts downstream). */
  def readVersioned: DataFrame = {
    if (manifest.segments.isEmpty)
      return spark
        .createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
        .withColumn("_ver", lit(0L))
    // One read per distinct version batch keeps _ver exact while still
    // being a single unioned parquet scan in the physical plan.
    manifest.segments
      .groupBy(_.minSeq)
      .toSeq
      .sortBy(_._1)
      .map { case (ver, segs) =>
        spark.read
          .schema(schema)
          .parquet(segs.map(s => Paths.get(dir, s.path).toString): _*)
          .withColumn("_ver", lit(ver))
      }
      .reduce(_.unionByName(_))
  }

  def read: DataFrame = readVersioned.drop("_ver")

  /** Copy-on-write rewrite of the whole table (delete / compact).
    * The rewritten table becomes a single new version. */
  def rewrite(f: DataFrame => DataFrame): Unit = synchronized {
    val cur = read
    val out = f(cur).select(schema.fieldNames.map(col).toIndexedSeq: _*)
    val tmp = Paths.get(dir, s"tmp-${UUID.randomUUID()}")
    out.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val files = Files
      .list(tmp)
      .iterator()
      .asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .toList
    val dataDir = Paths.get(dir, "data")
    Files.createDirectories(dataDir)
    val ver = manifest.version + 1
    val segs = files.map { fl =>
      val name = f"seg-$ver%08d-${UUID.randomUUID().toString.take(8)}.parquet"
      Files.move(fl, dataDir.resolve(name), StandardCopyOption.ATOMIC_MOVE)
      Segment(s"data/$name", ver, ver, 0L)
    }
    deleteRecursively(tmp)
    val old = manifest.segments
    manifest = manifest.copy(version = ver, segments = segs)
    Manifest.commit(dir, manifest)
    old.foreach(s => Files.deleteIfExists(Paths.get(dir, s.path)))
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      Files
        .walk(p)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .iterator()
        .asScala
        .foreach(Files.deleteIfExists(_))
    }
}

object TableStore {
  def open(spark: SparkSession, dir: String, schema: StructType): TableStore = {
    Files.createDirectories(Paths.get(dir))
    val m = Manifest.load(dir).getOrElse {
      val fresh = Manifest(0L, graft.core.Seqs.SeqEmpty, schema.json, Nil)
      Manifest.commit(dir, fresh)
      fresh
    }
    new TableStore(spark, dir, schema, m)
  }
}
