package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column support for training-data
  * pipelines: media travel as opaque `binary` columns with typed
  * metadata, and per-item decode/transform runs batch-at-a-time in the
  * executors.
  *
  * Spark-side design (all real and tested):
  *   - schema: `(id BIGINT, media BINARY, meta STRUCT<format,width,
  *     height,frames>)` — the binary is never parsed by Catalyst, so
  *     it moves through shuffles/scans untouched; metadata columns are
  *     columnar and prunable.
  *   - partition shape: media rows are large; callers should size
  *     `spark.sql.files.maxPartitionBytes` / `maxRecordsPerFile` so a
  *     partition of decoded batches fits executor memory. Transforms
  *     below are `mapPartitions`-shaped (the Scala analogue of
  *     `mapInPandas`): one iterator pass, no per-row task overhead,
  *     decode amortized across the partition.
  *
  * DECODE IS STUBBED: this container has no image/audio codecs, so
  * [[FakeCodec]] is a deterministic stand-in (documented header
  * format) — swap `decode`/`encode` for a real codec (javax.imageio /
  * ffmpeg bindings) in production. Everything around it (schema,
  * iterator plumbing, batch shape, tests) is the real contract.
  */
object Multimodal {

  /** Decoded media metadata + features, the output row shape. */
  case class MediaFeatures(
      id: Long,
      format: String,
      width: Int,
      height: Int,
      frames: Int,
      // cheap content features from the decoded payload
      meanByte: Double,
      sizeBytes: Long
  )

  /** Deterministic fake codec: media blob = 16-byte header
    * (4×int32 BE: magic, width, height, frames) + payload bytes.
    * Stands in for a real image/audio decoder. */
  object FakeCodec {
    val Magic = 0x47524654 // "GRFT"

    def encode(width: Int, height: Int, frames: Int, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(16 + payload.length)
      bb.putInt(Magic).putInt(width).putInt(height).putInt(frames)
      bb.put(payload)
      bb.array()
    }

    /** Decode header + payload; None for corrupt/foreign blobs —
      * including a valid-magic header with NEGATIVE dimensions, which
      * no real codec would accept and which downstream arithmetic
      * (ratios, frame strides, grid cells) must never see. */
    def decode(blob: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
      if (blob == null || blob.length < 16) return None
      val bb = java.nio.ByteBuffer.wrap(blob)
      if (bb.getInt() != Magic) return None
      val (w, h, f) = (bb.getInt(), bb.getInt(), bb.getInt())
      if (w < 0 || h < 0 || f < 0) return None
      val payload = java.util.Arrays.copyOfRange(blob, 16, blob.length)
      Some((w, h, f, payload))
    }
  }

  /** Decode + feature-extract a media table
    * `(id BIGINT, media BINARY)` → [[MediaFeatures]].
    * `mapPartitions` so decode state (a real codec would have one) is
    * initialized once per partition, not per row. Corrupt blobs yield
    * format="corrupt" rows instead of failing the job — at 100 TB some
    * inputs WILL be broken and a poison row must not kill the stage. */
  def extractFeatures(df: DataFrame): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec init would go here
        it.map { case (id, blob) =>
          FakeCodec.decode(blob) match {
            case Some((w, h, f, payload)) =>
              val mean =
                if (payload.isEmpty) 0.0
                else {
                  // accumulate in a while loop: mapping the payload
                  // into boxed Longs allocates O(size) per blob on
                  // the hot decode path
                  var acc = 0L
                  var i = 0
                  while (i < payload.length) {
                    acc += (payload(i) & 0xff); i += 1
                  }
                  acc.toDouble / payload.length
                }
              MediaFeatures(id, "grft", w, h, f, math.round(mean * 1e6) / 1e6, blob.length.toLong)
            case None =>
              MediaFeatures(id, "corrupt", 0, 0, 0, 0.0, if (blob == null) 0L else blob.length.toLong)
          }
        }
      }
  }

  /** "Resize": rewrite header metadata and subsample the payload by
    * the width ratio — the plumbing (binary in, binary out, metadata
    * recomputed) of a real resize. */
  def resize(df: DataFrame, newWidth: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, blob) =>
          FakeCodec.decode(blob) match {
            case Some((w, h, f, payload)) if w > 0 =>
              val ratio = newWidth.toDouble / w
              val newH = math.max(1, math.round(h * ratio).toInt)
              val step = math.max(1, math.round(1 / math.max(ratio, 1e-9)).toInt)
              val sub = payload.grouped(step).map(_.head).toArray
              (id, FakeCodec.encode(newWidth, newH, f, sub))
            case _ => (id, blob)
          }
        }
      }
      .toDF("id", "media")
  }

  /** Frame sampling for video-shaped media: emit one row per sampled
    * frame index (generator / flatMap shape). Frame payloads are
    * byte-slices of the blob — stand-in for real frame extraction. */
  def sampleFrames(df: DataFrame, everyN: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, blob) =>
        FakeCodec.decode(blob) match {
          case Some((w, h, frames, payload)) if frames > 0 =>
            // emitted frames are bounded by the DATA, not the header:
            // a (corrupt or hostile) header claiming 2^31 frames over
            // a 1 KB payload would otherwise explode this one row into
            // billions of empty generated rows — the poison-row shape
            // that must degrade, never dominate, a 100 TB stage
            val realFrames =
              math.min(frames.toLong, math.max(payload.length, 1).toLong).toInt
            val perFrame = math.max(1, payload.length / realFrames)
            (0 until realFrames by math.max(everyN, 1)).map { fi =>
              val start = fi * perFrame
              val end = math.min(payload.length, start + perFrame)
              val frame =
                if (start < payload.length)
                  java.util.Arrays.copyOfRange(payload, start, end)
                else Array.empty[Byte]
              (id, fi, w, h, frame)
            }
          case _ => Seq.empty
        }
      }
      .toDF("id", "frame_idx", "width", "height", "frame")
  }

  /** Grid cell means → hash bits over the first `w*h` payload bytes
    * read as an image plane (row r = i/w, col c = i%w): cell of a
    * pixel is `(r*gr/h, c*gc/w)` — a `gc × gr` downsample, the aHash
    * grid. Bit `cr*gc + cc` is set iff the cell's mean exceeds the
    * PLANE's mean, compared exactly in integers (cross-multiplied
    * sums — no float division to drift between engines). All-integer
    * arithmetic so an oracle can recompute it in SQL. Cells that get
    * no pixels (plane smaller than the grid) stay 0. */
  private def gridHash(p: Array[Byte], w: Int, h: Int, gc: Int, gr: Int): Long = {
    // w*h in LONG: a (corrupt or hostile) header claiming 65536x65536
    // overflows Int to 0, yielding phash 0 with corrupt=false — every
    // such blob would collide into one dedup bucket
    val n = math.min(p.length.toLong, w.toLong * h.toLong).toInt
    val cells = gc * gr
    val sums = new Array[Long](cells)
    val cnts = new Array[Long](cells)
    var total = 0L
    var i = 0
    while (i < n) {
      val idx = (i / w) * gr / h * gc + (i % w) * gc / w
      val v = (p(i) & 0xff).toLong
      sums(idx) += v; cnts(idx) += 1; total += v
      i += 1
    }
    var hsh = 0L
    var j = 0
    while (j < cells) {
      if (cnts(j) > 0 && sums(j) * n > total * cnts(j)) hsh |= (1L << j)
      j += 1
    }
    hsh
  }

  /** 32-bit average-hash perceptual fingerprint (aHash): the decoded
    * plane is downsampled onto an 8×4 grid and bit j is set iff grid
    * cell j's mean exceeds the plane mean — the media-content
    * analogue of text fingerprinting, for image/audio dedup where
    * byte-identical blobs are rare but content repeats (re-encodes,
    * crops, format shifts). Near-dups are then small Hamming
    * distances, joinable with the SimHash banding machinery
    * ([[graft.dedup.Dedup.hammingPairs]]). A GRID hash sees the whole
    * plane — content that differs only past the first bytes still
    * changes the fingerprint (a prefix hash misses exactly that; the
    * spec pins it). Same mapPartitions decode shape as
    * [[extractFeatures]]; corrupt blobs yield `corrupt = true` rather
    * than failing the stage. (A production pHash DCTs the downsample
    * first; the grid arithmetic and plumbing here are the real
    * contract, the decode is [[FakeCodec]].) */
  def phash32(df: DataFrame): DataFrame = phashGrid(df, 8, 4)

  /** 64-bit aHash — [[phash32]] on the classic 8×8 grid, for the
    * 100 TB fingerprint tier (see [[graft.dedup.Dedup.simhash64]]:
    * 32-bit band buckets saturate near 25 M items). Pairs with
    * `hammingPairs(..., bits = 64)`. */
  def phash64(df: DataFrame): DataFrame = phashGrid(df, 8, 8)

  private def phashGrid(df: DataFrame, gc: Int, gr: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, blob) =>
          FakeCodec.decode(blob) match {
            case Some((w, h, _, p)) if p.nonEmpty && w > 0 && h > 0 =>
              (id, gridHash(p, w, h, gc, gr), false)
            case _ => (id, 0L, true)
          }
        }
      }
      .toDF("id", "phash", "corrupt")
  }

  /** Synthesize a deterministic media table from any id column —
    * lets the multimodal path be exercised against the driver's
    * test tables without binary fixtures. */
  def synthesize(spark: SparkSession, ids: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long].map { id =>
      val w = 4 + (id % 8).toInt
      val h = 4 + (id % 5).toInt
      val frames = 1 + (id % 3).toInt
      val payload = Array.tabulate((w * h).toInt)(i => ((id * 31 + i) % 251).toByte)
      (id, FakeCodec.encode(w, h, frames, payload))
    }.toDF("id", "media")
  }
}
