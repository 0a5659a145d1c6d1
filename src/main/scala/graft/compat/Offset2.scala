package graft.compat

import java.io.{EOFException, IOException}
import java.nio.ByteBuffer
import java.nio.channels.FileChannel
import java.nio.file.{Files, Path, Paths, StandardOpenOption}

/** Byte-level compatibility with the reference's `offset2` on-disk
  * log format, for MIGRATION in both directions — a reference user
  * can point this engine at an existing log directory and read it in
  * parallel, or export an engine log back out as a byte-identical
  * triple the reference can open.
  *
  * Format (reference `offset2/log.go:5-27`):
  *   - `data` — length-prefixed frames: BigEndian `int64 size ++
  *     [size]byte`; a NEGATIVE size marks a nulled entry and the
  *     payload bytes are zeroed (`offset2/log.go:88-127`,
  *     `offset2/data.go:80-96`).
  *   - `ofst` — one BigEndian `int64` per entry: the byte offset of
  *     that entry's frame in `data` (`offset2/offset.go:58-70`).
  *   - `jrnl` — a single BigEndian `int64` holding the LAST seq
  *     (bumped before every append, `offset2/journal.go:48-66`); a
  *     zero-byte file means the empty log.
  *
  * Open-time consistency matches the reference's `checkJournal`
  * (`offset2/log.go:217-302`): an empty journal requires empty
  * `ofst`/`data`; a journal AHEAD of the offset file (the crash
  * window — the journal is bumped first) is recovered by writing the
  * offset-file count back into the journal — and, only when the
  * caller passes `chopInFlight = true`, by also chopping the crashed
  * append's in-flight frame off the tail of `data` (the recovery the
  * reference leaves as "TODO: chop off the rest" and errors on; we
  * keep its loud default because the on-disk state is
  * indistinguishable from a LIVE writer mid-append, and truncating a
  * live writer's tail would corrupt it — the caller must assert
  * ownership explicitly); a journal BEHIND is a loud error (the
  * reference refuses too: "unclear how to handle"); and the last
  * frame's end must otherwise be exactly the end of `data`.
  * [[checkConsistency]] is the full-scan fsck
  * (`offset2/log.go:304-344`): walk every frame, cross-check each
  * start offset against `ofst`.
  *
  * Scale shape: ONE offset2 log is a single-node artifact (the
  * reference is a single-process embedded store), but a migration is
  * many logs × parallel byte ranges within each. [[planRanges]]
  * byte-balances a log into entry ranges by BINARY-SEARCHING the
  * sorted `ofst` array on disk (O(parts × log n) 8-byte reads, no
  * full ofst scan on the driver), and each range is one sequential
  * frame walk over its `data` slice — see
  * [[graft.sources.Offset2Source]] for the DSv2 scan that runs
  * these ranges as input partitions.
  */
object Offset2 {

  /** Reference `margaret.SeqEmpty`: the seq "before" the first. */
  val SeqEmpty: Long = -1L

  final case class Meta(lastSeq: Long, dataSize: Long) {
    def count: Long = lastSeq + 1
  }

  private def dataPath(dir: String): Path = Paths.get(dir, "data")
  private def ofstPath(dir: String): Path = Paths.get(dir, "ofst")
  private def jrnlPath(dir: String): Path = Paths.get(dir, "jrnl")

  private def readLongAt(ch: FileChannel, pos: Long): Long = {
    val buf = ByteBuffer.allocate(8) // BIG_ENDIAN by default
    var off = pos
    while (buf.hasRemaining) {
      val n = ch.read(buf, off)
      if (n < 0) throw new EOFException(s"EOF at byte $off")
      off += n
    }
    buf.flip(); buf.getLong
  }

  /** `checkJournal`: validate the triple, recover the journal-ahead
    * crash window when `recover` (rewrites `jrnl` only, exactly like
    * the reference), and return the log's metadata. Loud on every
    * other inconsistency.
    *
    * `chopInFlight` additionally truncates a crashed append's
    * in-flight frame off the tail of `data` (journal-ahead states
    * only). It is OFF by default and requires the caller to own the
    * log exclusively: the same bytes are what a reader racing a LIVE
    * writer sees, and truncating a live writer's tail corrupts its
    * next append — which is exactly why the reference stays loud
    * here ("TODO: chop off the rest", `offset2/log.go:296-300`). */
  def check(dir: String, recover: Boolean = true,
            chopInFlight: Boolean = false): Meta = {
    val jp = jrnlPath(dir); val op = ofstPath(dir); val dp = dataPath(dir)
    if (!Files.exists(jp) || !Files.exists(op) || !Files.exists(dp))
      throw new IOException(
        s"not an offset2 log: $dir must contain data, ofst and jrnl")
    val jrnlSize = Files.size(jp)
    val seqJrnl =
      if (jrnlSize == 0) SeqEmpty
      else if (jrnlSize == 8) {
        val ch = FileChannel.open(jp, StandardOpenOption.READ)
        try readLongAt(ch, 0) finally ch.close()
      } else
        throw new IOException(
          s"offset2: expected jrnl size of 8B, got ${jrnlSize}B")
    val ofstSize = Files.size(op)
    if (ofstSize % 8 != 0)
      throw new IOException(s"offset2: ofst size $ofstSize not a multiple of 8")
    var dataSize = Files.size(dp)
    var recovered = false
    if (seqJrnl == SeqEmpty) {
      if (ofstSize != 0)
        throw new IOException("offset2: journal empty but offset file isnt")
      if (dataSize != 0)
        throw new IOException("offset2: journal empty but data file isnt")
      return Meta(SeqEmpty, 0L)
    }
    val seqOfst = ofstSize / 8 - 1
    var lastSeq = seqJrnl
    if (seqJrnl != seqOfst) {
      if (seqJrnl < seqOfst || !recover)
        throw new IOException(
          "offset2: seq in journal does not match element count in log " +
            s"offset file - $seqJrnl != $seqOfst")
      // crash window: jrnl is bumped BEFORE data/ofst are written —
      // recover by writing the offset-file count back into the journal.
      // A FIRST-append crash (jrnl = 0, ofst still empty) truncates
      // back to the format's empty-log state (a ZERO-BYTE jrnl — an
      // 8-byte jrnl holding -1 is not a state the reference writes)
      if (seqOfst == SeqEmpty) {
        // partial first-frame bytes in data are the in-flight frame of
        // the crashed append — truncating them back to the committed
        // (empty) state needs the same explicit ownership claim as the
        // mid-append chop below: a live writer mid-FIRST-append leaves
        // identical bytes, and truncating under it corrupts its log
        if (dataSize != 0) {
          if (!chopInFlight)
            throw new IOException(
              s"offset2: data file size difference ${-dataSize}")
          val dc = FileChannel.open(dp, StandardOpenOption.WRITE)
          try dc.truncate(0L) finally dc.close()
        }
        // data is (now) empty — restore the FORMAT's empty state: a
        // ZERO-BYTE jrnl (an 8-byte jrnl holding -1 is not a state the
        // reference writes). Journal-only, like the recovery below.
        val ch = FileChannel.open(jp, StandardOpenOption.WRITE)
        try ch.truncate(0L) finally ch.close()
        return Meta(SeqEmpty, 0L)
      }
      // the journal rewrite is deferred until AFTER the data tail
      // validates (or is chopped): rewriting first and then throwing
      // on the size check would erase the journal-ahead marker — the
      // very evidence that makes the state recoverable — and strand
      // the log in a permanently-loud torn-tail state
      lastSeq = seqOfst
      recovered = true
    }
    // the last frame must end exactly at the end of `data`
    val och = FileChannel.open(op, StandardOpenOption.READ)
    val lastOfst = try readLongAt(och, lastSeq * 8) finally och.close()
    val dch = FileChannel.open(dp, StandardOpenOption.READ)
    val lastSz = try readLongAt(dch, lastOfst) finally dch.close()
    val end = lastOfst + 8 + math.abs(lastSz)
    if (end != dataSize) {
      if (recovered && chopInFlight && end < dataSize) {
        // the crashed append's in-flight frame (torn, or complete but
        // never committed — the ofst entry is the commit point) is
        // still at the tail of `data`: chop it back to the committed
        // end. The truncated triple is a byte-valid log the reference
        // opens clean. Opt-in only (see scaladoc): without
        // `chopInFlight` this state stays the reference's loud
        // size-difference error, because a live writer's mid-append
        // instant is byte-identical.
        val dc = FileChannel.open(dp, StandardOpenOption.WRITE)
        try dc.truncate(end) finally dc.close()
        dataSize = end
      } else
        // end > dataSize means the last COMMITTED frame is torn (real
        // data loss), and a tail past the end WITHOUT the journal-ahead
        // marker is not a state the format's write order can produce —
        // both stay loud, exactly like the reference
        throw new IOException(
          s"offset2: data file size difference ${end - dataSize}")
    }
    if (recovered) {
      // data is now consistent with `ofst` — write the offset-file
      // count back into the journal (the reference's recovery,
      // `offset2/log.go:281-295`)
      val ch = FileChannel.open(jp, StandardOpenOption.WRITE)
      try {
        val buf = ByteBuffer.allocate(8).putLong(seqOfst)
        buf.flip()
        var off = 0L
        while (buf.hasRemaining) off += ch.write(buf, off)
      } finally ch.close()
    }
    Meta(lastSeq, dataSize)
  }

  /** Reader-side metadata: NEVER writes, and tolerates the states a
    * LIVE log passes through mid-append (the reference writes `jrnl`
    * first, then `data`, then `ofst` — `offset2/log.go:425-462`), so
    * a scan can run against a triple the reference process is still
    * appending to:
    *
    *   - committed count = `ofst` size / 8. An `ofst` entry is only
    *     written after its frame is fully in `data`, so every
    *     ofst-visible entry is readable and `data[0, lastFrameEnd)`
    *     is immutable (append-only files) — concurrent appends can't
    *     disturb a planned range.
    *   - journal AHEAD of `ofst` (crash window or in-flight append):
    *     read the committed count; do NOT "recover" — rewriting
    *     `jrnl` under a live writer would corrupt ITS next append.
    *     Recovery stays in [[check]], the explicit open/migration
    *     entry point (the reference also recovers only on open).
    *   - trailing `data` bytes past the last committed frame (the
    *     in-flight frame): tolerated; a frame that ENDS past the
    *     file is the reference's loud size-difference error.
    *   - journal BEHIND `ofst`: loud, like the reference. */
  def checkReadOnly(dir: String): Meta = {
    val jp = jrnlPath(dir); val op = ofstPath(dir); val dp = dataPath(dir)
    if (!Files.exists(jp) || !Files.exists(op) || !Files.exists(dp))
      throw new IOException(
        s"not an offset2 log: $dir must contain data, ofst and jrnl")
    val jrnlSize = Files.size(jp)
    val seqJrnl =
      if (jrnlSize == 0) SeqEmpty
      else if (jrnlSize == 8) {
        val ch = FileChannel.open(jp, StandardOpenOption.READ)
        try readLongAt(ch, 0) finally ch.close()
      } else
        throw new IOException(
          s"offset2: expected jrnl size of 8B, got ${jrnlSize}B")
    val ofstSize = Files.size(op)
    if (ofstSize % 8 != 0)
      throw new IOException(s"offset2: ofst size $ofstSize not a multiple of 8")
    val dataSize = Files.size(dp)
    val seqOfst = ofstSize / 8 - 1
    if (seqJrnl < seqOfst)
      throw new IOException(
        "offset2: seq in journal does not match element count in log " +
          s"offset file - $seqJrnl != $seqOfst")
    if (seqOfst == SeqEmpty) return Meta(SeqEmpty, 0L)
    val och = FileChannel.open(op, StandardOpenOption.READ)
    val lastOfst = try readLongAt(och, seqOfst * 8) finally och.close()
    val dch = FileChannel.open(dp, StandardOpenOption.READ)
    val lastSz = try readLongAt(dch, lastOfst) finally dch.close()
    val end = lastOfst + 8 + math.abs(lastSz)
    if (end > dataSize)
      throw new IOException(
        s"offset2: data file size difference ${end - dataSize}")
    Meta(seqOfst, end)
  }

  /** Full-scan fsck (`offset2/log.go:304-344`): walk every frame in
    * `data`, cross-check each start offset against `ofst`. Returns
    * the list of problems (empty = consistent), after the same
    * journal check `check` applies (journal problems throw). */
  def checkConsistency(dir: String): List[String] = {
    val meta = check(dir, recover = false)
    val problems = scala.collection.mutable.ListBuffer.empty[String]
    val dch = FileChannel.open(dataPath(dir), StandardOpenOption.READ)
    val och = FileChannel.open(ofstPath(dir), StandardOpenOption.READ)
    try {
      var ofst = 0L
      var seq = 0L
      while (ofst < meta.dataSize && seq < meta.count) {
        val expected = readLongAt(och, seq * 8)
        if (ofst != expected)
          problems += s"offset mismatch at seq $seq: " +
            s"offset file says $expected, data file has $ofst"
        val sz = readLongAt(dch, ofst)
        ofst += 8 + math.abs(sz)
        seq += 1
      }
      if (seq != meta.count)
        problems += s"data file ends after $seq entries, expected ${meta.count}"
    } finally { dch.close(); och.close() }
    problems.toList
  }

  /** The reference's two-seek point read (`ofst[seq]` → frame,
    * `offset2/offset.go:20-32` + `offset2/data.go:23-35`):
    * `Some(bytes)` for a live entry, `None` for a nulled one
    * (reference `ErrNulled`), loud past the end (reference OOB).
    * Driver-side utility — a distributed scan goes through the
    * `graft-offset2` source, whose seq-bound clipping plans the same
    * two-seek shape as ONE tiny partition. */
  def get(dir: String, seq: Long): Option[Array[Byte]] = {
    // READ-ONLY metadata: a point read must never "recover" (rewrite
    // jrnl) — the journal legitimately runs ahead of ofst while the
    // REFERENCE process is mid-append, and rewriting it under a live
    // writer corrupts its next append (checkReadOnly's contract).
    // Recovery stays in check(), the explicit open/migration entry.
    val meta = checkReadOnly(dir)
    if (seq < 0 || seq > meta.lastSeq)
      throw new NoSuchElementException(
        s"offset2: seq $seq out of bounds (last is ${meta.lastSeq})")
    val och = FileChannel.open(ofstPath(dir), StandardOpenOption.READ)
    val ofst = try readLongAt(och, seq * 8) finally och.close()
    val dch = FileChannel.open(dataPath(dir), StandardOpenOption.READ)
    try {
      val sz = readLongAt(dch, ofst)
      if (sz < 0) return None
      if (sz > Int.MaxValue)
        throw new IOException(s"offset2: frame size $sz at seq $seq")
      val buf = ByteBuffer.allocate(sz.toInt)
      var off = ofst + 8
      while (buf.hasRemaining) {
        val n = dch.read(buf, off)
        if (n < 0) throw new EOFException(s"EOF in frame at seq $seq")
        off += n
      }
      Some(buf.array())
    } finally dch.close()
  }

  /** One planned byte range of a log: entries `[startSeq, endSeq)`
    * living in `data[byteStart, byteEnd)`. */
  final case class EntryRange(
      startSeq: Long, endSeq: Long, byteStart: Long, byteEnd: Long)

  /** Byte-balance the log into up to `ceil(dataSize/targetBytes)`
    * contiguous entry ranges. Split points are found by binary search
    * over the on-disk `ofst` array (sorted by construction — appends
    * are sequential), so a skewed log (a few huge frames among many
    * small) still yields ~targetBytes ranges; the driver reads
    * O(parts × log n) longs, never the whole offset file. */
  def planRanges(dir: String, targetBytes: Long): Seq[EntryRange] =
    planRangesBetween(dir, 0L, Long.MaxValue, targetBytes)

  /** [[planRanges]] over the entry window `[startSeq, endSeq)`
    * (clamped to the committed count) — the streaming leg plans each
    * micro-batch's offset range with it; the whole-log form is the
    * `[0, count)` special case. */
  def planRangesBetween(
      dir: String,
      startSeq: Long,
      endSeq: Long,
      targetBytes: Long
  ): Seq[EntryRange] = {
    require(targetBytes > 0, s"targetBytes must be > 0 (got $targetBytes)")
    val meta = checkReadOnly(dir)
    val s0 = math.max(startSeq, 0L)
    val e0 = math.min(endSeq, meta.count)
    if (s0 >= e0) return Nil
    val och = FileChannel.open(ofstPath(dir), StandardOpenOption.READ)
    try {
      def byteOf(seq: Long): Long =
        if (seq == meta.count) meta.dataSize else readLongAt(och, seq * 8)
      val byteStart = byteOf(s0); val byteEnd = byteOf(e0)
      val total = byteEnd - byteStart
      val parts = math.max(1L, (total + targetBytes - 1) / targetBytes)
      if (parts == 1) return Seq(EntryRange(s0, e0, byteStart, byteEnd))
      // first entry in the window whose frame offset is >= byte target
      def search(byteTarget: Long): Long = {
        var lo = s0; var hi = e0 // invariant: ofst[lo-1] < target
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (readLongAt(och, mid * 8) < byteTarget) lo = mid + 1 else hi = mid
        }
        lo
      }
      val cuts = (1L until parts)
        .map(i => search(byteStart + total / parts * i))
        .prepended(s0).appended(e0)
        .distinct // tiny windows: several targets may hit the same entry
      cuts.lazyZip(cuts.tail).map { (s, e) =>
        EntryRange(s, e, byteOf(s), byteOf(e))
      }.toSeq
    } finally och.close()
  }

  /** Last entry index (inclusive) such that
    * `bytes(afterSeq, end] <= budget`, but at least `afterSeq + 1`
    * (progress guarantee) — the streaming byte-budget admission
    * clamp; one binary search over `ofst`, O(log n) driver reads. */
  def clampByBytes(dir: String, afterSeq: Long, budget: Long): Long = {
    val meta = checkReadOnly(dir)
    val first = afterSeq + 1
    if (first >= meta.count) return meta.lastSeq
    val och = FileChannel.open(ofstPath(dir), StandardOpenOption.READ)
    try {
      def byteOf(seq: Long): Long =
        if (seq == meta.count) meta.dataSize else readLongAt(och, seq * 8)
      val target = byteOf(first) + math.max(budget, 1L)
      // last entry whose frame END is within the budget
      var lo = first; var hi = meta.count
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (byteOf(mid + 1) <= target) lo = mid + 1 else hi = mid
      }
      math.max(first, lo - 1)
    } finally och.close()
  }

  /** Sequential frame walk over one planned range: emits
    * `(seq, value, nulled)` with `value = null` for nulled entries
    * (their payload is zeroed on disk; surfacing fake zeros would
    * invent data). Reads `data` once, forward-only, through a
    * buffered stream — no per-entry seeks. Closes the file on
    * exhaustion; call `close()` on early abort. */
  final class RangeIterator(dir: String, range: EntryRange)
      extends Iterator[(Long, Array[Byte], Boolean)] with AutoCloseable {
    private var in = {
      val s = Files.newInputStream(dataPath(dir))
      // skipNBytes, not skip: loud EOF on a truncated file instead
      // of a zero-progress spin
      s.skipNBytes(range.byteStart)
      new java.io.DataInputStream(new java.io.BufferedInputStream(s, 1 << 16))
    }
    private var nextSeq = range.startSeq
    override def hasNext: Boolean = {
      val more = in != null && nextSeq < range.endSeq
      if (!more) close()
      more
    }
    override def next(): (Long, Array[Byte], Boolean) = {
      if (!hasNext) throw new NoSuchElementException
      val sz = in.readLong()
      val nulled = sz < 0
      val len = math.abs(sz)
      if (len > Int.MaxValue)
        throw new IOException(s"offset2: frame size $len at seq $nextSeq")
      val out =
        if (nulled) { in.skipNBytes(len); null }
        else { val b = new Array[Byte](len.toInt); in.readFully(b); b }
      val s = nextSeq
      nextSeq += 1
      (s, out, nulled)
    }
    override def close(): Unit = if (in != null) { in.close(); in = null }
  }

  /** Export rows as a fresh offset2 triple the reference can open.
    * `rows` must be `(value, nulled)` in seq order, dense from 0 —
    * the caller orders (a DataFrame leg sorts by seq and streams
    * `toLocalIterator`). A nulled entry is written the way the
    * reference leaves one after `Null(seq)`: negative size, zeroed
    * payload (size 1 when the original length is unknown — any
    * negative size reads back as `ErrNulled`). Single sequential
    * writer by the format's own nature (three append-only files, one
    * journal) — the reference writes through one process-wide lock
    * too (`offset2/log.go:84-86`). */
  def write(dir: String, rows: Iterator[(Array[Byte], Boolean)]): Meta = {
    Files.createDirectories(Paths.get(dir))
    for (f <- Seq("data", "ofst", "jrnl")) {
      val p = Paths.get(dir, f)
      if (Files.exists(p) && Files.size(p) > 0)
        throw new IOException(s"offset2 export target not empty: $p")
    }
    val data = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      Files.newOutputStream(dataPath(dir)), 1 << 16))
    val ofst = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      Files.newOutputStream(ofstPath(dir)), 1 << 16))
    var lastSeq = SeqEmpty
    var byteOfst = 0L
    try {
      rows.foreach { case (value, nulled) =>
        val bytes = if (value == null) Array.emptyByteArray else value
        val len: Long = if (nulled) math.max(bytes.length.toLong, 1L)
          else bytes.length.toLong
        ofst.writeLong(byteOfst)
        data.writeLong(if (nulled) -len else len)
        if (nulled) data.write(new Array[Byte](len.toInt))
        else data.write(bytes)
        byteOfst += 8 + len
        lastSeq += 1
      }
    } finally { data.close(); ofst.close() }
    val jrnl = new java.io.DataOutputStream(Files.newOutputStream(jrnlPath(dir)))
    try { if (lastSeq != SeqEmpty) jrnl.writeLong(lastSeq) }
    finally jrnl.close()
    Meta(lastSeq, byteOfst)
  }

  /** DataFrame export leg: `(seq, value binary|string, nulled)` →
    * offset2 triple. Sorts by `seq`, requires density from 0 (the
    * format has no gaps — `ofst` is indexed BY seq), and streams
    * partitions to the single writer via `toLocalIterator` (never a
    * full collect). */
  def export(df: org.apache.spark.sql.DataFrame, dir: String): Meta = {
    import org.apache.spark.sql.functions.col
    val value = df.schema("value").dataType match {
      case org.apache.spark.sql.types.BinaryType => col("value")
      case org.apache.spark.sql.types.StringType =>
        col("value").cast(org.apache.spark.sql.types.BinaryType)
      case t => throw new IllegalArgumentException(
        s"offset2 export: value must be binary or string, got $t")
    }
    val it = df
      .select(col("seq").cast(org.apache.spark.sql.types.LongType),
        value.as("value"), col("nulled").cast("boolean"))
      .orderBy(col("seq"))
      .toLocalIterator()
    var expect = 0L
    write(dir, new Iterator[(Array[Byte], Boolean)] {
      override def hasNext: Boolean = it.hasNext
      override def next(): (Array[Byte], Boolean) = {
        val r = it.next()
        val seq = r.getLong(0)
        if (seq != expect)
          throw new IllegalArgumentException(
            s"offset2 export: seqs must be dense from 0; " +
              s"expected $expect, got $seq")
        expect += 1
        (if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1), r.getBoolean(2))
      }
    })
  }
}
