package graft.storage

/** Driver-side parquet ROW-GROUP concatenation for the small-append
  * merge: fold N tiny staged segment files into one file by copying
  * their row groups byte-for-byte (`ParquetFileReader.appendTo`) —
  * no decode, no re-encode, and crucially NO second Spark job per
  * micro-batch commit (the read-back `coalesce` rewrite this replaces
  * scheduled a full job whose fixed cost dominated every small
  * append). Small files are exactly when a driver-side copy is cheap:
  * the merge only fires when staged bytes sit under the per-file
  * target, so the bytes moved here are bounded by
  * `segmentTargetFileBytes × files`.
  *
  * The first input's key-value footer metadata (Spark schema, writer
  * version — the INT96 provenance the readers' rebase logic keys on)
  * is carried onto the output verbatim; all inputs come from ONE
  * Spark write job, so their schemas and metadata are identical by
  * construction. Row-group statistics ride the copied blocks, so
  * per-row-group pruning keeps working on the merged file. */
private[storage] object ParquetConcat {

  /** Concatenate `inputs` (in order) into `out`. */
  def concat(io: FileIO, inputs: Seq[String], out: String): Unit = {
    require(inputs.nonEmpty, "ParquetConcat.concat needs at least one input")
    val head = org.apache.parquet.hadoop.ParquetFileReader.open(
      io.inputFile(inputs.head))
    val (schema, meta) =
      try {
        val fmd = head.getFooter.getFileMetaData
        (fmd.getSchema, fmd.getKeyValueMetaData)
      } finally head.close()
    val writer = new org.apache.parquet.hadoop.ParquetFileWriter(
      io.outputFile(out),
      schema,
      org.apache.parquet.hadoop.ParquetFileWriter.Mode.CREATE,
      org.apache.parquet.hadoop.ParquetWriter.DEFAULT_BLOCK_SIZE.toLong,
      org.apache.parquet.hadoop.ParquetWriter.MAX_PADDING_SIZE_DEFAULT)
    writer.start()
    inputs.foreach { in =>
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        io.inputFile(in))
      try r.appendTo(writer) finally r.close()
    }
    writer.end(meta)
  }

  /** Greedily pack `files` (listing order) into groups of at most
    * `target` groups balanced by cumulative bytes — the grouping the
    * merge uses when the staged bytes justify more than one output
    * file. Returns the groups in order. */
  def packGroups(
      files: List[FileIO.Entry],
      sizes: Map[String, Long],
      target: Int
  ): List[List[FileIO.Entry]] = {
    val total = files.map(f => sizes(f.path)).sum
    val perGroup = math.max(1L, (total + target - 1) / target)
    val groups = scala.collection.mutable.ListBuffer.empty[List[FileIO.Entry]]
    var cur = scala.collection.mutable.ListBuffer.empty[FileIO.Entry]
    var curBytes = 0L
    files.foreach { f =>
      val b = sizes(f.path)
      if (cur.nonEmpty && curBytes + b > perGroup &&
        groups.length < target - 1) {
        groups += cur.toList; cur.clear(); curBytes = 0L
      }
      cur += f; curBytes += b
    }
    if (cur.nonEmpty) groups += cur.toList
    groups.toList
  }
}
