package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

import graft.core.QuerySpec._
import graft.similarity.Ann
import graft.storage.ParquetLog

/** IVF coarse quantization behavior + log segment compaction. */
class IvfCompactSpec extends SparkSpec {

  test("ivf: assignment is total, probing finds the query's own vector") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val centroidIds = Seq(0L, 7L, 23L, 99L)
    val assigned = Ann.ivfAssign(emb, "embedding", "vec_id", centroidIds).cache()
    assert(assigned.count() == emb.count()) // every vector gets a cell
    val cells = assigned.select("cell").distinct().collect().map(_.getLong(0)).toSet
    assert(cells.subsetOf(centroidIds.toSet))
    val centroids = emb
      .where(col("vec_id").isin(centroidIds: _*))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
      .toMap
    val q = emb.where(col("vec_id") === 5).select("embedding")
      .collect()(0).getSeq[Float](0)
    val top = Ann
      .ivfTopK(assigned, "embedding", "vec_id", q, 10, centroids, nprobe = 2)
      .collect()
      .map(_.getLong(0))
    // the query vector's own cell is among the probed ones by
    // construction (its centroid is its nearest), so it finds itself
    assert(top.contains(5L))
    // recall vs exact top-10 is non-trivial with half the cells probed
    val exact = Ann.cosineTopK(emb, "embedding", "vec_id", q, 10)
      .collect().map(_.getLong(0)).toSet
    assert(exact.intersect(top.toSet).size >= 3)
  }

  test("ivf assign: native codebook path matches the literal path " +
      "exactly; plan stays flat at k=4096") {
    import spark.implicits._
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    // 200 centroids (> default literalMax=128 → native path); force
    // the literal plan by raising the threshold — same cents, same
    // rows, assignments must agree bit-for-bit including tie-breaks.
    val cents = emb.limit(200).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val native = Ann.ivfAssignVectors(emb, "embedding", "vec_id", cents)
    val literal =
      Ann.ivfAssignVectors(emb, "embedding", "vec_id", cents, literalMax = 1000)
    assert(native.queryExecution.executedPlan.toString.length <
      literal.queryExecution.executedPlan.toString.length / 10)
    val n = native.select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val l = literal.select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(n == l, "native/literal assignment divergence")

    // k=4096 synthetic codebook: the plan must not grow with k (the
    // round-10 literal form was tens of MB here), and the argmin must
    // still be exact — checked against a driver-side recomputation.
    val dims = 16
    val big = (0L until 4096L).map { c =>
      (c, (0 until dims).map(d => (((c * 31 + d * 7) % 97).toFloat / 9.7f)))
    }
    val probe = Seq(
      (1L, (0 until dims).map(d => ((d * 7) % 97).toFloat / 9.7f)),
      (2L, (0 until dims).map(d => (((500 * 31 + d * 7) % 97).toFloat / 9.7f)))
    ).toDF("vec_id", "embedding")
    val bigAssigned = Ann.ivfAssignVectors(probe, "embedding", "vec_id", big)
    val planLen = bigAssigned.queryExecution.executedPlan.toString.length
    assert(planLen < 10000, s"plan grew with k: $planLen chars")
    val got = bigAssigned.select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def nearest(v: Seq[Float]): Long = big.minBy { case (_, c) =>
      val dot = v.zip(c).map { case (a, b) => a.toDouble * b.toDouble }.sum
      val nsq = c.map(x => x.toDouble * x.toDouble).sum
      (nsq - 2.0 * dot, 0L)
    }._1
    val exp = Map(
      1L -> nearest(probe.collect().find(_.getLong(0) == 1L).get.getSeq[Float](1)),
      2L -> nearest(probe.collect().find(_.getLong(0) == 2L).get.getSeq[Float](1)))
    assert(got == exp, s"argmin mismatch: got $got expected $exp")
  }

  test("ivf assign: null vectors yield null cells on BOTH paths") {
    import spark.implicits._
    val dims = 4
    val cents = (0L until 3L).map(c =>
      (c, (0 until dims).map(d => (c * 10 + d).toFloat)))
    val rows = Seq(
      (1L, Some((0 until dims).map(_.toFloat))),
      (2L, None), // null vector — must NOT resolve to the lowest cell
      (3L, Some((0 until dims).map(d => (20 + d).toFloat)))
    ).toDF("vec_id", "embedding")
    for (literalMax <- Seq(1, 100)) { // native path / literal path
      val out = Ann
        .ivfAssignVectors(rows, "embedding", "vec_id", cents, literalMax)
        .select("vec_id", "cell").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap
      assert(out(2L).isEmpty, s"literalMax=$literalMax: null vec got cell ${out(2L)}")
      assert(out(1L).contains(0L) && out(3L).contains(2L),
        s"literalMax=$literalMax: non-null rows misassigned: $out")
    }
  }

  test("CodebookArgmin: equal codebooks compare equal (canonicalization)") {
    import graft.functions.CodebookArgmin
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val child = BoundReference(0, ArrayType(FloatType), nullable = true)
    def mk() = CodebookArgmin(
      child,
      Array(1L, 2L),
      Array(Array(1f, 2f), Array(3f, 4f)),
      Array(5.0, 25.0))
    val a = mk(); val b = mk()
    assert(a == b, "content-equal expressions must compare equal")
    assert(a.hashCode == b.hashCode)
    assert(a.canonicalized == b.canonicalized)
    val c = a.copy(cells = Array(1L, 3L))
    assert(a != c, "different codebooks must not compare equal")
  }

  test("kmeans training recovers planted blobs and reduces inertia") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.similarity.Ann
    // 3 planted blobs in 4-d: centers scaled far apart, small jitter
    val centers = Seq(
      Seq(10f, 0f, 0f, 0f), Seq(0f, 10f, 0f, 0f), Seq(0f, 0f, 10f, 0f))
    val vecs = for {
      (c, b) <- centers.zipWithIndex
      i <- 0 until 30
    } yield (
      (b * 100 + i).toLong,
      c.zipWithIndex.map { case (v, d) => v + ((i * 7 + d * 3) % 5) * 0.1f }
    )
    val df = vecs.toDF("vec_id", "embedding")
    // worst-case init: all three seeds from the SAME blob region
    val init = Seq(0L, 1L, 2L)
    def inertia(cents: Map[Long, Seq[Float]]): Double =
      Ann.ivfAssignVectors(df, "embedding", "vec_id", cents.toSeq.sortBy(_._1))
        .select(posexplode(col("embedding")).as(Seq("d", "x")), col("cell"))
        .join(
          cents.toSeq.flatMap { case (cell, v) =>
            v.zipWithIndex.map { case (cv, d) => (cell, d, cv.toDouble) }
          }.toDF("cell", "d", "cv"),
          Seq("cell", "d"))
        .agg(sum(pow(col("x") - col("cv"), 2)))
        .head().getDouble(0)
    val before = inertia(Ann.kmeansTrain(df, "embedding", "vec_id", init, 0))
    val trained = Ann.kmeansTrain(df, "embedding", "vec_id", init, 8)
    val after = inertia(trained)
    assert(after < before / 2, s"inertia $before -> $after")
    // every blob maps to one cell, pure (all 30 members together)
    val assigned = Ann
      .ivfAssignVectors(df, "embedding", "vec_id", trained.toSeq.sortBy(_._1))
      .select(col("vec_id"), col("cell")).collect()
      .map(r => (r.getLong(0) / 100, r.getLong(1)))
    val purity = assigned.groupBy(_._1).values
      .map(g => g.groupBy(_._2).values.map(_.size).max.toDouble / g.size)
    assert(purity.forall(_ == 1.0), s"impure blobs: ${purity.toSeq}")
  }

  test("sampled kmeans training: deterministic, init-preserving, blob-pure") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.similarity.Ann
    // same 3-blob fixture, 10x the members so a 30% sample still
    // leaves every blob well-populated
    val centers = Seq(
      Seq(10f, 0f, 0f, 0f), Seq(0f, 10f, 0f, 0f), Seq(0f, 0f, 10f, 0f))
    val vecs = for {
      (c, b) <- centers.zipWithIndex
      i <- 0 until 300
    } yield (
      (b * 1000 + i).toLong,
      c.zipWithIndex.map { case (v, d) => v + ((i * 7 + d * 3) % 5) * 0.1f }
    )
    val df = vecs.toDF("vec_id", "embedding")
    val init = Seq(0L, 1000L, 2000L)
    // fraction 1.0 ≡ the unsampled loop exactly (the gate admits all)
    assert(
      Ann.kmeansTrainSampled(df, "embedding", "vec_id", init, 3, 1.0,
        roundTo = 6)
        == Ann.kmeansTrain(df, "embedding", "vec_id", init, 3, roundTo = 6))
    // 30% sample: deterministic (same seed → same codebook) and the
    // full-corpus assignment under the sampled codebook is still pure
    val s1 = Ann.kmeansTrainSampled(df, "embedding", "vec_id", init, 8, 0.3)
    val s2 = Ann.kmeansTrainSampled(df, "embedding", "vec_id", init, 8, 0.3)
    assert(s1 == s2, "hash-gate sampling must be reproducible")
    assert(s1.keySet == init.toSet, "every init centroid must survive")
    val assigned = Ann
      .ivfAssignVectors(df, "embedding", "vec_id", s1.toSeq.sortBy(_._1))
      .select(col("vec_id"), col("cell")).collect()
      .map(r => (r.getLong(0) / 1000, r.getLong(1)))
    val purity = assigned.groupBy(_._1).values
      .map(g => g.groupBy(_._2).values.map(_.size).max.toDouble / g.size)
    assert(purity.forall(_ == 1.0),
      s"sampled codebook assigns blobs impurely: ${purity.toSeq}")
    // a tiny fraction still trains: the init rows are force-admitted
    // even when the hash gate would drop them
    val tiny = Ann.kmeansTrainSampled(df, "embedding", "vec_id", init, 1, 0.01)
    assert(tiny.keySet == init.toSet)
  }

  test("compact merges small segments, preserving data and seqs") {
    import spark.implicits._
    val log = ParquetLog.open(spark, tmpDir("cpt"), IntegerType)
    // 6 tiny appends → many small segments
    (0 until 6).foreach(i => log.appendValues(Seq(i * 2, i * 2 + 1)))
    val before = log.checkConsistency()
    assert(before == Nil)
    // committed segment count from the manifest (toDF is a DSv2
    // relation now, which reports no inputFiles)
    def segCount = graft.storage.Manifest.load(log.dir).get.segments.length
    val segsBefore = segCount
    assert(segsBefore >= 6)
    log.compact(targetRows = 100)
    assert(log.checkConsistency() == Nil)
    val segsAfter = segCount
    assert(segsAfter < segsBefore)
    // data intact and in order
    assert(
      log.query(SeqWrap(true)).collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
        == (0 until 12).map(i => (i.toLong, i))
    )
    // point reads still resolve through the new manifest
    assert(log.get(7).getInt(1) == 7)
  }
}
