package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Curation, Sampling}
import graft.text.TextFunctions

/** Dataset-shaping operators: determinism, rate accuracy, packing
  * invariants, scrub behavior, curation composition. */
class SamplingSpec extends SparkSpec {

  private def docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")

  test("hashSample is deterministic, seed-sensitive, and near the rate") {
    val s1 = Sampling.hashSample(docs, "doc_id", 0.3, "a").select("doc_id")
    val s2 = Sampling.hashSample(docs, "doc_id", 0.3, "a").select("doc_id")
    assert(s1.collect().toSet == s2.collect().toSet) // re-run identical
    val other = Sampling.hashSample(docs, "doc_id", 0.3, "b").select("doc_id")
    assert(s1.collect().toSet != other.collect().toSet) // seeds independent
    val n = docs.count().toDouble
    val k = s1.count().toDouble
    assert(math.abs(k / n - 0.3) < 0.15, s"rate ${k / n} too far from 0.3")
    // production hash config: same determinism and rate behavior, no
    // crypto hash in the plan (xxhash64 is codegen'd; the sample it
    // draws is a different — equally valid — one)
    val p1 = Sampling.hashSample(docs, "doc_id", 0.3, "a",
      portableHash = false).select("doc_id")
    val p2 = Sampling.hashSample(docs, "doc_id", 0.3, "a",
      portableHash = false).select("doc_id")
    assert(p1.collect().toSet == p2.collect().toSet)
    val kp = p1.count().toDouble
    assert(math.abs(kp / n - 0.3) < 0.15, s"xx rate ${kp / n} far from 0.3")
    val plan = p1.queryExecution.executedPlan.toString
    assert(plan.contains("xxhash64") && !plan.contains("md5"),
      s"production config must hash with xxhash64, not md5:\n$plan")
  }

  test("tokenBudgetSample: exact greedy prefix; approx rate lands near budget") {
    import spark.implicits._
    // EXACT: the kept set must be precisely the hash-order prefix
    // whose preceding cumulative token count is under the budget
    val budget = 2000L
    val kept = Sampling
      .tokenBudgetSample(docs, "text", "doc_id", budget, "tb", exact = true)
      .select("doc_id", "n_tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // recompute the greedy walk from first principles
    val walk = docs
      .select(col("doc_id"), Sampling.hashOf(col("doc_id"), "tb").as("h"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._2, t._1))
    var cum = 0L
    val expect = scala.collection.mutable.Map.empty[Long, Long]
    walk.foreach { case (id, _, n) =>
      if (cum < budget) { expect(id) = n; cum += n }
    }
    assert(kept == expect.toMap)
    // budget is exceeded by at most the last (crossing) doc
    val total = kept.values.sum
    assert(total >= budget && total - kept.values.max <= budget)
    // budget >= corpus: everything kept, with n_tokens attached
    assert(Sampling.tokenBudgetSample(docs, "text", "doc_id", Long.MaxValue,
      "tb", exact = true).count() == docs.count())
    // APPROX (scale path): pushed-filter gate lands near the budget
    val approx = Sampling
      .tokenBudgetSample(docs, "text", "doc_id", budget, "tb")
      .agg(sum("n_tokens")).collect().head.getLong(0)
    assert(approx > 0 && math.abs(approx - budget).toDouble / budget < 0.8,
      s"approx budget $approx too far from $budget")
  }

  test("tokenBudgetSample scale path is a pushed filter: no sort, no window") {
    val plan = Sampling
      .tokenBudgetSample(docs, "text", "doc_id", 2000L, "tb")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("Sort"),
      s"scale path must not plan a global sort/window:\n$plan")
  }

  test("rrf fusion: rank-only, fixed-order two-term sum, missing = 0") {
    import spark.implicits._
    val a = Seq((1L, 0.9), (2L, 0.8), (3L, 0.7)).toDF("id", "score")
    val b = Seq((2L, 9.0), (4L, 5.0)).toDF("id", "score")
    val got = graft.query.Fuse.rrf(a, b, "id", k = 60)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = List(
      2L -> r6(1.0 / 62 + 1.0 / 61), // rank 2 in a, rank 1 in b
      1L -> r6(1.0 / 61), // a only
      3L -> r6(1.0 / 63), // a only
      4L -> r6(1.0 / 62) // b only
    ).sortBy { case (id, s) => (-s, id) }
    assert(got == expect)
  }

  test("stratifiedHashSample applies per-stratum rates") {
    val out = Sampling.stratifiedHashSample(
      docs, "lang", Map("en" -> 1.0), defaultRate = 0.0, idCol = "doc_id")
    val langs = out.select("lang").distinct().collect().map(_.getString(0))
    assert(langs.toSet == Set("en")) // default 0 drops all other strata
    assert(out.count() == docs.where(col("lang") === "en").count())
  }

  test("mixToWeights hits target proportions at the largest achievable size") {
    // sf0.001 lang counts are uneven; weight the smallest stratum
    // heavily so Tmax binds there and the others downsample toward it
    val sizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val weights = Map("en" -> 0.5, "de" -> 0.125, "es" -> 0.125,
      "fr" -> 0.125, "zh" -> 0.125)
    val out = Sampling.mixToWeights(docs, "lang", weights, "doc_id", "mx")
    val got = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the binding stratum (largest N_s/w_s deficit) keeps EVERYTHING
    val tmax = weights.map { case (s, w) => sizes(s) / w }.min
    val binding = weights.keys.minBy(s => sizes(s) / weights(s))
    assert(got(binding) == sizes(binding))
    // every stratum lands within sampling noise of its target share
    weights.foreach { case (s, w) =>
      val target = w * tmax
      assert(math.abs(got.getOrElse(s, 0L) - target) / target < 0.5,
        s"$s: got ${got.getOrElse(s, 0L)}, target $target")
    }
    // the data-sized pass is a pure narrow filter: the only shuffle
    // in the whole op was the tiny counts agg, already collected
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"mixToWeights data pass must not shuffle:\n$plan")
    // deterministic: re-run keeps the identical id set
    val again = Sampling.mixToWeights(docs, "lang", weights, "doc_id", "mx")
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet ==
      again.select("doc_id").collect().map(_.getLong(0)).toSet)
    // a rows budget below Tmax scales every stratum down together
    val small = Sampling.mixToWeights(docs, "lang", weights, "doc_id", "mx",
      totalRows = Some((tmax / 2).toLong))
    assert(small.count() < out.count())
    // an unweighted stratum would be dropped entirely
    val only = Sampling.mixToWeights(docs, "lang", Map("en" -> 1.0), "doc_id")
    assert(only.select("lang").distinct().collect()
      .map(_.getString(0)).toSet == Set("en"))
    // a weighted stratum absent from the corpus is unachievable: the
    // guard throws NAMING the stratum (silent-empty was the old — and
    // wrong — behavior this vector used to pin)
    val absent = intercept[IllegalArgumentException] {
      Sampling.mixToWeights(docs, "lang", Map("xx" -> 1.0), "doc_id").count()
    }
    assert(absent.getMessage.contains("xx"),
      s"guard must name the missing stratum: ${absent.getMessage}")
    // non-string stratum columns work through the same string-keyed API
    import spark.implicits._
    val intStrata = Seq((1L, 7), (2L, 7), (3L, 8)).toDF("doc_id", "bucket")
    val mixed = Sampling
      .mixToWeights(intStrata, "bucket", Map("7" -> 0.5, "8" -> 0.5), "doc_id")
    assert(mixed.count() > 0)
  }

  test("mixToTokenWeights hits target TOKEN shares, not row shares") {
    val weights = Map("en" -> 0.5, "de" -> 0.125, "es" -> 0.125,
      "fr" -> 0.125, "zh" -> 0.125)
    val out = Sampling
      .mixToTokenWeights(docs, "lang", weights, "text", "doc_id", "mt")
    val tokByLang = out.groupBy("lang")
      .agg(sum("n_tokens").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = tokByLang.values.sum.toDouble
    // every stratum's TOKEN share lands near its weight (hash-gate
    // sampling noise on a few hundred docs → generous tolerance)
    weights.foreach { case (s, w) =>
      val share = tokByLang.getOrElse(s, 0L) / total
      assert(math.abs(share - w) / w < 0.5, s"$s: share $share vs weight $w")
    }
    // the binding stratum (min T_s/w_s) keeps every row
    val sizes = docs
      .groupBy("lang")
      .agg(sum(TextFunctions.tokenCount(col("text")).cast("long")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val binding = weights.keys.minBy(s => sizes(s) / weights(s))
    assert(out.where(col("lang") === binding).count() ==
      docs.where(col("lang") === binding).count())
    // a token budget below Tmax scales everything down together
    val tmax = weights.map { case (s, w) => sizes(s) / w }.min
    val small = Sampling.mixToTokenWeights(docs, "lang", weights, "text",
      "doc_id", "mt", budgetTokens = Some((tmax / 2).toLong))
    assert(small.agg(sum("n_tokens")).collect().head.getLong(0) <
      out.agg(sum("n_tokens")).collect().head.getLong(0))
    // like mixToWeights: the data pass is a pure pushed filter
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"mixToTokenWeights data pass must not shuffle:\n$plan")
  }

  test("temperatureMix: alpha=1 is the identity, lower alpha flattens toward the smallest stratum") {
    val sizes = docs
      .groupBy("lang")
      .agg(sum(TextFunctions.tokenCount(col("text")).cast("long")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // alpha = 1: every rate is T_s*T/T_s... = 1 — nothing drops
    val natural = Sampling
      .temperatureMix(docs, "lang", "text", "doc_id", alpha = 1.0, "tm")
    assert(natural.count() == docs.count(), "alpha=1 dropped rows")
    // alpha = 0.5: the smallest stratum keeps everything, bigger
    // strata downsample, and the big/small token ratio shrinks
    val flat = Sampling
      .temperatureMix(docs, "lang", "text", "doc_id", alpha = 0.5, "tm")
    val smallest = sizes.minBy(_._2)._1
    val biggest = sizes.maxBy(_._2)._1
    assert(flat.where(col("lang") === smallest).count() ==
      docs.where(col("lang") === smallest).count(),
      "smallest stratum must bind (keep all)")
    val outTok = flat.groupBy("lang").agg(sum("n_tokens").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ratioBefore = sizes(biggest).toDouble / sizes(smallest)
    val ratioAfter = outTok(biggest).toDouble / outTok(smallest)
    assert(ratioAfter < ratioBefore,
      s"flattening did not shrink the mix ratio: $ratioAfter vs $ratioBefore")
    // expectation: ratio ≈ sqrt(ratioBefore) at alpha = 0.5
    assert(math.abs(ratioAfter - math.sqrt(ratioBefore)) /
      math.sqrt(ratioBefore) < 0.5, s"ratio $ratioAfter far from " +
      s"sqrt(${ratioBefore}) = ${math.sqrt(ratioBefore)}")
    // the data pass stays a pure pushed filter
    val plan = flat.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"temperatureMix data pass must not shuffle:\n$plan")
  }

  test("leakSafeSplit: clusters never straddle a split, fractions hold, refusals are loud") {
    import spark.implicits._
    val corpus = (0L until 1000L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // a 3-chain and a pair of near-dups; everything else is singleton
    val pairs = Seq((1L, 2L), (2L, 3L), (50L, 51L)).toDF("id_a", "id_b")
    val out = Sampling.leakSafeSplit(corpus, "doc_id", pairs,
      Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1), seed = "ls")
    val byId = out.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId.size == 1000)
    // cluster-consistent labels: the whole chain shares one label
    assert(Set(byId(1L), byId(2L), byId(3L)).size == 1, "chain straddled")
    assert(byId(50L) == byId(51L), "pair straddled")
    // fractions roughly hold over 1000 docs (hash noise tolerance)
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "valid", "test"))
    assert(math.abs(counts("train") - 800L) < 80, s"train: ${counts("train")}")
    // deterministic: a re-run labels identically
    val again = Sampling.leakSafeSplit(corpus, "doc_id", pairs,
      Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1), seed = "ls")
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == byId)
    intercept[IllegalArgumentException] { // fractions must sum to 1
      Sampling.leakSafeSplit(corpus, "doc_id", pairs,
        Seq("train" -> 0.8, "test" -> 0.1))
    }
    intercept[IllegalArgumentException] { // duplicate names
      Sampling.leakSafeSplit(corpus, "doc_id", pairs,
        Seq("train" -> 0.5, "train" -> 0.5))
    }
  }

  test("invalid knobs fail fast at plan construction, not deep in execution") {
    intercept[IllegalArgumentException] {
      Sampling.packSequences(
        docs, "doc_id", TextFunctions.tokenCount(col("text")), budget = 0)
    }
    intercept[IllegalArgumentException] {
      Sampling.packSequences(
        docs, "doc_id", TextFunctions.tokenCount(col("text")),
        budget = 128, numShards = 0)
    }
    // stride=0 would hit "sequence step must not be zero" at runtime;
    // chunkTokens<=0 would yield silently wrong windows
    intercept[IllegalArgumentException] {
      TextFunctions.chunks(col("text"), chunkTokens = 64, stride = 0)
    }
    intercept[IllegalArgumentException] {
      TextFunctions.chunks(col("text"), chunkTokens = 0, stride = 32)
    }
  }

  test("chunks cover every token: the final window clamps to the document end") {
    import spark.implicits._
    // 12 tokens, chunk=4, stride=3: strided starts 1,4,7 cover tokens
    // 1..10 only — the tail window starting at 9 must be added so
    // tokens 11-12 appear in a chunk
    val doc = (1 to 12).map(i => s"t$i").mkString(" ")
    val got = Seq(doc).toDF("text")
      .select(TextFunctions.chunks(col("text"), 4, 3).as("c"))
      .head().getSeq[String](0)
    assert(got.last == "t9 t10 t11 t12", s"tail window missing: $got")
    // every token appears in at least one chunk
    val covered = got.flatMap(_.split(" ")).toSet
    assert(covered == (1 to 12).map(i => s"t$i").toSet)
    // aligned case unchanged: no duplicate final window
    val aligned = Seq((1 to 10).map(i => s"t$i").mkString(" ")).toDF("text")
      .select(TextFunctions.chunks(col("text"), 4, 3).as("c"))
      .head().getSeq[String](0)
    assert(aligned.size == 3 && aligned.last == "t7 t8 t9 t10")
  }

  test("tokens strip ALL edge whitespace, not just spaces") {
    import spark.implicits._
    val rows = Seq("hello world\n", "\n", "\ta b\r\n", "").toDF("text")
      .select(TextFunctions.tokenCount(col("text")).as("n"))
      .collect().map(_.getInt(0)).toSeq
    // phantom "" tokens from a trailing newline would make these 3,2,3,0
    assert(rows == Seq(2, 0, 2, 0), s"token counts: $rows")
  }

  test("packSequences: offsets are contiguous per shard, bins respect budget") {
    val packed = Sampling
      .packSequences(docs, "doc_id", TextFunctions.tokenCount(col("text")),
        budget = 128, numShards = 3)
      .orderBy("shard", "doc_id")
      .collect()
    packed.groupBy(_.getInt(0)).foreach { case (_, rows) =>
      var expect = 0L
      rows.foreach { r =>
        assert(r.getLong(3) == expect, s"start_tok gap at ${r.getLong(1)}")
        assert(r.getLong(4) == r.getLong(3) / 128) // bin = start / budget
        expect += r.getLong(2)
      }
    }
    // every doc appears exactly once across shards
    assert(packed.map(_.getLong(1)).distinct.length == docs.count())
  }

  test("topKPerStratum caps every stratum at k, deterministically") {
    val capped = Sampling.topKPerStratum(docs, "lang", "doc_id", 3)
    val perLang = capped.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perLang.values.forall(_ <= 3))
    // strata smaller than k keep everything
    val sizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (lang, n) =>
      assert(perLang.getOrElse(lang, 0L) == math.min(n, 3L), lang)
    }
    // same seed, same selection
    val again = Sampling.topKPerStratum(docs, "lang", "doc_id", 3)
    assert(capped.select("doc_id").collect().map(_.getLong(0)).toSet ==
      again.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("interleave assigns a dense deterministic permutation") {
    val p1 = Sampling.interleave(docs, "doc_id").select("position", "doc_id")
    val rows = p1.orderBy("position").collect()
    assert(rows.map(_.getLong(0)).toSeq == (0L until docs.count()).toSeq)
    // decorrelated from id order (a permutation, not the identity)
    assert(rows.map(_.getLong(1)).toSeq != rows.map(_.getLong(1)).sorted.toSeq)
    val p2 = Sampling.interleave(docs, "doc_id").select("position", "doc_id")
    assert(p2.orderBy("position").collect().toSeq == rows.toSeq)
  }

  test("writeInterleaved: files partition the key space, no single reducer") {
    // plan shape: a RANGE exchange (distributed sort), never the
    // SinglePartition exchange interleave()'s dense row_number needs
    val plan = Sampling
      .interleavedPlan(docs.select("doc_id", "lang"), "doc_id", 8, "sI")
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan.take(400))
    assert(!plan.contains("SinglePartition"), plan.take(400))

    val dir = java.nio.file.Files.createTempDirectory("graft-ileave-").toString
    try {
      Sampling.writeInterleaved(
        docs.select("doc_id", "lang"), "doc_id", s"$dir/out", 8, "sI")
      val back = spark.read.parquet(s"$dir/out")
      assert(back.count() == docs.count()) // every row lands exactly once
      // per-file (key, id) ranges are pairwise disjoint: reading files
      // in range order IS the global interleave
      val ranges = back
        .groupBy(input_file_name().as("f"))
        .agg(min(struct(col("_ikey"), col("doc_id"))).as("lo"),
          max(struct(col("_ikey"), col("doc_id"))).as("hi"))
        .collect()
        .map(r => (r.getStruct(1), r.getStruct(2)))
      assert(ranges.length == 8)
      implicit val ord: Ordering[(Long, Long)] = Ordering.Tuple2[Long, Long]
      val sorted = ranges
        .map { case (lo, hi) =>
          ((lo.getLong(0), lo.getLong(1)), (hi.getLong(0), hi.getLong(1)))
        }
        .sortBy(_._1)
      sorted.sliding(2).foreach {
        case Array((_, hiA), (loB, _)) =>
          assert(ord.lt(hiA, loB), s"file ranges overlap: $hiA >= $loB")
        case _ =>
      }
      // each file is internally sorted on (key, id): a loader
      // merge-reading files in range order replays the interleave
      val files = back.select(input_file_name()).distinct()
        .collect().map(_.getString(0))
      files.foreach { f =>
        val seq = spark.read.parquet(f)
          .select("_ikey", "doc_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq
        assert(seq == seq.sorted, s"file $f not internally sorted")
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("scrubPii replaces emails, urls, and long digit runs") {
    import spark.implicits._
    val in = Seq(
      "mail me at jane.doe+x@corp.example.org today",
      "docs: https://ex.io/a?b=1#c end",
      "card 12345678901234 short 12345678 ok",
      "clean text stays clean"
    ).toDF("t")
    val out = in.select(TextFunctions.scrubPii(col("t")).as("c"))
      .collect().map(_.getString(0))
    assert(out(0) == "mail me at <EMAIL> today")
    assert(out(1) == "docs: <URL> end")
    assert(out(2) == "card <NUM> short 12345678 ok") // 8 digits kept
    assert(out(3) == "clean text stays clean")
  }

  test("curation composes gates, dedup, and sampling monotonically") {
    val full = Curation.curate(docs, "text", "doc_id", sampleRate = 1.0)
    val sampled = Curation.curate(docs, "text", "doc_id", sampleRate = 0.5)
    val fullIds = full.select("doc_id").collect().map(_.getLong(0)).toSet
    val sampleIds = sampled.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sampleIds.subsetOf(fullIds)) // sampling only removes rows
    assert(sampleIds.nonEmpty && sampleIds.size < fullIds.size)
    // survivors carry the gate columns
    assert(full.columns.contains("n_tokens") && full.columns.contains("quality"))
    // plan shape: exactly one shuffle-bearing aggregate (the dedup
    // fingerprint groupBy); the gates must stay narrow filters
    val plan = full.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }
  test("prioritySample: exact per-stratum size, deterministic, weight-responsive") {
    import spark.implicits._
    val base = docs.select("doc_id", "lang", "n_chars")
    val k = 15
    val got = Sampling.prioritySample(base, "lang", col("n_chars") + 1,
      k, "doc_id", "sp1")
    // exact-size: min(k, stratum size) per stratum
    val sizes = got.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = base.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    full.foreach { case (lang, n) =>
      assert(sizes.getOrElse(lang, 0L) == math.min(k.toLong, n),
        s"stratum $lang: ${sizes.get(lang)} of $n (k=$k)")
    }
    // deterministic across re-runs
    val again = Sampling.prioritySample(base, "lang", col("n_chars") + 1,
      k, "doc_id", "sp1")
    assert(got.select("doc_id").collect().map(_.getLong(0)).toSet ==
      again.select("doc_id").collect().map(_.getLong(0)).toSet)
    // weight-responsive: a row whose weight dwarfs every other is
    // (essentially) always drawn — its priority u/w is pushed toward 0
    val boosted = base.withColumn("w",
      when(col("doc_id") === 7, lit(1e12)).otherwise(lit(1.0)))
    val drawn = Sampling.prioritySample(boosted, "lang", col("w"),
      k = 2, "doc_id", "sp2")
      .where(col("doc_id") === 7).count()
    assert(drawn == 1L, "a dominant weight must be sampled")
    // without replacement trivially: ids unique
    val ids = got.select("doc_id").collect().map(_.getLong(0))
    assert(ids.distinct.length == ids.length)
  }

  test("epochRepeat: floor+gate copy counts, dense epoch_idx, e<1 is a downsample") {
    import spark.implicits._
    val base = docs.select("doc_id")
    val e = lit(1.0) + (col("doc_id") % 3).cast("double") * 0.5
    val out = Sampling.epochRepeat(base, e, "doc_id", "se1")
      .groupBy("doc_id").agg(count(lit(1)).as("n"),
        max("epoch_idx").as("mx"), min("epoch_idx").as("mn"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val gate = Sampling.hashOf(col("doc_id"), "se1")
    val gates = base.select(col("doc_id"), gate.as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { case (id, n, mx, mn) =>
      val ev = 1.0 + (id % 3) * 0.5
      val want = math.floor(ev).toLong +
        (if (gates(id).toDouble < (ev - math.floor(ev)) * 4294967296.0) 1L
         else 0L)
      assert(n == want, s"doc $id: $n copies, want $want (e=$ev)")
      assert(mn == 0L && mx == n - 1, s"doc $id: epoch_idx not dense")
    }
    // every mod-0 doc (e=1.0) appears exactly once; mod-2 (e=2.0) twice
    out.filter(_._1 % 3 == 0).foreach(t => assert(t._2 == 1L))
    out.filter(_._1 % 3 == 2).foreach(t => assert(t._2 == 2L))
    // e < 1: pure downsample near the rate, single copies only
    val down = Sampling.epochRepeat(base, lit(0.4), "doc_id", "se2")
    val rate = down.count().toDouble / base.count()
    assert(math.abs(rate - 0.4) < 0.15, s"e=0.4 kept $rate")
    assert(down.agg(max("epoch_idx")).collect()(0).getLong(0) == 0L)
    // narrow plan: no shuffle in the explode path
    val plan = Sampling.epochRepeat(base, e, "doc_id", "se1")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"epochRepeat must not shuffle:\n$plan")
  }
}
