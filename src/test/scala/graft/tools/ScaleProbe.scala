package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup

/** 10× scale probe for the quadratic-risk operators (test-scope tool):
  * replicate the sf0.1 corpus 10-fold so EVERY doc becomes a 10-way
  * duplicate cluster — the worst case for LSH candidate generation
  * (each bucket holds all copies; pairs grow k² per cluster). If the
  * plans are right, runtime grows ~linearly in docs + quadratically
  * ONLY within clusters (bounded by the bucket cap), never n².
  * Run: sbt "Test/runMain graft.tools.ScaleProbe [sfDir] [copies]"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession
      .builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"== $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
      r
    }

    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    val n = docs.count()
    val big = (0 until copies)
      .map(i => docs.select((col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ union _)
      .repartition(32)
    big.cache()
    println(s"== corpus: ${big.count()} docs (${copies}x of $n)")

    // 1x reference points (same parameters as the bench)
    t(s"lsh_pairs 1x ($n docs)") {
      println("   pairs=" + Dedup
        .minhashLshPairs(docs, "text", "doc_id", 16, 2, 3, 0.7,
          portableHash = false).count())
    }
    t(s"lsh_pairs ${copies}x (every doc a $copies-way cluster)") {
      println("   pairs=" + Dedup
        .minhashLshPairs(big, "text", "doc_id", 16, 2, 3, 0.7,
          portableHash = false).count())
    }

    val emb = Tables.load(spark, sfDir, "embeddings")
    val m = emb.count()
    // warm-up: signature codegen + shuffle machinery compile once here
    // so the 1x/10x numbers measure scaling, not first-invocation cost
    Dedup.embeddingNearDupLsh(emb.limit(200), "embedding", "vec_id", 0.3,
      bits = 4).count()
    spark.catalog.clearCache()
    val bigEmb = (0 until copies)
      .map(i => emb.select((col("vec_id") + lit(i.toLong * 1000000L)).as("vec_id"), col("embedding")))
      .reduce(_ union _)
      .repartition(32)
    bigEmb.cache()
    println(s"== embeddings: ${bigEmb.count()} (${copies}x of $m)")
    t(s"embed_neardup_lsh 1x") {
      println("   pairs=" + Dedup
        .embeddingNearDupLsh(emb, "embedding", "vec_id", 0.3, bits = 4).count())
    }
    t(s"embed_neardup_lsh ${copies}x") {
      println("   pairs=" + Dedup
        .embeddingNearDupLsh(bigEmb, "embedding", "vec_id", 0.3, bits = 4).count())
    }

    // round-4 operators: narrow / per-shard — must scale ~linearly
    import graft.pipeline.{Curation, Sampling}
    import graft.text.TextFunctions
    t(s"curation 1x") {
      println("   survivors=" + Curation
        .curate(docs, "text", "doc_id", sampleRate = 0.5).count())
    }
    t(s"curation ${copies}x (10-way exact-dup clusters)") {
      println("   survivors=" + Curation
        .curate(big, "text", "doc_id", sampleRate = 0.5).count())
    }
    t(s"pack_sequences ${copies}x (32 shards)") {
      Sampling.packSequences(big, "doc_id",
        TextFunctions.tokenCount(col("text")), 2048, numShards = 32).count()
    }
    t(s"quantize_int8 ${copies}x") {
      graft.similarity.Quantize.int8(bigEmb, "embedding", "vec_id").count()
    }

    // round-5 operators, worst-case shaped: boilerplate with every
    // gram at df×copies (the whole corpus is boilerplate), semantic
    // dedup with every vector a copies-way identical cluster (max
    // within-cell pair growth). Aggregates force the joins (count()
    // lets Catalyst eliminate an outer join).
    import graft.pipeline.{Boilerplate, Decontaminate}
    t(s"decontaminate ${copies}x") {
      println("   flagged=" + Decontaminate.overlapCounts(
        big.where(col("doc_id") % 17 =!= 0),
        docs.where(col("doc_id") % 17 === 0),
        "text", "doc_id").count())
    }
    t(s"boilerplate ${copies}x (every gram df x$copies)") {
      Boilerplate.boilerplateRatio(big, "text", "doc_id", 3, 5L)
        .agg(sum("boiler_ratio")).collect()
    }
    t(s"bm25 ${copies}x") {
      TextFunctions.bm25(big, "text", "doc_id", Seq("table", "join", "query"))
        .agg(sum("score")).collect()
    }
    t(s"semantic_dedup ${copies}x ($copies-way identical clusters)") {
      println("   survivors=" + Dedup.semanticDedup(
        bigEmb, "embedding", "vec_id", (0L until 8L).toSeq, 0.95).count())
    }
    spark.stop()
  }
}
