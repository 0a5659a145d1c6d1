package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Plan inspection / stage timing helper:
  * `sbt "runMain graft.ExplainTool <what> [sfDir]"`.
  * `explain:<query>` prints the formatted plan of a SparkEntry query;
  * `lshprof` times each stage of the MinHash-LSH pipeline separately.
  */
object ExplainTool {
  def main(args: Array[String]): Unit = {
    val what = args.headOption.getOrElse("explain:q12_agg_pricing")
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession
      .builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"== $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    what match {
      case s if s.startsWith("explain:") =>
        val q = s.stripPrefix("explain:")
        SparkEntry.queries(q)(spark, sfDir).explain("formatted")
      case "lshprof" =>
        val docs = Tables.load(spark, sfDir, "documents").cache()
        println(s"== docs: ${docs.count()}")
        val sigs = timed("signatures") {
          val s0 = Dedup.minhashSignatures(docs, "text", "doc_id", 16)
          s0.cache(); s0.count(); s0
        }
        val banded = timed("banding") {
          val b = sigs.select(
            col("doc_id"),
            posexplode(
              array((0 until 2).map { b =>
                md5(concat_ws(",", slice(col("signature"), b * 8 + 1, 8)))
              }: _*)
            ).as(Seq("band", "bucket"))
          )
          b.cache(); b.count(); b
        }
        val cand = timed("candidates") {
          val l = banded.select(col("doc_id").as("id_a"), col("band"), col("bucket"))
          val r = banded.select(col("doc_id").as("id_b"), col("band"), col("bucket"))
          val c = l.join(r, Seq("band", "bucket"))
            .where(col("id_a") < col("id_b"))
            .select("id_a", "id_b").distinct()
          c.cache(); println(s"== candidates: ${c.count()}"); c
        }
        timed("verify") {
          Dedup.verifyJaccard(docs, "text", "doc_id", cand, 3, 0.7).count()
        }
      case "shprof" =>
        val docs = Tables.load(spark, sfDir, "documents").cache()
        println(s"== docs: ${docs.count()}")
        val toks = split(lower(trim(col("text"))), "\\s+")
        timed("tokens_only")(docs.select(explode(toks)).count())
        val rawSh = transform(
          sequence(lit(1), size(toks) - lit(2)),
          i => concat_ws(" ", slice(toks, i, lit(3)))
        )
        timed("shingles_nodistinct")(docs.select(explode(rawSh)).count())
        timed("shingles_distinct")(
          docs.select(explode(array_distinct(rawSh))).count()
        )
        val sh = Dedup.shingles(col("text"), 3)
        timed("explode_only")(
          docs.select(col("doc_id"), explode(sh).as("s")).count()
        )
        val e = docs.select(col("doc_id"), explode(sh).as("s")).cache()
        timed("explode_cache")(e.count())
        timed("one_md5")(e.select(md5(concat(lit("0:"), col("s")))).count())
        timed("16_md5_agg") {
          e.groupBy("doc_id")
            .agg(
              min(md5(col("s"))).as("h0"),
              (1 until 16).map(k =>
                min(substring(md5(concat(lit(s"$k:"), col("s"))), 1, 16))
                  .as(s"h$k")): _*
            )
            .count()
        }
      case "vecprof" =>
        // custom codegen'd FloatVecDot vs built-in aggregate/zip_with,
        // on the all-pairs near-dup shape
        val emb = Tables.load(spark, sfDir, "embeddings").cache()
        println(s"== vectors: ${emb.count()}")
        val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("va"))
        val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
        val pairs = a.crossJoin(b).where(col("id_a") < col("id_b"))
        graft.functions.VecOps.register(spark)
        timed("builtin_dot_allpairs") {
          pairs
            .select(graft.similarity.Ann.dot(col("va"), col("vb")).as("d"))
            .agg(sum("d"))
            .collect()
        }
        timed("native_dot_allpairs") {
          pairs
            .select(call_function("vec_dot_f", col("va"), col("vb")).as("d"))
            .agg(sum("d"))
            .collect()
        }
      case "sqlext" =>
        // fresh session WITH extensions (works here because this JVM
        // has no prior session): native functions from pure SQL text
        spark.stop()
        val s2 = SparkSession
          .builder()
          .master("local[2]")
          .config("spark.sql.extensions", "graft.GraftExtensions")
          .config("spark.ui.enabled", "false")
          .getOrCreate()
        s2.sparkContext.setLogLevel("WARN")
        val r = s2.sql(
          """SELECT vec_dot_f(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d,
            |  vec_norm_f(array(3.0F, 4.0F)) AS n,
            |  word_shingles('the quick brown fox', 3) AS sh""".stripMargin)
        r.show(truncate = false)
        println(s"== sqlext ok: ${r.collect()(0)}")
        // TVF demo: query an engine log from pure SQL text
        val dir = java.nio.file.Files.createTempDirectory("sqlext").toString
        val lg = graft.storage.ParquetLog
          .open(s2, s"$dir/log", org.apache.spark.sql.types.IntegerType)
        import s2.implicits._
        lg.appendValues(Seq(10, 20, 30))
        s2.sql(s"SELECT seq, value FROM graft_log('$dir/log') WHERE seq >= 1")
          .show()
        s2.stop()
      case other => println(s"unknown: $other")
    }
    spark.stop()
  }
}
