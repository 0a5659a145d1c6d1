package graft

import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Adversarial-input PERF canary (VERDICT r17 task 5): the
  * HOF-capture pathology — a higher-order-function lambda capturing a
  * computed subtree re-evaluates it PER ELEMENT, turning a linear
  * text walk quadratic — shipped in three operators for several
  * rounds because the bench's sf0.1 docs are short (quadratic-in-
  * tokens is invisible at ~100 tokens). This suite runs the repaired
  * operators over documents three orders of magnitude longer than the
  * fixture's and asserts a wall-clock bound the pre-fix quadratic
  * forms would miss by minutes:
  *
  *   - pre-fix `ngramsAll` re-tokenized the full text once per gram →
  *     ~100k re-walks of a ~700 KB string (~10^11 char ops);
  *   - pre-fix `chunks` re-tokenized per chunk window;
  *   - pre-fix `Quantize.int8` re-reduced the whole vector per
  *     component (quadratic in dimension).
  *
  * The bound is deliberately loose (noise-proof at ~30x the observed
  * post-fix cost) — the canary distinguishes LINEAR from QUADRATIC,
  * not fast from faster. A regression to the capture form fails it by
  * an order of magnitude, not by a margin call.
  */
class TextPerfCanarySpec extends SparkSpec {

  import spark.implicits._

  // 4 docs x 100k tokens (~700 KB each) — hash-varied tokens so the
  // per-size dedup maps in repetitionStats stay populated
  private lazy val longDocs = spark.range(4).select(
    col("id").as("doc_id"),
    concat_ws(" ", transform(sequence(lit(0), lit(99999)), i =>
      pmod(xxhash64(col("id"), i), lit(99991)).cast("string")))
      .as("text"))
    .localCheckpoint(true)

  private def timed[A](what: String, boundSecs: Double)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"$what: $secs%.2f s (bound $boundSecs%.0f s)")
    assert(secs < boundSecs,
      f"$what took $secs%.1f s on 100k-token docs — linear walks " +
        "finish in single-digit seconds; this smells like the " +
        "HOF-capture quadratic (a lambda capturing a computed subtree " +
        "re-evaluates it per element)")
    r
  }

  test("repetitionStats is linear-ish in document length") {
    timed("repetitionStats x4 100k-token docs", 60.0) {
      longDocs.select(TextFunctions.repetitionStats(col("text")).as("rs"))
        .select(sum(col("rs.dup_5gram_char_frac"))).collect()
    }
  }

  test("ngramsAll and chunks do not re-tokenize per gram/window") {
    timed("ngramsAll(3) x4 100k-token docs", 60.0) {
      longDocs.select(size(TextFunctions.ngramsAll(col("text"), 3)).as("n"))
        .agg(sum(col("n"))).collect()
    }
    timed("chunks(512, 256) x4 100k-token docs", 60.0) {
      longDocs
        .select(size(TextFunctions.chunks(col("text"), 512, 256)).as("n"))
        .agg(sum(col("n"))).collect()
    }
  }

  test("stripRepeatedSpans is gram-linear on long docs") {
    timed("stripRepeatedSpans x4 100k-token docs", 120.0) {
      graft.dedup.Dedup
        .stripRepeatedSpans(longDocs, "text", "doc_id")
        .agg(sum(length(col("clean_text")))).collect()
    }
  }

  test("Quantize.int8 does not re-reduce the vector per component") {
    val wide = spark.range(16).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(65535)), d =>
        (pmod(xxhash64(col("id"), d), lit(2001)) - 1000)
          .cast("float") / 1000.0f).as("embedding"))
    timed("int8 x16 65536-dim vectors", 60.0) {
      graft.similarity.Quantize.int8(wide, "embedding", "vec_id")
        .select(element_at(col("q"), 1).as("c"))
        .agg(sum(col("c"))).collect()
    }
  }
}
