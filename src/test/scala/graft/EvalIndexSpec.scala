package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Decontaminate, EvalIndex}

/** Contract vectors for the standing eval-set artifact: registered
  * suites union into one dictionary that decontaminates exactly like
  * the one-shot operator against the concatenated sets, with the
  * journal/pinned-width discipline of its artifact siblings. */
class EvalIndexSpec extends SparkSpec {

  private lazy val docs = Tables
    .load(spark, "/root/testdata/sf0.001", "documents")
    .select("doc_id", "text")
  private lazy val evalA = docs.where(col("doc_id") % 10 === 0)
  private lazy val evalB = docs.where(col("doc_id") % 10 === 5)
  private lazy val corpus =
    docs.where(col("doc_id") % 10 =!= 0 && col("doc_id") % 10 =!= 5)

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSeq.sorted

  test("standing union of two suites decontaminates like the one-shot " +
      "operator over their concatenation") {
    val idx = EvalIndex.open(spark, tmpDir("eval-idx-"), width = 3)
    idx.ingest("suite-a", evalA, "text")
    idx.ingest("suite-b", evalB, "text")
    val standing = ids(idx.decontaminate(corpus, "text", "doc_id"))
    val oneShot = ids(Decontaminate.decontaminate(
      corpus, evalA.unionByName(evalB), "text", "doc_id", width = 3))
    assert(standing == oneShot,
      "standing dictionary != one-shot decontamination")
    assert(standing.size < ids(corpus).size,
      "decontamination dropped nothing — vacuous")
    // the join leg past the collect gate returns the identical set
    val viaJoin = ids(idx.decontaminate(corpus, "text", "doc_id",
      maxCollectedKeys = 1L))
    assert(viaJoin == standing, "join leg != narrow-expression leg")
    // audit handles: both suites are on record
    assert(idx.appliedVersion("suite-a").isDefined &&
      idx.appliedVersion("suite-b").isDefined)
    assert(idx.appliedVersion("suite-c").isEmpty)
  }

  test("re-registration is a no-op; keys stay globally distinct") {
    val idx = EvalIndex.open(spark, tmpDir("eval-rep-"), width = 3)
    idx.ingest("a", evalA, "text")
    val v = idx.version
    val n = idx.keys.count()
    idx.ingest("a", evalA, "text") // redelivery
    assert(idx.version == v && idx.keys.count() == n,
      "redelivered set re-committed")
    // an overlapping second set adds only its NEW keys
    idx.ingest("a-again-as-b", evalA, "text")
    assert(idx.keys.count() == n,
      "identical set registered under a new id duplicated keys")
    assert(idx.keys.distinct().count() == idx.keys.count())
  }

  test("the collected dictionary is cached on the handle per version: " +
      "a repeat call at an unchanged version schedules ZERO jobs") {
    val idx = EvalIndex.open(spark, tmpDir("eval-cache-"), width = 3)
    idx.ingest("a", evalA, "text")
    val sc = spark.sparkContext
    def jobsIn(group: String)(f: => Unit): Int = {
      sc.setJobGroup(group, group, interruptOnCancel = false)
      try f finally sc.clearJobGroup()
      // the status store is fed asynchronously — poll until stable
      var last = -1
      var n = sc.statusTracker.getJobIdsForGroup(group).length
      var spins = 0
      while (n != last && spins < 50) {
        last = n; Thread.sleep(100)
        n = sc.statusTracker.getJobIdsForGroup(group).length
        spins += 1
      }
      n
    }
    val first = jobsIn("eval-dict-1")(idx.gramKeys())
    assert(first > 0, "first collect scheduled no job — counter broken")
    assert(jobsIn("eval-dict-2")(idx.gramKeys()) == 0,
      "repeat gramKeys at an unchanged version re-ran the dictionary job")
    // overlapCounts shares the cache: only the CORPUS job runs, never
    // a dictionary job (one scoring pass = fewer jobs than the first
    // dictionary collect + score would be)
    val scoreJobs = jobsIn("eval-dict-3") {
      idx.overlapCounts(corpus, "text", "doc_id").collect()
      ()
    }
    assert(scoreJobs > 0, "scoring ran no job — vacuous")
    // a NEW version invalidates: registration changes the dictionary
    idx.ingest("b", evalB, "text")
    assert(jobsIn("eval-dict-4")(idx.gramKeys()) > 0,
      "a new version must re-collect")
    // the as-of path caches per pinned version too
    val v = idx.version
    jobsIn("eval-dict-5")(idx.gramKeys(asOf = Some(v)))
    assert(jobsIn("eval-dict-6")(idx.gramKeys(asOf = Some(v))) == 0,
      "repeat as-of collect re-ran the dictionary job")
  }

  test("pinned width: reopen restores it, mismatch refuses; compact " +
      "preserves the dictionary and the journal") {
    val dir = tmpDir("eval-pin-")
    val idx = EvalIndex.open(spark, dir, width = 3)
    idx.ingest("a", evalA, "text")
    assert(EvalIndex.open(spark, dir).width == 3)
    val e = intercept[IllegalArgumentException](
      EvalIndex.open(spark, dir, width = 5))
    assert(e.getMessage.contains("never union"))
    val before = idx.keys.collect().map(_.getLong(0)).toSet
    idx.compact()
    assert(idx.keys.collect().map(_.getLong(0)).toSet == before,
      "compact changed the dictionary")
    assert(idx.appliedVersion("a").isDefined, "compact dropped the journal")
  }
}
