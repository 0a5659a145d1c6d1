package graft

/** The driver's t1 smoke contract: entry() on sf0.001 returns rows. */
class EntrySpec extends SparkSpec {
  test("entry returns non-empty flagship result") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.toSeq == Seq("n_name", "revenue", "n_orders"))
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    // and every query is oracle-checked (round-1 invariant)
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet)
  }
}
