package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval — combining a lexical ranking
  * (BM25) with a second signal (vector similarity, a quality prior)
  * without score calibration. */
object Fuse {

  /** Reciprocal-rank fusion (Cormack et al.): each input list
    * contributes `1 / (k + rank)` for the documents it ranks, fused
    * by summation; documents missing from a list get 0 from it. RRF
    * is the standard score-free fusion — it needs no normalization
    * because it only consumes RANKS, which is what makes BM25 (~0-20)
    * and cosine (~[-1,1]) composable at all.
    *
    * Inputs are (id, score) CANDIDATE LISTS — top-k retrieval
    * outputs, not corpora. Ranks are assigned within each list by
    * `(score desc, id asc)` (deterministic, 1-based); each list's
    * window therefore sorts only its own k rows — the single
    * partition IS the right plan for a bounded candidate frame, and
    * the fusion join is k-row × k-row. Returns `(id, rrf)` with the
    * fixed-order two-term sum rounded to 6, ordered by
    * `(rrf desc, id asc)`. */
  def rrf(
      a: DataFrame,
      b: DataFrame,
      idCol: String,
      k: Int = 60
  ): DataFrame = {
    require(k > 0, s"rrf k must be > 0 (got $k)")
    def ranked(df: DataFrame, rankName: String): DataFrame = {
      require(df.columns.length == 2 && df.columns.contains(idCol),
        s"rrf inputs must be (id, score) frames; got ${df.columns.mkString(", ")}")
      val scoreCol = df.columns.filter(_ != idCol).head
      df.select(
        col(idCol),
        row_number()
          .over(Window.orderBy(col(scoreCol).desc, col(idCol).asc))
          .cast("long")
          .as(rankName))
    }
    // union + sum instead of a full-outer join: the two contributions
    // per id are summed by ONE aggregate (the r20 plan audit flagged
    // the join as a SortMergeJoin — full outer cannot broadcast).
    // Value-identical: IEEE addition is commutative, so the ≤ 2-term
    // sum is the same double in either arrival order, and a
    // single-list id's sum equals its old `term + 0.0`.
    ranked(a, "_r").select(col(idCol), (lit(1.0) / (lit(k) + col("_r"))).as("_c"))
      .unionByName(ranked(b, "_r")
        .select(col(idCol), (lit(1.0) / (lit(k) + col("_r"))).as("_c")))
      .groupBy(col(idCol))
      .agg(round(sum(col("_c")), 6).as("rrf"))
      .orderBy(col("rrf").desc, col(idCol).asc)
  }
}
