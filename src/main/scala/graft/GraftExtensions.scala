package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{VecOps, WordShingles}

/** SparkSessionExtensions entry point: makes the engine's native
  * expressions available to ANY session — including pure-SQL ones —
  * via
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)  // or
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  * after which `SELECT vec_dot_f(a, b)`, `vec_norm_f(v)` and
  * `word_shingles(text, 3)` work from SQL text. For a session created
  * WITHOUT extensions, [[GraftExtensions.registerAll]] installs the
  * same builders into its function registry at runtime.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // ordered log drains plan shuffle-free (see plans.OrderedLogScan)
    ext.injectPlannerStrategy(_ => graft.plans.OrderedLogScan)
    GraftExtensions.builders.foreach { case (name, builder) =>
      ext.injectFunction(
        (
          FunctionIdentifier(name),
          new ExpressionInfo(classOf[GraftExtensions].getName, name),
          builder
        )
      )
    }
    GraftExtensions.tableBuilders.foreach { case (name, builder) =>
      ext.injectTableFunction(
        (
          FunctionIdentifier(name),
          new ExpressionInfo(classOf[GraftExtensions].getName, name),
          builder
        )
      )
    }
  }
}

object GraftExtensions {

  /** The engine's native SQL functions: one source of truth shared by
    * the extensions injector and the runtime registry path. */
  private def arity(fn: String, exprs: Seq[Expression], n: Int): Unit =
    if (exprs.length != n)
      throw new IllegalArgumentException(
        s"$fn takes $n argument(s), got ${exprs.length}")

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot_f" -> ((exprs: Seq[Expression]) => {
      arity("vec_dot_f", exprs, 2)
      VecOps.FloatVecDot(exprs(0), exprs(1))
    }),
    "vec_norm_f" -> ((exprs: Seq[Expression]) => {
      arity("vec_norm_f", exprs, 1)
      VecOps.FloatVecNorm(exprs.head)
    }),
    "word_shingles" -> ((exprs: Seq[Expression]) => {
      arity("word_shingles", exprs, 2)
      exprs(1) match {
        case Literal(v, _) if v != null =>
          WordShingles(exprs.head, v.toString.toInt)
        case other =>
          throw new IllegalArgumentException(
            s"word_shingles width must be a non-null literal, got $other")
      }
    }),
    "minhash_signature" -> ((exprs: Seq[Expression]) => {
      arity("minhash_signature", exprs, 4)
      def intLit(e: Expression, what: String): Int = e match {
        case Literal(v, _) if v != null => v.toString.toInt
        case other =>
          throw new IllegalArgumentException(
            s"minhash_signature $what must be a non-null literal, got $other")
      }
      val portable = exprs(3) match {
        case Literal(v, _) if v != null => v.toString.toBoolean
        case other =>
          throw new IllegalArgumentException(
            s"minhash_signature portable must be a non-null literal, got $other")
      }
      graft.functions.MinHashSignature(
        exprs.head, intLit(exprs(1), "width"), intLit(exprs(2), "numHashes"),
        portable)
    }),
    "simhash_fingerprint" -> ((exprs: Seq[Expression]) => {
      arity("simhash_fingerprint", exprs, 2)
      exprs(1) match {
        case Literal(v, _) if v != null =>
          graft.functions.SimHashFingerprint(exprs.head, v.toString.toInt)
        case other =>
          throw new IllegalArgumentException(
            s"simhash_fingerprint bits must be a non-null literal, got $other")
      }
    }),
    "lsh_signature" -> ((exprs: Seq[Expression]) => {
      arity("lsh_signature", exprs, 3)
      def intLit(e: Expression, what: String): Int = e match {
        case Literal(v, _) if v != null => v.toString.toInt
        case other =>
          throw new IllegalArgumentException(
            s"lsh_signature $what must be a non-null literal, got $other")
      }
      graft.functions.LshSignatureExpr(exprs.head,
        intLit(exprs(1), "bits"), intLit(exprs(2), "dims"))
    }),
    "shingle_hashes" -> ((exprs: Seq[Expression]) => {
      arity("shingle_hashes", exprs, 2)
      exprs(1) match {
        case Literal(v, _) if v != null =>
          graft.functions.ShingleHashes(exprs.head, v.toString.toInt)
        case other =>
          throw new IllegalArgumentException(
            s"shingle_hashes width must be a non-null literal, got $other")
      }
    }),
    "distinct_line_keys" -> ((exprs: Seq[Expression]) => {
      arity("distinct_line_keys", exprs, 2)
      exprs(1) match {
        case Literal(v, _) if v != null =>
          graft.functions.DistinctLineKeys(exprs.head, v.toString.toBoolean)
        case other =>
          throw new IllegalArgumentException(
            s"distinct_line_keys portable must be a non-null literal, got $other")
      }
    }),
    "bitmap_select" -> ((exprs: Seq[Expression]) => {
      arity("bitmap_select", exprs, 2)
      graft.functions.BitmapExpr.BitmapSelect(exprs(0), exprs(1))
    }),
    "bitmap_card" -> ((exprs: Seq[Expression]) => {
      arity("bitmap_card", exprs, 1)
      graft.functions.BitmapExpr.BitmapCardinality(exprs.head)
    }),
    "bitmap_contains" -> ((exprs: Seq[Expression]) => {
      arity("bitmap_contains", exprs, 2)
      graft.functions.BitmapExpr.BitmapContains(exprs(0), exprs(1))
    }),
    "nfc_normalize" -> ((exprs: Seq[Expression]) => {
      arity("nfc_normalize", exprs, 1)
      graft.functions.NfcNormalize(exprs.head)
    }),
    "repetition_stats" -> ((exprs: Seq[Expression]) => {
      arity("repetition_stats", exprs, 1)
      graft.functions.RepetitionStats(exprs.head)
    })
  )

  private def stringArg(e: Expression, fn: String): String = e match {
    case Literal(v, _) if v != null => v.toString
    case other =>
      throw new IllegalArgumentException(
        s"$fn arguments must be string literals, got $other")
  }

  /** Table-valued functions: query engine logs straight from SQL text —
    * `SELECT * FROM graft_log('/path') WHERE seq >= 10` plans the same
    * manifest-scoped parquet scan (with the seq bound pushed to the
    * files) as the programmatic `log.query(Gte(10))`, and
    * `graft_sublog('/dir', 'addr')` the same rank-addressed sublog view
    * as `mlog.sublog(addr).toDF`. The builder resolves at ANALYSIS time
    * on the active session, so the returned plan is just the view's
    * logical plan — Catalyst optimizes through it like any subquery. */
  val tableBuilders
      : Seq[(String, Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)] =
    Seq(
      "graft_log" -> ((exprs: Seq[Expression]) => {
        val dir = stringArg(exprs.head, "graft_log")
        graft.storage.ParquetLog
          .open(SparkSession.active, dir)
          .toDF
          .queryExecution
          .logical
      }),
      "graft_sublog" -> ((exprs: Seq[Expression]) => {
        val dir = stringArg(exprs(0), "graft_sublog")
        val addr = stringArg(exprs(1), "graft_sublog")
        graft.multilog.MultiLog
          .open(SparkSession.active, dir)
          .sublog(addr)
          .toDF
          .queryExecution
          .logical
      })
    )

  /** Install the same functions into an already-created session. */
  def registerAll(spark: SparkSession): Unit = {
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
    tableBuilders.foreach { case (name, builder) =>
      spark.sessionState.tableFunctionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}
