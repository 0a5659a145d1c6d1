package graft

import org.apache.spark.sql.functions._

import graft.functions.VecOps
import graft.similarity.Ann

/** The native codegen'd vector expressions must be value-identical to
  * the built-in aggregate/zip_with formulation (same sequential
  * accumulation order), including nulls and empty arrays.
  */
class VecOpsSpec extends SparkSpec {
  import spark.implicits._

  test("FloatVecDot / FloatVecNorm match the built-in formulation") {
    VecOps.register(spark)
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 200).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }
    val df = vecs.toDF("id", "v").cache()
    val a = df.select(col("id").as("ia"), col("v").as("va"))
    val b = df.select(col("id").as("ib"), col("v").as("vb"))
    val pairs = a.crossJoin(b).where(col("ia") < col("ib")).limit(5000)
    val diff = pairs
      .select(
        (call_function("vec_dot_f", col("va"), col("vb")) -
          Ann.dot(col("va"), col("vb"))).as("dd"),
        (call_function("vec_norm_f", col("va")) - Ann.norm(col("va"))).as("dn")
      )
      .agg(max(abs(col("dd"))), max(abs(col("dn"))))
      .collect()(0)
    assert(diff.getDouble(0) == 0.0, "dot must be bit-identical")
    assert(diff.getDouble(1) == 0.0, "norm must be bit-identical")
  }

  test("null and empty inputs") {
    VecOps.register(spark)
    val df = Seq(
      (1L, Some(Array(1f, 2f)), Some(Array(3f, 4f))),
      (2L, None, Some(Array(3f, 4f))),
      (3L, Some(Array.empty[Float]), Some(Array.empty[Float]))
    ).toDF("id", "a", "b")
    val got = df
      .select(
        col("id"),
        call_function("vec_dot_f", col("a"), col("b")).as("d"),
        call_function("vec_norm_f", col("a")).as("n")
      )
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got(1L).contains(11.0))
    assert(got(2L).isEmpty) // null propagates
    assert(got(3L).contains(0.0)) // empty → 0 dot
  }
}
