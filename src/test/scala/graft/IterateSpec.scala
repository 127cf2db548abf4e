package graft

import org.apache.spark.sql.functions._
import graft.functions.Iterate

class IterateSpec extends SparkSpec {

  test("fixpoint converges to the analytic limit per row") {
    import TestSpark.spark.implicits._
    val sqrtF = Iterate.fixpoint(
      p => Array((p(0) + p(1) / p(0)) / 2.0, p(1)), tol = 1e-13)
    val out = (1 to 50).toDF("x")
      .select(col("x"), element_at(
        sqrtF(array(lit(1.0), col("x").cast("double"))), 1).as("r"))
      .collect()
    out.foreach { r =>
      val x = r.getInt(0); val got = r.getDouble(1)
      assert(math.abs(got - math.sqrt(x)) < 1e-9, s"sqrt($x)=$got")
    }
  }

  test("NaN deltas terminate instead of spinning (reference exit contract)") {
    val nanF = Iterate.fixpoint(_ => Array(Double.NaN), maxIter = 1000000000)
    import TestSpark.spark.implicits._
    val out = Seq(Seq(1.0)).toDF("v").select(nanF(col("v")).as("r"))
      .collect().head.getSeq[Double](0)
    assert(out.head.isNaN) // returned, not hung
  }

  test("maxIter bounds divergent iterations") {
    val divergeF = Iterate.fixpoint(p => Array(p(0) * 2.0), maxIter = 10)
    import TestSpark.spark.implicits._
    val out = Seq(Seq(1.0)).toDF("v").select(divergeF(col("v")).as("r"))
      .collect().head.getSeq[Double](0)
    assert(out.head == 1024.0) // exactly 10 doublings
  }
}
