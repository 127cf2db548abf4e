package graft

import org.apache.spark.sql.functions._
import graft.operators.Scans

class ScansSpec extends SparkSpec {

  test("runningSum matches local prefix sums across partitions") {
    val n = 1000
    val df = spark.range(0, n, 1, 7).toDF("i")
      .withColumn("v", (col("i") % 10).cast("double"))
      // scramble partitioning so the op must re-sort
      .repartition(5, col("v"))
    val got = Scans.runningSum(df, Seq("i"), col("v"), "rs")
      .orderBy("i").collect()
      .map(r => (r.getAs[Long]("i"), r.getAs[Double]("rs")))
    var acc = 0.0
    got.foreach { case (i, rs) =>
      acc += (i % 10).toDouble
      assert(rs === acc, s"at i=$i")
    }
  }

  test("exclusive scan excludes current row (reference scan semantics)") {
    val df = spark.range(0, 100, 1, 4).toDF("i")
      .withColumn("v", lit(1.0))
    val got = Scans.runningSum(df, Seq("i"), col("v"), "rs",
      inclusive = false)
      .orderBy("i").collect()
      .map(r => (r.getAs[Long]("i"), r.getAs[Double]("rs")))
    got.foreach { case (i, rs) => assert(rs === i.toDouble) }
  }

  test("runningCount is 1-based inclusive") {
    val df = spark.range(0, 50, 1, 3).toDF("i")
    val got = Scans.runningCount(df, Seq("i"), "rc")
      .orderBy("i").collect().map(_.getAs[Double]("rc"))
    assert(got.toSeq === (1 to 50).map(_.toDouble))
  }
}
