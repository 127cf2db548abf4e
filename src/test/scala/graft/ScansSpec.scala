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
      .orderBy("i").collect().map(_.getAs[Long]("rc"))
    assert(got.toSeq === (1L to 50L))
  }

  test("runningMin/Max carry across partition boundaries") {
    val df = spark.range(0, 200, 1, 5).toDF("i")
      .withColumn("v", pmod(col("i") * 37 + 11, lit(100)).cast("int"))
    val rows = Scans.runningMax(df, Seq("i"), col("v"), "rm")
      .orderBy("i").collect()
      .map(r => (r.getAs[Int]("v"), r.getAs[Int]("rm")))
    var mx = Int.MinValue
    rows.foreach { case (v, rm) =>
      mx = math.max(mx, v)
      assert(rm === mx)
    }
  }

  test("prevNonNull returns last non-null strictly before current row") {
    val df = spark.range(0, 60, 1, 4).toDF("i")
      .withColumn("v", when(col("i") % 3 === 0, col("i")))
    val rows = Scans.prevNonNull(df, Seq("i"), col("v"), "pnn")
      .orderBy("i").collect()
      .map(r => (r.getAs[Long]("i"),
        if (r.isNullAt(r.fieldIndex("pnn"))) None
        else Some(r.getAs[Long]("pnn"))))
    rows.foreach { case (i, pnn) =>
      val expected = if (i == 0) None else Some((i - 1) / 3 * 3)
      assert(pnn === expected, s"at i=$i")
    }
  }

  test("densify fills nulls with last non-null, keeps present values") {
    val df = spark.range(0, 40, 1, 3).toDF("i")
      .withColumn("v", when(col("i") % 5 === 0, col("i") * 10))
    val rows = Scans.densify(df, Seq("i"), "v")
      .orderBy("i").collect()
      .map(r => (r.getAs[Long]("i"), r.getAs[Long]("v")))
    rows.foreach { case (i, v) =>
      assert(v === i / 5 * 50, s"at i=$i")
    }
  }

  test("two-phase scan plan reuses one range exchange (no persist)") {
    val df = spark.range(0, 100, 1, 4).toDF("i")
      .withColumn("v", col("i").cast("double"))
    val scanned = Scans.runningSum(df, Seq("i"), col("v"), "rs")
    scanned.collect() // AQE performs exchange/stage reuse at runtime
      // (collect drives THIS df's queryExecution; count() would plan anew)
    val plan = scanned.queryExecution.executedPlan.toString
    // the sorted subtree shared by the main pass and the partials pass must
    // collapse into a single shuffle (ReusedExchange / reused query stage)
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage")
      || plan.contains("ShuffleQueryStage 0") &&
         !plan.contains("ShuffleQueryStage 3"), plan.take(3000))
  }
}
