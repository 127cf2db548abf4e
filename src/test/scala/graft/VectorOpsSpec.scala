package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.VectorOps
import graft.pipeline.Similarity

/** The codegen'd vector kernels must be bit-identical to the
  * `aggregate(zip_with(...))` HOF formulation they replaced (same
  * left-to-right double fold, same null poisoning), on both the codegen
  * and interpreted (`nullSafeEval`) paths. */
class VectorOpsSpec extends SparkSpec {

  test("dot kernel matches HOF formulation bit-for-bit on float arrays") {
    val s = spark; import s.implicits._
    val rng = new scala.util.Random(7)
    val rows = Seq.fill(200)(
      (Seq.fill(16)(rng.nextFloat()), Seq.fill(16)(rng.nextFloat())))
    val df = rows.toDF("a", "b")
    val got = df.select(
      VectorOps.dot(col("a"), col("b")).as("k"),
      Similarity.dotHof(col("a"), col("b")).as("h"))
      .collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("dot kernel null semantics: null array, length mismatch, null elem") {
    val schema = StructType(Seq(
      StructField("a", ArrayType(DoubleType)),
      StructField("b", ArrayType(DoubleType))))
    val rows = Seq(
      Row(Seq(1.0, 2.0), Seq(3.0, 4.0)), // 11
      Row(null, Seq(3.0, 4.0)), // null input
      Row(Seq(1.0), Seq(3.0, 4.0)), // length mismatch
      Row(Seq(1.0, null), Seq(3.0, 4.0))) // null element
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    val got = df.select(VectorOps.dot(col("a"), col("b"))).collect()
      .map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    assert(got.toSeq === Seq(11.0, null, null, null))
    // HOF parity on the same frame
    val hof = df.select(Similarity.dotHof(col("a"), col("b"))).collect()
      .map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    assert(got.toSeq === hof.toSeq)
  }

  test("squaredDistance matches manual fold, mixed float/double") {
    val s = spark; import s.implicits._
    val df = Seq((Seq(1.0f, 2.5f, -3.0f), Seq(0.5, 2.5, 1.0)))
      .toDF("a", "b")
    val got = df.select(
      VectorOps.squaredDistance(col("a"), col("b"))).head().getDouble(0)
    val want = math.pow(1.0 - 0.5, 2) + 0.0 + math.pow(-3.0 - 1.0, 2)
    assert(math.abs(got - want) < 1e-12)
  }

  test("kernel runs inside whole-stage codegen (no fallback)") {
    val df = spark.range(8).select(
      array(col("id").cast("double"), lit(2.0)).as("a"),
      array(lit(3.0), lit(4.0)).as("b"))
      .select(VectorOps.dot(col("a"), col("b")).as("d"))
    val codegenSpans = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenSpans.nonEmpty)
    // janino failure would silently fall back to interpreted eval for the
    // stage; forbid fallback so the generated code must actually compile
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try assert(df.collect().map(_.getDouble(0)).toSeq ===
      (0 until 8).map(i => i * 3.0 + 8.0))
    finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }
}
