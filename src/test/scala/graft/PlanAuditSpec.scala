package graft

import org.apache.spark.sql.functions._

import graft.functions.{Liftover, ReferenceGenome}
import graft.methods.{Genetics, Ld}
import graft.sources.Vcf

/** 100×-scale plan audits: these assert the SHAPE of the physical plan
  * for the operators whose naive formulations explode at cluster scale —
  * the properties the correctness gate cannot see. */
class PlanAuditSpec extends SparkSpec {

  private def fixtureMt(): MatrixTable = Vcf.read(spark,
    "/root/repo/src/test/resources/oracle_sample.vcf")

  test("ldMatrix joins on window bins — no per-contig cross product") {
    val plan = Ld.ldMatrix(fixtureMt(), window = 1500)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    // the equi-join key must include the position bin, so the per-group
    // fan-out is bounded by variants-per-window, not variants-per-contig
    assert(plan.contains("__bin"), plan.take(2000))
  }

  test("mendel/tdt trio assembly scans the entries source once") {
    implicit val rg: ReferenceGenome = ReferenceGenome.GRCh38
    val plan = Genetics.mendelErrors(fixtureMt(), Seq(
      ("S1", "S2", "S3", true), ("S4", "S2", "S3", false)))
      .df.queryExecution.executedPlan.toString
    // one text scan of the VCF (the 3-scans-per-trio shape had 6 here)
    val scans = "Scan text".r.findAllIn(plan).length
    assert(scans == 1, s"$scans source scans\n${plan.take(2000)}")
    // the trio role map arrives broadcast
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("liftover is a broadcast join on the chain blocks") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pl")
    val chain = dir.resolve("c.chain")
    java.nio.file.Files.writeString(chain,
      "chain 1 chr1 1000 + 0 500 chrA 3000 + 1000 1500 1\n500\n")
    val df = spark.range(100).toDF("i")
      .select(lit("chr1").as("contig"), (col("i") + 1).cast("int")
        .as("position"))
    val plan = Liftover.liftover(df,
      Liftover.readChain(spark, chain.toString),
      col("contig"), col("position"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }

  test("lsh multi-probe raises ANN recall over single-probe") {
    import graft.pipeline.Similarity
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = e.filter(col("vec_id") === 0L).head()
      .getAs[scala.collection.Seq[Float]]("embedding").toSeq
    val data = e.filter(col("vec_id") =!= 0L)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.getLong(0)).toSet
    val truth = ids(Similarity.bruteForceTopK(data, "vec_id",
      "embedding", q, 10))
    val one = ids(Similarity.lshTopK(data, "vec_id", "embedding", q,
      10, nPlanes = 4, probes = 1))
    val multi = ids(Similarity.lshTopK(data, "vec_id", "embedding", q,
      10, nPlanes = 4, probes = 5))
    val rOne = (one & truth).size / 10.0
    val rMulti = (multi & truth).size / 10.0
    assert(rMulti >= rOne, s"multi-probe recall $rMulti < $rOne")
    assert(rMulti >= 0.5, s"multi-probe recall too low: $rMulti")
  }
}
