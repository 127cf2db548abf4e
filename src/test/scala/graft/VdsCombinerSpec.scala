package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.methods.{VariantDataset, VdsCombiner}

class VdsCombinerSpec extends SparkSpec {

  private val es = StructType(Seq(StructField("GT", IntegerType),
    StructField("DP", IntegerType)))
  private val refEs = StructType(Seq(StructField("END", IntegerType),
    StructField("DP", IntegerType)))

  private def mtOf(sample: String, rows: Seq[Row],
      entrySchema: StructType): MatrixTable =
    MatrixTable(
      spark.createDataFrame(spark.sparkContext.parallelize(rows),
        StructType(Seq(
          StructField("contig", StringType),
          StructField("position", IntegerType),
          StructField("entries", ArrayType(entrySchema))))),
      Seq("contig", "position"),
      IndexedSeq(Row(sample)),
      StructType(Seq(StructField("s", StringType))), Seq("s"))

  /** Single-sample gVCF-shaped VDS: one variant + one covering block. */
  private def gvcf(sample: String, varPos: Int, gt: Int,
      blockStart: Int, blockEnd: Int, dp: Int): VariantDataset =
    VariantDataset(
      referenceData = mtOf(sample,
        Seq(Row("chr1", blockStart, Seq(Row(blockEnd, dp)))), refEs),
      variantData = mtOf(sample,
        Seq(Row("chr1", varPos, Seq(Row(gt << 16 | gt << 1, 30)))), es))

  test("combine merges 3 single-sample gVCFs; densify fills from blocks") {
    // A: het at 100, block 1..1000 ; B: het at 200, block 1..1000 ;
    // C: hom-var at 100, block 150..1000 (does NOT cover 100)
    val a = gvcf("A", 100, 1, 1, 1000, 11)
    val b = gvcf("B", 200, 1, 1, 1000, 12)
    val c = gvcf("C", 100, 1, 150, 1000, 13)
    val merged = VdsCombiner.combine(Seq(a, b, c))
    assert(merged.variantData.nCols == 3)
    assert(merged.variantData.rows.count() == 2) // positions 100, 200
    assert(merged.referenceData.rows.count() == 2) // starts 1, 150
    val dense = merged.toDenseMt()
    val cells = dense.entriesTable.df
      .select(col("position"), col("s"), col("GT")).collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getInt(2)).toMap
    import graft.functions.Calls
    // A called het at 100; B filled hom-ref at 100 (block covers);
    // C's block starts at 150 so (100, C) has its own variant call
    assert(cells((100, "B")) == 0)
    assert(cells((200, "A")) == 0)
    assert(cells((200, "C")) == 0) // block 150..1000 covers 200
    assert(cells.contains((100, "A")) && cells.contains((100, "C")))
    assert(cells.size == 6) // full 2x3 grid densified
  }

  test("hierarchical combine equals flat combine") {
    val vdss = (1 to 5).map(i =>
      gvcf(s"S$i", 100 * i, 1, 1, 1000, i))
    val flat = VdsCombiner.combine(vdss)
    val hier = VdsCombiner.combineHierarchical(vdss, branchFactor = 2,
      persistRounds = false)
    assert(hier.variantData.nCols == 5)
    def denseSet(v: VariantDataset) =
      v.toDenseMt().entriesTable.df
        .select(col("position"), col("s"), col("GT"), col("DP"))
        .collect().map(_.toSeq).toSet
    assert(denseSet(hier) == denseSet(flat))
  }

  test("row fields survive the merge from the first carrying input") {
    val withRf = (s: String, pos: Int, ref: String) => {
      val mt = mtOf(s, Seq(Row("chr1", pos, Seq(Row(2, 9)))), es)
      mt.copy(rows = mt.rows.withColumn("ref", lit(ref)))
    }
    val m = VdsCombiner.combineMts(
      Seq(withRf("A", 100, "G"), withRf("B", 100, "G"),
        withRf("C", 300, "T")))
    val refs = m.rows.select(col("position"), col("ref")).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(refs == Map(100 -> "G", 300 -> "T"))
  }
}
