package graft

import org.apache.spark.sql.functions._
import graft.functions.{Calls, StatTests}
import graft.methods.{Qc, SplitMulti}
import graft.sources.Vcf

class MethodsSpec extends SparkSpec {

  private val vcfText =
    """##fileformat=VCFv4.2
      |##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">
      |##FORMAT=<ID=DP,Number=1,Type=Integer,Description="Depth">
      |#CHROM	POS	ID	REF	ALT	QUAL	FILTER	INFO	FORMAT	SA	SB	SC
      |chr1	100	.	A	G	.	PASS	.	GT:DP	0/0:10	0/1:20	1/1:30
      |chr1	200	.	C	A,T	.	PASS	.	GT:DP	1/2:5	0/1:5	./.:7
      |chr1	300	.	AT	A	.	PASS	.	GT	0/1	0/0	.
      |chr1	400	.	G	GTT	.	PASS	.	GT:DP	0|1:9	./.:1	1/1:2
      |""".stripMargin

  private def fixtureMt(): MatrixTable = {
    val dir = java.nio.file.Files.createTempDirectory("graft_qc")
    val f = dir.resolve("qc.vcf")
    java.nio.file.Files.writeString(f, vcfText)
    Vcf.read(spark, f.toString)
  }

  test("hweExact matches hail's documented golden values") {
    val (hf1, p1) = StatTests.hweExactPair(250, 500, 250, oneSided = false)
    assert(math.abs(hf1 - 0.5002501250625313) < 1e-12)
    assert(math.abs(p1 - 0.9747844394217698) < 1e-9)
    val (hf2, p2) = StatTests.hweExactPair(37, 200, 85, oneSided = false)
    assert(math.abs(hf2 - 0.48964964307448583) < 1e-12)
    assert(math.abs(p2 - 1.1337210383168987e-06) < 1e-12)
  }

  test("sampleQc computes hail's per-sample metrics") {
    val qc = Qc.sampleQc(fixtureMt()).df.collect()
      .map(r => r.getAs[String]("s") -> r).toMap
    val sa = qc("SA")
    assert(sa.getAs[Long]("n_called") === 4L)
    assert(sa.getAs[Long]("n_not_called") === 0L)
    assert(sa.getAs[Long]("n_filtered") === 0L)
    assert(sa.getAs[Double]("call_rate") === 1.0)
    assert(sa.getAs[Long]("n_hom_ref") === 1L)
    assert(sa.getAs[Long]("n_het") === 3L)
    assert(sa.getAs[Long]("n_hom_var") === 0L)
    assert(sa.getAs[Long]("n_non_ref") === 3L)
    assert(sa.getAs[Long]("n_singleton") === 2L)
    assert(sa.getAs[Long]("n_transition") === 1L)
    assert(sa.getAs[Long]("n_transversion") === 1L)
    assert(sa.getAs[Long]("n_snp") === 2L)
    assert(sa.getAs[Long]("n_insertion") === 1L)
    assert(sa.getAs[Long]("n_deletion") === 1L)
    assert(sa.getAs[Long]("n_star") === 0L)
    assert(sa.getAs[Double]("r_ti_tv") === 1.0)
    assert(sa.isNullAt(sa.fieldIndex("r_het_hom_var"))) // 3/0 -> NA
    assert(sa.getAs[Double]("dp_mean") === 8.0) // (10+5+9)/3
    assert(math.abs(sa.getAs[Double]("dp_stdev") - math.sqrt(14.0 / 3)) < 1e-12)
    assert(sa.getAs[Int]("dp_min") === 5 && sa.getAs[Int]("dp_max") === 10)
    // SC has one fully-missing entry (filtered) and one missing GT
    val sc = qc("SC")
    assert(sc.getAs[Long]("n_filtered") === 1L)
    assert(sc.getAs[Long]("n_not_called") === 1L)
    assert(sc.getAs[Long]("n_called") === 2L)
    assert(sc.getAs[Double]("call_rate") === 0.5)
  }

  test("variantQc computes per-variant metrics incl exact HWE") {
    val qc = Qc.variantQc(fixtureMt()).df.collect()
      .map(r => r.getAs[Int]("position") -> r).toMap
    val v = qc(100)
    assert(v.getAs[Seq[Long]]("AC") === Seq(3L, 3L))
    assert(v.getAs[Long]("AN") === 6L)
    assert(v.getAs[Seq[Double]]("AF") === Seq(0.5, 0.5))
    assert(v.getAs[Seq[Long]]("homozygote_count") === Seq(1L, 1L))
    assert(v.getAs[Long]("n_called") === 3L)
    assert(v.getAs[Long]("n_het") === 1L)
    assert(v.getAs[Long]("n_non_ref") === 2L)
    assert(v.getAs[Double]("call_rate") === 1.0)
    val (hf, p) = StatTests.hweExactPair(1, 1, 1, oneSided = false)
    assert(math.abs(v.getAs[Double]("het_freq_hwe") - hf) < 1e-12)
    assert(math.abs(v.getAs[Double]("p_value_hwe") - p) < 1e-12)
    // multiallelic -> HWE missing
    val m = qc(200)
    assert(m.isNullAt(m.fieldIndex("het_freq_hwe")))
    assert(m.getAs[Seq[Long]]("AC") === Seq(1L, 2L, 1L))
    assert(m.getAs[Long]("n_filtered") === 0L)
    assert(m.getAs[Long]("n_not_called") === 1L)
    // row 300: SC's '.' entry is filtered
    assert(qc(300).getAs[Long]("n_filtered") === 1L)
  }

  test("splitMulti splits rows, downcodes GT, min-reps alleles") {
    val split = SplitMulti(fixtureMt())
    val rows = split.rows.orderBy("position", "a_index").collect()
    assert(rows.length === 5) // 4 variants, one with 2 alts
    val v200 = rows.filter(_.getAs[Int]("position") == 200)
    assert(v200.length === 2)
    assert(v200.forall(_.getAs[Boolean]("was_split")))
    assert(v200.map(_.getAs[Int]("a_index")).toSeq === Seq(1, 2))
    assert(v200(0).getAs[Seq[String]]("alt") === Seq("A"))
    assert(v200(1).getAs[Seq[String]]("alt") === Seq("T"))
    // SA had 1/2: downcode -> (1,0) for a_index=1, (0,1) for a_index=2
    val ents = split.entriesTable.df
      .filter(col("position") === 200 && col("s") === "SA")
      .orderBy("a_index")
      .select(Calls.allele1(col("GT")), Calls.allele2(col("GT")))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(ents.toSeq === Seq((1, 0), (0, 1)))
    // min_rep: AT->A deletion stays; insertion G->GTT stays; biallelic rows
    // unsplit
    val v300 = rows.filter(_.getAs[Int]("position") == 300).head
    assert(!v300.getAs[Boolean]("was_split"))
    assert(v300.getAs[String]("ref") === "AT")
    // min_rep trims shared prefix/suffix and shifts position
    val mr = spark.range(1).select(
      graft.functions.Alleles.minRep(lit(500), lit("CAG"), lit("CTG")).as("m"))
      .head().getStruct(0)
    assert(mr.getInt(0) === 501 && mr.getString(1) === "A" &&
      mr.getString(2) === "T")
  }
}
