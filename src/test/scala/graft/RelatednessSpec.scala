package graft

import org.apache.spark.sql.functions._
import graft.functions.{Calls, ReferenceGenome}
import graft.methods.{DeNovo, PcRelate}
import graft.sources.Vcf

class RelatednessSpec extends SparkSpec {

  private val vcfText =
    """##fileformat=VCFv4.2
      |##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">
      |##FORMAT=<ID=DP,Number=1,Type=Integer,Description="Depth">
      |#CHROM	POS	ID	REF	ALT	QUAL	FILTER	INFO	FORMAT	S1	S2	S3	S4
      |chr1	100	.	A	G	.	PASS	.	GT:DP	0/0:30	0/1:25	1/1:28	0/0:31
      |chr1	200	.	C	T	.	PASS	.	GT:DP	0/1:22	0/0:27	0/1:24	1/1:30
      |chr1	300	.	G	A	.	PASS	.	GT:DP	0/0:26	0/1:21	0/0:29	0/1:23
      |chr1	400	.	T	C	.	PASS	.	GT:DP	0/1:33	1/1:30	0/0:26	0/1:28
      |chr1	500	.	A	C	.	PASS	.	GT:DP	0/1:24	0/0:23	0/0:31	0/0:27
      |chr2	100	.	G	T	.	PASS	.	GT:DP	1/1:28	0/1:30	0/1:22	0/0:26
      |chr2	200	.	C	G	.	PASS	.	GT:DP	0/0:25	0/1:26	1/1:27	0/1:29
      |chr2	300	.	A	T	.	PASS	.	GT:DP	0/1:30	0/0:28	0/1:25	1/1:24
      |""".stripMargin

  private def fixtureMt(): MatrixTable = {
    val dir = java.nio.file.Files.createTempDirectory("graft_rel")
    val f = dir.resolve("rel.vcf")
    java.nio.file.Files.writeString(f, vcfText)
    Vcf.read(spark, f.toString)
  }

  test("pcRelate intercept-only: ibd components sum to 1, pairs complete") {
    val mt = fixtureMt()
    val rows = PcRelate.pcRelate(mt,
      IndexedSeq.fill(mt.nCols)(Array.empty[Double]),
      minIndividualMaf = 0.01).collect()
    assert(rows.length == 6) // C(4,2)
    rows.foreach { r =>
      val s = r.getAs[Double]("ibd0") + r.getAs[Double]("ibd1") +
        r.getAs[Double]("ibd2")
      assert(math.abs(s - 1.0) < 1e-9, s"ibd sum $s")
    }
  }

  test("pcRelate self kinship is ~1/2 on Hardy-Weinberg-ish data") {
    val mt = fixtureMt()
    val rows = PcRelate.pcRelate(mt,
      IndexedSeq.fill(mt.nCols)(Array.empty[Double]),
      minIndividualMaf = 0.01, includeSelfKinship = true).collect()
      .filter(r => r.getAs[Int]("i") == r.getAs[Int]("j"))
    assert(rows.length == 4)
    rows.foreach { r =>
      val kin = r.getAs[Double]("kin")
      assert(kin > 0.2 && kin < 0.8, s"self kin $kin")
    }
  }

  test("pcRelate distributed BlockMatrix path equals the local Gramian") {
    val mt = fixtureMt()
    val scores = IndexedSeq(
      Array(-1.5, 0.5), Array(-0.5, -0.5), Array(0.5, 0.5),
      Array(1.5, -0.5))
    def run(thresh: Int) = PcRelate.pcRelate(mt, scores,
      minIndividualMaf = 0.01, includeSelfKinship = true,
      distributeOver = thresh).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    val local = run(1000) // n=4 <= 1000: local Gramian
    val dist = run(2)     // n=4 > 2: BlockMatrix product
    assert(local.keySet == dist.keySet && local.nonEmpty)
    local.foreach { case (k, (a1, b1, c1, d1)) =>
      val (a2, b2, c2, d2) = dist(k)
      def eq(x: Double, y: Double) =
        (x.isNaN && y.isNaN) || math.abs(x - y) < 1e-9
      assert(eq(a1, a2) && eq(b1, b2) && eq(c1, c2) && eq(d1, d2),
        s"$k: local ($a1,$b1,$c1,$d1) vs dist ($a2,$b2,$c2,$d2)")
    }
  }

  test("pcRelate with PCA scores runs end to end") {
    val mt = fixtureMt()
    val rows = PcRelate.pcRelate(mt, k = 2, minIndividualMaf = 0.01)
      .collect()
    assert(rows.length == 6)
  }

  test("deNovo calls a synthetic obvious de novo with high posterior") {
    implicit val rg: ReferenceGenome = ReferenceGenome.GRCh38
    val mt0 = fixtureMt()
    // strong uniform PL model: correct class PL 0, others 40
    val mt = mt0.mapEntries((e, _) => {
      val d = Calls.nNonRefAlleles(e("GT"))
      val gi = Calls.unphasedDiploidGtIndex(e("GT"))
      val adAlt = floor(e("DP").cast("double") * d / 2.0).cast("int")
      struct(
        e("GT").as("GT"),
        array(e("DP") - adAlt, adAlt).as("AD"),
        e("DP").as("DP"),
        lit(40).as("GQ"),
        transform(sequence(lit(0), lit(2)), j =>
          when(j === gi, 0).otherwise(40)).as("PL"))
    })
    // S1 is het at chr1:500 where S2 (dad) and S3 (mom) are hom-ref and
    // no one else carries the alt -> singleton de novo candidate
    val out = DeNovo.deNovo(mt, Seq(("S1", "S2", "S3", true))).df.collect()
    val hit = out.find(r => r.getAs[String]("contig") == "chr1" &&
      r.getAs[Int]("position") == 500)
    assert(hit.isDefined, s"chr1:500 not called: ${out.mkString(";")}")
    val p = hit.get.getAs[Double]("p_de_novo")
    assert(p > 0.9, s"posterior $p")
    assert(hit.get.getAs[String]("confidence") == "HIGH")
    // closed form: eps = 1e-4; prior = max((1-1)/16, 1/3e7*100)
    val eps = 1e-4
    val ppm = 1.0 / (1 + 2 * eps)
    val prior = 100.0 / 30000000.0
    val pHet = 1 - math.pow(1 - prior, 4)
    val pDn = ppm * ppm * ppm / 30000000.0
    val pMiss = 2 * (eps / (1 + 2 * eps)) * ppm * ppm * pHet
    assert(math.abs(p - pDn / (pDn + pMiss)) < 1e-9)
  }

  test("completeTrios keeps only trios with both parents present") {
    import graft.sources.Plink.FamRow
    val fam = Seq(
      FamRow("f1", "kid1", "dad1", "mom1", Some(true), None),
      FamRow("f1", "dad1", "0", "0", Some(false), None),
      FamRow("f1", "mom1", "0", "0", Some(true), None),
      FamRow("f2", "kid2", "dadX", "mom2", None, None), // dadX absent
      FamRow("f2", "mom2", "0", "0", Some(true), None))
    assert(graft.methods.Trios.completeTrios(fam) ==
      Seq(("kid1", "dad1", "mom1", true)))
  }

  test("mendel hemi codes fire on X/Y non-PAR for male probands") {
    implicit val rg: ReferenceGenome = ReferenceGenome.GRCh38
    // chrX:5e6 (non-PAR), chrY:5e6 (non-PAR): male kid
    val vcf =
      """##fileformat=VCFv4.2
        |##FORMAT=<ID=GT,Number=1,Type=String,Description="G">
        |#CHROM	POS	ID	REF	ALT	QUAL	FILTER	INFO	FORMAT	K	D	M
        |chrX	5000000	.	A	G	.	PASS	.	GT	0/0	0/0	1/1
        |chrY	5000000	.	C	T	.	PASS	.	GT	1/1	0/0	0/0
        |chr1	100	.	G	A	.	PASS	.	GT	1/1	0/0	0/0
        |""".stripMargin
    val dir = java.nio.file.Files.createTempDirectory("graft_hemi")
    val f = dir.resolve("hemi.vcf")
    java.nio.file.Files.writeString(f, vcf)
    val mt = Vcf.read(spark, f.toString)
    val male = methods.Genetics.mendelErrors(mt,
      Seq(("K", "D", "M", false))).df.collect()
      .map(r => r.getAs[String]("contig") -> r.getAs[Int]("mendel_code"))
      .toMap
    // X non-PAR male kid hom-ref with hom-var mother -> code 9
    assert(male("chrX") == 9)
    // Y non-PAR male kid with alt, hom-ref father -> code 12
    assert(male("chrY") == 12)
    // autosomal hom-var kid with two hom-ref parents -> code 5
    assert(male("chr1") == 5)
    // a female proband treats chrX as autosomal: hom-ref kid with
    // hom-var mom and hom-ref dad is code 7
    val female = methods.Genetics.mendelErrors(mt,
      Seq(("K", "D", "M", true))).df.collect()
      .map(r => r.getAs[String]("contig") -> r.getAs[Int]("mendel_code"))
      .toMap
    assert(female("chrX") == 7)
    // the reference's copy-state gate is `in_autosome_or_par | is_female`
    // — a female proband routes even chrY to the auto chain (code 5)
    assert(female("chrY") == 5)
  }

  test("mendel summary views attribute errors by the implicated table") {
    implicit val rg: ReferenceGenome = ReferenceGenome.GRCh38
    val vcf =
      """##fileformat=VCFv4.2
        |##FORMAT=<ID=GT,Number=1,Type=String,Description="G">
        |#CHROM	POS	ID	REF	ALT	QUAL	FILTER	INFO	FORMAT	K	D	M
        |chrX	5000000	.	A	G	.	PASS	.	GT	0/0	0/0	1/1
        |chrY	5000000	.	C	T	.	PASS	.	GT	1/1	0/0	0/0
        |chr1	100	.	G	A	.	PASS	.	GT	1/1	0/0	0/0
        |""".stripMargin
    val dir = java.nio.file.Files.createTempDirectory("graft_msum")
    val f = dir.resolve("m.vcf")
    java.nio.file.Files.writeString(f, vcf)
    val mt = Vcf.read(spark, f.toString)
    val trios = Seq(("K", "D", "M", false))
    // codes: chrX 9 (mom implicated), chrY 12 (dad), chr1 5 (kid only)
    val perVariant = methods.Genetics.mendelPerVariant(mt, trios).df
      .collect().map(r =>
        r.getAs[String]("contig") -> r.getAs[Long]("errors")).toMap
    assert(perVariant == Map("chrX" -> 1L, "chrY" -> 1L, "chr1" -> 1L))
    val perSample = methods.Genetics.mendelPerSample(mt, trios).df
      .collect().map(r => (r.getAs[String]("s"),
        r.getAs[Long]("errors"), r.getAs[Long]("snp_errors"))).toSet
    assert(perSample == Set(("K", 3L, 3L), ("D", 1L, 1L), ("M", 1L, 1L)))
    val perFamily = methods.Genetics.mendelPerFamily(mt, trios).df
      .collect()
    assert(perFamily.length == 1)
    val fam = perFamily.head
    assert(fam.getAs[String]("pat_id") == "D" &&
      fam.getAs[String]("mat_id") == "M" &&
      fam.getAs[Int]("children") == 1 &&
      fam.getAs[Long]("errors") == 3L &&
      fam.getAs[Long]("snp_errors") == 3L)
  }

  test("phaseByTransmission phases trios per the reference's rules") {
    implicit val rg: ReferenceGenome = ReferenceGenome.GRCh38
    val vcf =
      """##fileformat=VCFv4.2
        |##FORMAT=<ID=GT,Number=1,Type=String,Description="G">
        |#CHROM	POS	ID	REF	ALT	QUAL	FILTER	INFO	FORMAT	K	D	M
        |chr1	100	.	A	G	.	PASS	.	GT	0/1	0/0	1/1
        |chr1	200	.	A	G	.	PASS	.	GT	0/1	0/1	0/1
        |chr1	300	.	A	G	.	PASS	.	GT	1/1	0/0	0/1
        |chr1	400	.	A	G	.	PASS	.	GT	0/1	./.	1/1
        |chr1	500	.	A	G	.	PASS	.	GT	1/0	1/1	0/1
        |chrX	5000000	.	A	G	.	PASS	.	GT	1	0	0/1
        |chrX	5000100	.	A	G	.	PASS	.	GT	1	0/0	0/1
        |chrY	5000000	.	C	T	.	PASS	.	GT	1	1	0/0
        |chrY	5000100	.	C	T	.	PASS	.	GT	1	0	0/0
        |""".stripMargin
    val dir = java.nio.file.Files.createTempDirectory("graft_pbt")
    val f = dir.resolve("p.vcf")
    java.nio.file.Files.writeString(f, vcf)
    val mt = Vcf.read(spark, f.toString)
    val tm = methods.Trios.trioMatrix(mt, Seq(("K", "D", "M", false)))
    val out = methods.PhaseByTransmission.phaseTrioMatrix(tm)
      .entriesTable.df
      .select(col("position"), col("contig"),
        col("proband_entry")("PBT_GT").as("k"),
        col("father_entry")("PBT_GT").as("f"),
        col("mother_entry")("PBT_GT").as("m"))
      .collect()
      .map(r => (r.getString(1), r.getInt(0)) ->
        ((Option(r.get(2)), Option(r.get(3)), Option(r.get(4))))).toMap
    def dip(a1: Int, a2: Int) = Some((a2 << 16) | (a1 << 1) | 1)
    def hap(a: Int) = Some((0x7fff << 16) | (a << 1) | 1)
    // autosome het kid, hom parents: kid = father|mother = 0|1
    assert(out(("chr1", 100)) === ((dip(0, 1), dip(0, 0), dip(1, 1))))
    // triple-het: unphasable
    assert(out(("chr1", 200)) === ((None, None, None)))
    // mendel violation: unphasable
    assert(out(("chr1", 300)) === ((None, None, None)))
    // missing father: unphasable
    assert(out(("chr1", 400)) === ((None, None, None)))
    // het kid stored 1/0, dad hom-var, mom het: father transmits 1,
    // mother transmits 0 (untransmitted 1): kid 1|0
    assert(out(("chr1", 500)) === ((dip(1, 0), dip(1, 1), dip(0, 1))))
    // X non-PAR haploid kid: mother's first matching allele transmits
    assert(out(("chrX", 5000000)) ===
      ((hap(1), hap(0), dip(1, 0))))
    // X non-PAR diploid father: father slot missing, rest phased
    assert(out(("chrX", 5000100)) === ((hap(1), None, dip(1, 0))))
    // Y non-PAR: father==kid haploid -> phased, mother always missing
    assert(out(("chrY", 5000000)) === ((hap(1), hap(1), None)))
    // Y non-PAR transmission mismatch: unphasable
    assert(out(("chrY", 5000100)) === ((None, None, None)))
  }

  test("king distributed BlockMatrix path matches the local Gramian") {
    val mt = fixtureMt()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("s_i"), r.getAs[String]("s_j"))
    val local = methods.Genetics.king(mt).collect().map(r => key(r) -> r)
      .toMap
    // distributeOver = 1 forces the distributed MᵀM + per-pair map path
    val dist = methods.Genetics.king(mt, distributeOver = 1).collect()
      .map(r => key(r) -> r).toMap
    assert(local.keySet == dist.keySet && local.nonEmpty)
    local.foreach { case (k, l) =>
      val d = dist(k)
      (2 to 6).foreach(i => assert(l.getLong(i) == d.getLong(i),
        s"$k field $i: ${l.getLong(i)} vs ${d.getLong(i)}"))
      assert(math.abs(l.getAs[Double]("phi") - d.getAs[Double]("phi"))
        < 1e-12, s"$k phi")
    }
  }

  test("grm/rrm distributed BlockMatrix path matches the local Gramian") {
    val mt = fixtureMt()
    def toMap(df: org.apache.spark.sql.DataFrame, v: String) =
      df.collect().map(r =>
        (r.getInt(0), r.getInt(1)) -> r.getAs[Double](v)).toMap
    val grmLocal = toMap(methods.Pca.grm(mt), "grm")
    val grmDist = toMap(methods.Pca.grm(mt, distributeOver = 1), "grm")
    // the distributed path omits never-materialized all-zero blocks;
    // every pair it does emit must match, and all nonzero pairs appear
    assert(grmDist.nonEmpty)
    grmDist.foreach { case (k, d) =>
      assert(math.abs(grmLocal(k) - d) < 1e-12, s"grm $k") }
    grmLocal.filter(_._2 != 0.0).keySet.foreach(k =>
      assert(grmDist.contains(k), s"missing grm pair $k"))
    val rrmLocal = toMap(methods.Pca.rrm(mt), "rrm")
    val rrmDist = toMap(methods.Pca.rrm(mt, distributeOver = 1), "rrm")
    assert(rrmDist.nonEmpty)
    rrmDist.foreach { case (k, d) =>
      assert(math.abs(rrmLocal(k) - d) < 1e-12, s"rrm $k") }
  }

  test("identityByDescent distributed path matches the local Gramian") {
    val mt = fixtureMt()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("s_i"), r.getAs[String]("s_j"))
    val local = methods.Genetics.identityByDescent(mt).collect()
      .map(r => key(r) -> r).toMap
    val dist = methods.Genetics
      .identityByDescent(mt, distributeOver = 1).collect()
      .map(r => key(r) -> r).toMap
    assert(local.keySet == dist.keySet && local.nonEmpty)
    local.foreach { case (k, l) =>
      val d = dist(k)
      Seq("ibs0", "ibs1", "ibs2").foreach(f =>
        assert(l.getAs[Long](f) == d.getAs[Long](f), s"$k $f"))
      Seq("Z0", "Z1", "Z2", "PI_HAT").foreach(f =>
        assert(math.abs(l.getAs[Double](f) - d.getAs[Double](f)) < 1e-12,
          s"$k $f"))
    }
  }

  test("tdt hemiX copy state counts only het-mother transmissions") {
    implicit val rg: ReferenceGenome = ReferenceGenome.GRCh38
    val vcf =
      """##fileformat=VCFv4.2
        |##FORMAT=<ID=GT,Number=1,Type=String,Description="G">
        |#CHROM	POS	ID	REF	ALT	QUAL	FILTER	INFO	FORMAT	K	D	M
        |chrX	5000000	.	A	G	.	PASS	.	GT	1/1	0/0	0/1
        |chrY	5000000	.	C	T	.	PASS	.	GT	1/1	0/0	0/1
        |""".stripMargin
    val dir = java.nio.file.Files.createTempDirectory("graft_tdtx")
    val f = dir.resolve("tdtx.vcf")
    java.nio.file.Files.writeString(f, vcf)
    val mt = Vcf.read(spark, f.toString)
    // male proband: X non-PAR is HemiX -> (HomVar, HomRef, Het) = t 1 u 0
    val male = methods.Genetics.tdt(mt, Seq(("K", "D", "M"))).df.collect()
      .map(r => r.getAs[String]("contig") ->
        ((r.getAs[Long]("t"), r.getAs[Long]("u")))).toMap
    assert(male("chrX") == ((1L, 0L)))
    assert(!male.contains("chrY")) // Y is out of the reference's scope
    // female proband: X treated as Auto; (2,0,1) has no auto config ->
    // uninformative, row absent
    val female = methods.Genetics.tdt(mt, Seq(("K", "D", "M")),
      kidIsFemale = Map("K" -> true)).df.collect()
    assert(female.isEmpty)
  }
}
