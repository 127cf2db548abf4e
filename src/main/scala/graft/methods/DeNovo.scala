package graft.methods

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.{MatrixTable, Table}
import graft.functions.{Calls, ReferenceGenome}

/** de_novo (reference `python/hail/methods/family_methods.py:564`,
  * replicating K. Samocha's caller): per (variant, trio) posterior
  * probability that a proband het with hom-ref parents is a true de novo
  * mutation rather than a missed parental het, plus hard-filter
  * confidence tiers.
  *
  * Spark shape: rides on `Trios.trioMatrix` (a literal-index entry
  * projection — no shuffle), so the whole caller is ONE narrow codegen'd
  * pass over the rows; the per-trio posterior is a pure Column expression
  * over the trio entry struct (PL-normalized genotype probabilities via
  * `Calls.plToGp`). Requires entry fields GT, AD, DP, GQ, PL and
  * biallelic rows. */
object DeNovo {

  private val DeNovoPrior = 1.0 / 30000000
  private val MinPopPrior = 100.0 / 30000000

  /** `trios`: (proband, father, mother, probandIsFemale). `priorCol` is a
    * row-space population alt-frequency prior (may be null). Returns a
    * Table keyed (rowKey, id) with prior/is_female/p_de_novo/confidence.
    */
  def deNovo(mt: MatrixTable,
      trios: Seq[(String, String, String, Boolean)],
      priorCol: Column = lit(null).cast("double"),
      minGq: Int = 20, minP: Double = 0.05,
      maxParentAb: Double = 0.05, minChildAb: Double = 0.2,
      minDpRatio: Double = 0.1,
      ignoreInSampleAlleleFrequency: Boolean = false)
      (implicit rg: ReferenceGenome): Table = {
    // row-space site frequency: max(in-sample AF (less the observed
    // genotype), population prior, global minimum). One fused
    // codegen'd pass (doseStats) instead of two interpreted HOF folds.
    val doseSt = graft.functions.GenotypeFolds.doseStats(mt.entries)
    val nAlt = doseSt("ac").cast("long")
    val tot = doseSt("nc") * 2L
    val inSample = when(tot > 0,
      (nAlt.cast("double") - 1.0) / tot.cast("double"))
    val siteFreq =
      if (ignoreInSampleAlleleFrequency)
        greatest(coalesce(priorCol, lit(0.0)), lit(MinPopPrior))
      else
        greatest(coalesce(inSample, lit(0.0)),
          coalesce(priorCol, lit(0.0)), lit(MinPopPrior))
    // ignore mode treats each trio as the only one in the dataset: the
    // reference also pins __alt_alleles to 1 there (family_methods.py)
    val rows2 = mt.rows
      .withColumn("__alt_alleles",
        if (ignoreInSampleAlleleFrequency) lit(1L) else nAlt)
      .withColumn("__site_freq", siteFreq)
      .withColumn("__is_snp",
        graft.functions.Alleles.isSnp(col("ref"), element_at(col("alt"), 1)))
    val failure = lit(null)
      .cast("struct<p_de_novo:double,confidence:string>")
    // ONE fused kernel for the arithmetic stages (pp arrays, AD sums,
    // allele balances, depth ratio, posteriors): Column-level staging is
    // re-inlined by the optimizer's extract-value simplification into
    // every CASE-chain reference (optimized plan grew 12x; analysis +
    // codegen dominated). The kernel's output struct is opaque, so each
    // downstream reference is a cheap field extract; the three-valued
    // missing-gate logic stays in Column land below, unchanged.
    val ent0 = Trios.trioMatrix(mt.copy(rows = rows2), trios)
      .entriesTable.df
    val staged = ent0.withColumn("__st", graft.functions.DeNovoStats(
      col("proband_entry"), col("father_entry"), col("mother_entry"),
      col("__site_freq")))
    val call: Column = {
      val kid = col("proband_entry"); val dad = col("father_entry")
      val mom = col("mother_entry")
      val isFemale = col("is_female")
      val st = col("__st")
      val kidSum = st("kid_adsum"); val dadSum = st("dad_adsum")
      val momSum = st("mom_adsum")
      val kidAb = st("kid_ab")
      val ac = col("__alt_alleles")
      val isSnp = col("__is_snp")
      val dpRatio = st("dp_ratio")

      def conf(p: Column, lowCut: Double): Column =
        when(!isSnp,
          when(p > 0.99 && kidAb > 0.3 && ac === 1,
            struct(p.as("p_de_novo"), lit("HIGH").as("confidence")))
            .when(p > 0.5 && kidAb > 0.3 && ac <= 5,
              struct(p.as("p_de_novo"), lit("MEDIUM").as("confidence")))
            .when(kidAb > lowCut,
              struct(p.as("p_de_novo"), lit("LOW").as("confidence")))
            .otherwise(failure))
          .otherwise(
            when((p > 0.99 && kidAb > 0.3 && dpRatio > 0.2) ||
              (p > 0.99 && kidAb > 0.3 && ac === 1) ||
              (p > 0.5 && kidAb > 0.3 && ac < 10 && kid("DP") > 10),
              struct(p.as("p_de_novo"), lit("HIGH").as("confidence")))
              .when(p > 0.5 && (kidAb > 0.3 || ac === 1),
                struct(p.as("p_de_novo"), lit("MEDIUM").as("confidence")))
              .when(kidAb > 0.2,
                struct(p.as("p_de_novo"), lit("LOW").as("confidence")))
              .otherwise(failure))

      // --- autosomal: both parents hom-ref, proband het ------------------
      val pAuto = st("p_auto")
      val autoCall =
        when(kid("GQ") < minGq, failure)
          .when(dpRatio < minDpRatio || !(kidAb >= minChildAb), failure)
          .when(momSum === 0 || dadSum === 0, failure)
          .when(st("mom_ab") > maxParentAb ||
            st("dad_ab") > maxParentAb, failure)
          .when(pAuto < minP, failure)
          .otherwise(conf(pAuto, lowCut = 0.2))

      // --- hemizygous: single informative parent -------------------------
      def hemiCall(par: Column, p: Column, parSum: Column,
          parAb: Column): Column = {
        val parRatio = when(par("DP") > 0,
          kid("DP").cast("double") / par("DP").cast("double"))
        when(kid("GQ") < minGq, failure)
          .when(parRatio < minDpRatio || kidAb < minChildAb, failure)
          .when(parSum === 0, failure)
          .when(parAb > maxParentAb, failure)
          .when(p < minP, failure)
          .otherwise(conf(p, lowCut = 0.3))
      }

      val inPar = rg.par.map { case (c, s0, e0) =>
        col("contig") === c && col("position") >= s0 &&
          col("position") < e0
      }.foldLeft(lit(false))(_ || _)
      val inX = rg.xContigs.map(col("contig") === _)
        .foldLeft(lit(false))(_ || _)
      val inY = rg.yContigs.map(col("contig") === _)
        .foldLeft(lit(false))(_ || _)
      val inMt = rg.mtContigs.map(col("contig") === _)
        .foldLeft(lit(false))(_ || _)
      val autosomal = (!inX && !inY && !inMt) || inPar ||
        (inX && !inPar && isFemale)
      val hemiX = inX && !inPar && !isFemale
      val hemiY = inY && !inPar && !isFemale
      val hemiMito = inMt && isFemale

      val hetHomHom = Calls.isHet(kid("GT")) &&
        Calls.isHomRef(dad("GT")) && Calls.isHomRef(mom("GT"))
      val kidAdFail = kidAb < minChildAb
      // a missing gate is a failure (the reference's hl.case() without
      // missing_false makes the whole call missing when any GT/AD in the
      // gate is missing), so null must not fall through to the copy-state
      // branches
      when(hetHomHom.isNull || kidAdFail.isNull ||
        !hetHomHom || kidAdFail, failure)
        .when(autosomal, autoCall)
        .when(hemiX || hemiMito,
          hemiCall(mom, st("p_hemi_mom"), momSum, st("mom_ab")))
        .when(hemiY, hemiCall(dad, st("p_hemi_dad"), dadSum,
          st("dad_ab")))
        .otherwise(failure)
    }

    val out = staged.withColumn("__call", call)
      .filter(col("__call").isNotNull)
    Table(out.select(
      (mt.rowKey.map(col) :+ col("id") :+
        col("__site_freq").as("prior") :+ col("is_female") :+
        col("__call")("p_de_novo").as("p_de_novo") :+
        col("__call")("confidence").as("confidence")): _*),
      mt.rowKey :+ "id", mt.globals)
  }
}
