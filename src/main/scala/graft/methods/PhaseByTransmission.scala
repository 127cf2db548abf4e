package graft.methods

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.MatrixTable
import graft.functions.{Calls, Loci, ReferenceGenome}

/** phase_by_transmission (reference
  * `python/hail/experimental/phase_by_transmission.py`): phase trio
  * genotypes by allele transmission. Proband is phased as
  * father_allele | mother_allele; parents as transmitted |
  * untransmitted. Unphasable combinations (missing member, Mendelian
  * violation, triple-het, diploid father on X/Y non-PAR, diploid
  * proband on Y non-PAR) return missing, exactly as the reference.
  *
  * Spark shape: one pure Column expression per trio entry — the
  * candidate-combination search is a 2×2 literal enumeration over
  * higher-order array functions, so phasing a 100 TB trio matrix is a
  * single codegen'd entries pass with no shuffle. */
object PhaseByTransmission {

  private def haploidPhased(a: Column): Column =
    Calls.haploid(a).bitwiseOR(lit(1))
  private def diploidPhased(a1: Column, a2: Column): Column =
    Calls.diploid(a1, a2, lit(true))
  private def alleleAt(c: Column, i: Column): Column =
    when(i === 0, Calls.allele1(c)).otherwise(Calls.allele2(c))
  /** Parent phased as transmitted | untransmitted. */
  private def parentPhased(c: Column, ti: Column): Column =
    diploidPhased(alleleAt(c, ti), alleleAt(c, lit(1) - ti))

  /** Returns array<int> [proband, father, mother] of phased packed
    * calls; the whole array or individual slots are null where the
    * reference leaves them unphased. `locus` is a
    * struct(contig, position). */
  def phaseByTransmission(locus: Column, kid: Column, dad: Column,
      mom: Column)(implicit rg: ReferenceGenome): Column = {
    val p0 = Calls.allele1(kid)
    val p1 = Calls.allele2(kid)

    // transmission candidates (source index, allele): het parents offer
    // both stored alleles, everything else offers the first only — the
    // reference's call_to_one_hot_alleles_array enumeration
    def cand(c: Column): Column =
      when(Calls.isHet(c),
        array(struct(lit(0).as("i"), Calls.allele1(c).as("a")),
          struct(lit(1).as("i"), Calls.allele2(c).as("a"))))
        .when(c.isNotNull,
          array(struct(lit(0).as("i"), Calls.allele1(c).as("a"))))

    val sexNonPar = Loci.inXNonPar(locus) || Loci.inYNonPar(locus)
    // on X/Y non-PAR a diploid father cannot transmit -> no candidates
    val fv = when(sexNonPar,
      when(Calls.ploidy(dad) === 1,
        array(struct(lit(0).as("i"), Calls.allele1(dad).as("a")))))
      .otherwise(cand(dad))
    val mv = cand(mom)
    val combos = flatten(transform(fv, f =>
      filter(transform(mv, m =>
        struct(f("i").as("fi"), m("i").as("mi"),
          f("a").as("fa"), m("a").as("ma"))),
        s => least(s("fa"), s("ma")) === least(p0, p1) &&
          greatest(s("fa"), s("ma")) === greatest(p0, p1))))
    val c0 = element_at(combos, 1)
    val diploidRes = when(combos.isNotNull && size(combos) === 1,
      array(
        diploidPhased(alleleAt(dad, c0("fi")), alleleAt(mom, c0("mi"))),
        when(Calls.ploidy(dad) === 1, haploidPhased(Calls.allele1(dad)))
          .otherwise(parentPhased(dad, c0("fi"))),
        parentPhased(mom, c0("mi"))))

    // haploid proband on X non-PAR: transmitted allele is the FIRST
    // maternal allele matching the proband's
    val mi = when(Calls.allele1(mom) === p0, lit(0))
      .when(Calls.allele2(mom) === p0, lit(1))
    val xHapRes = when(mi.isNotNull, array(
      haploidPhased(p0),
      when(Calls.ploidy(dad) === 1, haploidPhased(Calls.allele1(dad))),
      parentPhased(mom, mi)))

    // Y non-PAR: both proband and father haploid and equal; mother slot
    // is always missing
    val yRes = when(Calls.ploidy(kid) === 1 && Calls.ploidy(dad) === 1 &&
        Calls.allele1(dad) === p0,
      array(haploidPhased(p0), haploidPhased(Calls.allele1(dad)),
        lit(null).cast("int")))

    when(Loci.inXNonPar(locus) && Calls.ploidy(kid) === 1, xHapRes)
      .when(Loci.inYNonPar(locus), yRes)
      .when(Calls.ploidy(kid) === 2, diploidRes)
  }

  /** phase_trio_matrix_by_transmission: annotate a `Trios.trioMatrix`
    * result's proband/father/mother entries with a phased call field.
    * Two entry passes: the first stages the (large) phase expression as
    * ONE attribute per entry, the second distributes it — referencing
    * the expression three times directly would triple the codegen'd
    * tree. */
  def phaseTrioMatrix(tm: MatrixTable, callField: String = "GT",
      phasedCallField: String = "PBT_GT")
      (implicit rg: ReferenceGenome): MatrixTable = {
    val locus = Loci.locus(col("contig"), col("position"))
    val staged = tm.mapEntries((e, _) => struct(
      e("proband_entry").as("proband_entry"),
      e("father_entry").as("father_entry"),
      e("mother_entry").as("mother_entry"),
      phaseByTransmission(locus, e("proband_entry")(callField),
        e("father_entry")(callField),
        e("mother_entry")(callField)).as("__pbt")))
    staged.mapEntries((e, _) => struct(
      e("proband_entry")
        .withField(phasedCallField, element_at(e("__pbt"), 1))
        .as("proband_entry"),
      e("father_entry")
        .withField(phasedCallField, element_at(e("__pbt"), 2))
        .as("father_entry"),
      e("mother_entry")
        .withField(phasedCallField, element_at(e("__pbt"), 3))
        .as("mother_entry")))
  }
}
