package graft.methods

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructType}

import graft.{MatrixTable, Table}
import graft.functions.{Alleles, Calls, StatTests}

/** Per-sample / per-variant quality-control metrics (reference
  * `python/hail/methods/qc.py:59` `sample_qc`, `:219` `variant_qc`).
  *
  * Spark-first split of the two axes:
  *   - `variantQc` is a PER-ROW expression over the entries array — a
  *     single narrow pass, no shuffle: the whole metric struct folds over
  *     `aggregate(entries, …)` exactly like the reference's lowered
  *     entries-scoped aggregation.
  *   - `sampleQc` aggregates ACROSS rows per column, which is a genuine
  *     shuffle: per-entry contributions are computed as codegen'd int
  *     expressions in the coordinate representation, then one
  *     `groupBy(sample)` — the same two-phase partial/final hash agg the
  *     reference's AggElements lowering produces, at any matrix size.
  *
  * Input contract: VCF-shaped MatrixTable (rows keyed
  * contig/position/ref/alt, entry field GT packed call; optional DP/GQ
  * int fields picked up automatically like the reference). */
object Qc {

  private def entrySchema(mt: MatrixTable): StructType =
    mt.rows.schema(MatrixTable.EntriesField).dataType
      .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]

  /** Fold over the entries array accumulating callStats-shaped counts:
    * struct(called, ac[nAlleles], hom[nAlleles]). Null entries / null GTs
    * contribute nothing. One fused codegen'd loop
    * (`CallStatsFoldExpr`) — the `aggregate`+`zip_with` HOF chain it
    * replaces was interpreted and rebuilt both counter arrays per
    * entry. */
  private[graft] def callStatsFold(entries: Column, nAlleles: Column)
      : Column =
    graft.functions.GenotypeFolds.callStats(entries, nAlleles)

  private def divideNull(num: Column, den: Column): Column =
    when(den =!= 0, num.cast("double") / den)

  /** variant_qc (reference `qc.py:219`): per-variant metrics as one
    * narrow per-row pass; returns the rows Table annotated with the
    * metrics (AC/AF/AN/homozygote_count arrays + scalar counts + exact
    * Levene-Haldane HWE for biallelic variants). */
  def variantQc(mt: MatrixTable): Table =
    Table(annotateVariantQc(mt).rows.drop(MatrixTable.EntriesField),
      mt.rowKey, mt.globals)

  /** variant_qc in the reference's own annotate shape (`hl.variant_qc`
    * hands back the MATRIX with the metrics as row fields): entries are
    * retained, so a pipeline can `filterRows`/`filterEntries` on the
    * metrics and keep flowing — still the same narrow per-row pass, no
    * join, no shuffle, one stage with whatever follows. */
  def annotateVariantQc(mt: MatrixTable): MatrixTable = {
    val es = entrySchema(mt)
    val nAlleles = size(col("alt")) + 1
    val nCols = lit(mt.nCols.toLong)
    val withCs = mt.rows.withColumn("__cs",
      callStatsFold(col(MatrixTable.EntriesField), nAlleles))
      .withColumn("__present",
        size(filter(col(MatrixTable.EntriesField), e => e.isNotNull))
          .cast("long"))
    val ac = col("__cs")("ac")
    val hom = col("__cs")("hom")
    val called = col("__cs")("called")
    val an = aggregate(ac, lit(0L), (a, v) => a + v)
    val hwe = when(size(col("alt")) === 1,
      StatTests.hweExact(element_at(hom, 1),
        element_at(ac, 2) - element_at(hom, 2) * 2,
        element_at(hom, 2), lit(false)))
    val hweHi = when(size(col("alt")) === 1,
      StatTests.hweExact(element_at(hom, 1),
        element_at(ac, 2) - element_at(hom, 2) * 2,
        element_at(hom, 2), lit(true)))
    val dpGq: Seq[(String, Column)] =
      es.fieldNames.filter(f => f == "DP" || f == "GQ").toSeq.flatMap { f =>
        // one fused codegen'd pass per field (IntFieldStatsExpr) — the
        // HOF chain filtered + transformed + folded the entries twice
        val st = graft.functions.GenotypeFolds.intFieldStats(
          col(MatrixTable.EntriesField), f)
        val n = st("n").cast("double")
        val mean = st("sum") / n
        val meanSq = st("sumsq") / n
        val p = f.toLowerCase
        Seq(
          s"${p}_mean" -> when(n > 0, mean),
          s"${p}_stdev" -> when(n > 0, sqrt(meanSq - mean * mean)),
          s"${p}_min" -> st("min"),
          s"${p}_max" -> st("max"))
      }
    val annotated = withCs.withColumns(Map(
      "AC" -> ac, "AN" -> an,
      "AF" -> transform(ac, c => divideNull(c, an)),
      "homozygote_count" -> hom,
      "call_rate" -> divideNull(called, nCols),
      "n_called" -> called,
      "n_not_called" -> (col("__present") - called),
      "n_filtered" -> (nCols - col("__present")),
      "n_het" -> (called - aggregate(hom, lit(0L), (a, v) => a + v)),
      "n_non_ref" -> (called - element_at(hom, 1)),
      "het_freq_hwe" -> hwe("_1"),
      "p_value_hwe" -> hwe("_2"),
      "p_value_excess_het" -> hweHi("_2")))
    val withDpGq = dpGq.foldLeft(annotated) {
      case (d, (name, c)) => d.withColumn(name, c)
    }
    mt.copy(rows = withDpGq.drop("__cs", "__present"))
  }

  /** sample_qc (reference `qc.py:59`): per-sample metrics via one
    * coordinate-space shuffle. Returns a Table keyed by the col key. */
  def sampleQc(mt: MatrixTable): Table = {
    val es = entrySchema(mt)
    val nAlleles = size(col("alt")) + 1
    // row count as a broadcast 1-row aggregate, not an eager count():
    // the whole method stays one Spark job
    val nRowsDf = mt.rows.select(count(lit(1)).as("__n_rows"))
    // row-space annotations reused by every entry of the row: variant AC
    // (for singletons) and per-alt allele types (for snp/ti/tv/indel)
    val rows2 = mt.rows
      .withColumn("__ac", callStatsFold(col(MatrixTable.EntriesField),
        nAlleles)("ac"))
      .withColumn("__atypes",
        transform(col("alt"), a => Alleles.alleleType(col("ref"), a)))
      .withColumn("__ti",
        transform(col("alt"), a =>
          when(Alleles.alleleType(col("ref"), a) === Alleles.Snp,
            Alleles.isTransition(col("ref"), a)).otherwise(lit(false))))
    val e = mt.copy(rows = rows2).entriesTable.df
    val gt = col("GT")
    val a1 = Calls.allele1(gt)
    val a2 = Calls.allele2(gt)
    val dip = Calls.ploidy(gt) === 2
    // per-allele-instance contributions as plain int expressions
    def perAllele(f: Column => Column): Column =
      when(gt.isNull, 0L).otherwise(
        when(a1 > 0, f(a1).cast("long")).otherwise(0L) +
        when(dip && a2 > 0, f(a2).cast("long")).otherwise(0L))
    val singletons = perAllele(a => element_at(col("__ac"), a + 1) === 1)
    val ofType = (t: Int) =>
      perAllele(a => element_at(col("__atypes"), a) === t)
    val transitions = perAllele(a => element_at(col("__ti"), a))
    val transversions = perAllele(a =>
      element_at(col("__atypes"), a) === Alleles.Snp &&
        !element_at(col("__ti"), a))
    val dpGqAggs = es.fieldNames.filter(f => f == "DP" || f == "GQ")
      .flatMap { f =>
        val p = f.toLowerCase
        Seq(
          avg(col(f)).as(s"${p}_mean"),
          stddev_pop(col(f)).as(s"${p}_stdev"),
          min(col(f)).as(s"${p}_min"),
          max(col(f)).as(s"${p}_max"))
      }
    val aggExprs: Seq[Column] = Seq(
      count(when(gt.isNull, 1)).as("n_not_called"),
      count(lit(1)).as("__present"),
      count(when(Calls.isHomRef(gt), 1)).as("n_hom_ref"),
      count(when(Calls.isHet(gt), 1)).as("n_het"),
      count(when(Calls.isHomVar(gt), 1)).as("n_hom_var"),
      sum(singletons).as("n_singleton"),
      sum(transitions).as("n_transition"),
      sum(transversions).as("n_transversion"),
      sum(ofType(Alleles.Insertion)).as("n_insertion"),
      sum(ofType(Alleles.Deletion)).as("n_deletion"),
      sum(ofType(Alleles.Star)).as("n_star")) ++ dpGqAggs
    val perSample = e.groupBy(mt.colKey.map(col): _*)
      .agg(count(when(gt.isNotNull, 1)).as("n_called"), aggExprs: _*)
    val full = mt.colsTable.df
      .join(perSample, mt.colKey, "left")
      .na.fill(0L, Seq("n_called", "n_not_called", "__present", "n_hom_ref",
        "n_het", "n_hom_var", "n_singleton", "n_transition",
        "n_transversion", "n_insertion", "n_deletion", "n_star"))
      .crossJoin(broadcast(nRowsDf))
      .withColumn("n_filtered", col("__n_rows") - col("__present"))
      .withColumn("call_rate", divideNull(col("n_called"), col("__n_rows")))
      .withColumn("n_non_ref", col("n_het") + col("n_hom_var"))
      .withColumn("n_snp", col("n_transition") + col("n_transversion"))
      .withColumn("r_ti_tv",
        divideNull(col("n_transition"), col("n_transversion")))
      .withColumn("r_het_hom_var",
        divideNull(col("n_het"), col("n_hom_var")))
      .withColumn("r_insertion_deletion",
        divideNull(col("n_insertion"), col("n_deletion")))
      .drop("__present", "__n_rows")
    Table(full, mt.colKey, mt.globals)
  }

  /** compute_charr (reference `qc.py:1822`): the CHARR DNA sample
    * contamination estimator. Restricts to autosomal biallelic SNVs
    * whose reference allele frequency `refAf` (a row expression; the
    * reference derives it from in-sample AC only above 10k samples,
    * otherwise requires an external AF source) lies in (minAf, maxAf),
    * keeps hom-var calls with `GQ >= minGq` and DP (or AD sum) within
    * [minDp, maxDp], and per sample averages
    * `(AD_ref / (AD_ref + AD_alt)) / refAf`.
    *
    * Spark shape: row filters prune first (predicate on the row side —
    * no entries touched for excluded variants), then ONE entries pass in
    * the coordinate form and a single hash aggregation by sample. */
  def computeCharr(mt: MatrixTable, refAf: Column,
      minAf: Double = 0.05, maxAf: Double = 0.95,
      minDp: Int = 10, maxDp: Int = 100, minGq: Int = 20)
      (implicit rg: graft.functions.ReferenceGenome): Table = {
    val es = entrySchema(mt)
    val locus = graft.functions.Loci.locus(col("contig"), col("position"))
    val filtered = mt.rows
      .withColumn("__raf", refAf)
      .filter(graft.functions.Loci.isAutosomal(locus) &&
        size(col("alt")) === 1 &&
        Alleles.isSnp(col("ref"), element_at(col("alt"), 1)) &&
        col("__raf") > minAf && col("__raf") < maxAf)
    val e = filtered.select(col("__raf"),
      posexplode(col(MatrixTable.EntriesField)).as(Seq("__cidx", "__e")))
    val ent = col("__e")
    val ad = ent("AD")
    val adDp =
      if (es.fieldNames.contains("DP")) ent("DP")
      else aggregate(ad, lit(0), (acc, x) => acc + x)
    val kept = e.filter(ent.isNotNull && Calls.isHomVar(ent("GT")) &&
      ent("GQ") >= minGq && adDp >= minDp && adDp <= maxDp)
    val perSample = kept.groupBy(col("__cidx"))
      .agg(avg(element_at(ad, 1).cast("double") /
        (element_at(ad, 1) + element_at(ad, 2)) / col("__raf"))
        .as("charr"))
    // sample ids are driver-side col values: broadcast-join them back
    val spark = mt.rows.sparkSession
    val ids = spark.createDataFrame(
      spark.sparkContext.parallelize(
        mt.colValues.zipWithIndex.map { case (r, i) =>
          org.apache.spark.sql.Row.fromSeq(i +: mt.colKey.map(k =>
            r.get(mt.colSchema.fieldIndex(k))))
        }),
      StructType(
        org.apache.spark.sql.types.StructField("__cidx",
          org.apache.spark.sql.types.IntegerType, false) +:
          mt.colKey.map(k =>
            mt.colSchema(mt.colSchema.fieldIndex(k))).toArray))
    val out = broadcast(ids).join(perSample, Seq("__cidx"), "left")
      .drop("__cidx")
      .select(mt.colKey.map(col) :+ col("charr"): _*)
    Table(out, mt.colKey, mt.globals)
  }
}
