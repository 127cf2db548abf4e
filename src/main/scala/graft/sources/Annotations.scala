package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Table

/** Annotation-file importers (reference python `import_locus_intervals`,
  * `import_bed`, `import_fam` in `methods/impex.py`). All are distributed
  * text scans with Column-expression parsing. */
object Annotations {

  /** import_locus_intervals: UCSC "chr:start-end" one-liner format →
    * Table keyed (contig, start, end) with [start, end] inclusive bounds
    * (the reference's interval_list contract). */
  def importLocusIntervals(spark: SparkSession, path: String): Table = {
    val line = trim(col("value"))
    val re = "^([^:]+):(\\d+)-(\\d+)$"
    val df = spark.read.text(path)
      .filter(length(line) > 0 && !line.startsWith("#"))
      .select(
        regexp_extract(line, re, 1).as("contig"),
        Vcf.safeInt(regexp_extract(line, re, 2)).as("start"),
        Vcf.safeInt(regexp_extract(line, re, 3)).as("end"))
      .filter(col("contig") =!= "" && col("start").isNotNull &&
        col("end").isNotNull)
    Table(df, Seq("contig", "start", "end"))
  }

  /** import_bed: BED3/BED4 — 0-based half-open start converted to the
    * reference's 1-based inclusive start (start+1), `end` kept (half-open
    * end == inclusive end in 1-based). Optional 4th column = target. */
  def importBed(spark: SparkSession, path: String): Table = {
    val f = split(trim(col("value")), "\\s+")
    val at = (i: Int) => try_element_at(f, lit(i + 1))
    val df = spark.read.text(path)
      .filter(length(trim(col("value"))) > 0 &&
        !trim(col("value")).startsWith("#") &&
        !trim(col("value")).startsWith("track") &&
        !trim(col("value")).startsWith("browser"))
      .select(
        at(0).as("contig"),
        (Vcf.safeInt(at(1)) + 1).as("start"),
        Vcf.safeInt(at(2)).as("end"),
        at(3).as("target"))
      .filter(col("start").isNotNull && col("end").isNotNull)
    Table(df, Seq("contig", "start", "end"))
  }

  /** import_fam: pedigree file → Table keyed by sample id. */
  def importFam(spark: SparkSession, path: String): Table = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val fam = Plink.readFam(spark, path)
    val rows = fam.map(r => Row(r.id, r.famId, r.patId, r.matId,
      r.isFemale.map(java.lang.Boolean.valueOf).orNull,
      r.quantPheno.map(java.lang.Double.valueOf).orNull))
    val schema = StructType(Seq(
      StructField("s", StringType),
      StructField("fam_id", StringType),
      StructField("pat_id", StringType),
      StructField("mat_id", StringType),
      StructField("is_female", BooleanType),
      StructField("quant_pheno", DoubleType)))
    Table(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema), Seq("s"))
  }
}
