package graft.methods

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Table

/** VEP-shaped external annotation (reference `methods/qc.py:1104` `vep`,
  * `qc.py:546` `vep_json_typ`, `qc.py:690` `VEPConfig`; JVM runner
  * `is/hail/methods/VEP.scala`): stream each partition's variants to an
  * annotator subprocess as minimal VCF lines, parse its stdout, and join
  * the annotations back onto the dataset by the variant key re-parsed
  * from the echoed `input` field — the same contract the reference's
  * runner uses, so any VEP-invocation-compatible binary (or a
  * deterministic stand-in) plugs in.
  *
  * Spark shape: `RDD.pipe` owns subprocess lifecycle per partition (one
  * annotator per partition, like the reference's one-VEP-per-block), the
  * JSON parse is a codegen'd `from_json`, and the annotate-back is a
  * key join — output cardinality and order are the process's business,
  * exactly as in the reference (`qc.py:1085` keys by parse_variant of
  * the echoed input). Scales with partitions; nothing driver-side. */
object Vep {

  private def arr(fields: StructField*): ArrayType =
    ArrayType(StructType(fields))

  /** Default VEP `--json` output schema (reference `qc.py:546`
    * `vep_json_typ`, representative field subset — a custom `VEPConfig`
    * supplies its own `json_type`, mirrored here by the `schema`
    * parameter of `vep`). */
  val vepJsonSchema: StructType = StructType(Seq(
    StructField("assembly_name", StringType),
    StructField("allele_string", StringType),
    StructField("ancestral", StringType),
    StructField("colocated_variants", arr(
      StructField("allele_string", StringType),
      StructField("clin_sig", ArrayType(StringType)),
      StructField("end", IntegerType),
      StructField("id", StringType),
      StructField("minor_allele", StringType),
      StructField("minor_allele_freq", DoubleType),
      StructField("phenotype_or_disease", IntegerType),
      StructField("pubmed", ArrayType(IntegerType)),
      StructField("somatic", IntegerType),
      StructField("start", IntegerType),
      StructField("strand", IntegerType))),
    StructField("context", StringType),
    StructField("end", IntegerType),
    StructField("id", StringType),
    StructField("input", StringType),
    StructField("intergenic_consequences", arr(
      StructField("allele_num", IntegerType),
      StructField("consequence_terms", ArrayType(StringType)),
      StructField("impact", StringType),
      StructField("minimised", IntegerType),
      StructField("variant_allele", StringType))),
    StructField("most_severe_consequence", StringType),
    StructField("motif_feature_consequences", arr(
      StructField("allele_num", IntegerType),
      StructField("consequence_terms", ArrayType(StringType)),
      StructField("high_inf_pos", StringType),
      StructField("impact", StringType),
      StructField("minimised", IntegerType),
      StructField("motif_feature_id", StringType),
      StructField("motif_name", StringType),
      StructField("motif_pos", IntegerType),
      StructField("motif_score_change", DoubleType),
      StructField("strand", IntegerType),
      StructField("variant_allele", StringType))),
    StructField("regulatory_feature_consequences", arr(
      StructField("allele_num", IntegerType),
      StructField("biotype", StringType),
      StructField("consequence_terms", ArrayType(StringType)),
      StructField("impact", StringType),
      StructField("minimised", IntegerType),
      StructField("regulatory_feature_id", StringType),
      StructField("variant_allele", StringType))),
    StructField("seq_region_name", StringType),
    StructField("start", IntegerType),
    StructField("strand", IntegerType),
    StructField("transcript_consequences", arr(
      StructField("allele_num", IntegerType),
      StructField("amino_acids", StringType),
      StructField("biotype", StringType),
      StructField("canonical", IntegerType),
      StructField("ccds", StringType),
      StructField("cdna_start", IntegerType),
      StructField("cdna_end", IntegerType),
      StructField("cds_end", IntegerType),
      StructField("cds_start", IntegerType),
      StructField("codons", StringType),
      StructField("consequence_terms", ArrayType(StringType)),
      StructField("distance", IntegerType),
      StructField("domains", arr(
        StructField("db", StringType),
        StructField("name", StringType))),
      StructField("exon", StringType),
      StructField("gene_id", StringType),
      StructField("gene_pheno", IntegerType),
      StructField("gene_symbol", StringType),
      StructField("gene_symbol_source", StringType),
      StructField("hgnc_id", StringType),
      StructField("hgvsc", StringType),
      StructField("hgvsp", StringType),
      StructField("impact", StringType),
      StructField("intron", StringType),
      StructField("lof", StringType),
      StructField("lof_filter", StringType),
      StructField("lof_flags", StringType),
      StructField("lof_info", StringType),
      StructField("polyphen_prediction", StringType),
      StructField("polyphen_score", DoubleType),
      StructField("protein_id", StringType),
      StructField("protein_start", IntegerType),
      StructField("protein_end", IntegerType),
      StructField("sift_prediction", StringType),
      StructField("sift_score", DoubleType),
      StructField("strand", IntegerType),
      StructField("transcript_id", StringType),
      StructField("variant_allele", StringType))),
    StructField("variant_class", StringType)))

  /** Minimal VCF line for one variant row — the framing the reference's
    * runner writes to the annotator's stdin. */
  private def vcfLine(contig: String, position: String, ref: String,
      alt: String): Column =
    concat_ws("\t", col(contig), col(position).cast("string"), lit("."),
      col(ref), concat_ws(",", col(alt)), lit("."), lit("."), lit("GT"))

  /** Variant key parsed back from an echoed VCF line (reference
    * `qc.py:1085` `parse_variant(annotations.variant)`). */
  private def keyFromVcfLine(line: Column, contig: String, position: String,
      ref: String, alt: String): Seq[Column] = {
    val f = split(line, "\t")
    Seq(f.getItem(0).as(contig),
      f.getItem(1).cast(IntegerType).as(position),
      f.getItem(3).as(ref),
      split(f.getItem(4), ",").as(alt))
  }

  /** Annotate a variant-keyed table with a VEP-invocation-shaped external
    * process. `cmd` reads minimal VCF lines on stdin; in JSON mode
    * (csq = false) it emits one VEP `--json` object per line (the
    * `input` field must echo the line), parsed with `schema` into the
    * row field `name`; in csq mode it emits VCF lines whose INFO carries
    * `CSQ=` strings, surfaced as an array field plus the
    * `{name}_csq_header` global (reference `qc.py:1265`). Variant key
    * fields default to the engine's (contig, position, ref, alt).
    * `tolerateParseError` drops unparseable output lines instead of
    * failing the job (reference's flag of the same name). */
  def vep(tbl: Table, cmd: Seq[String],
      schema: StructType = vepJsonSchema,
      name: String = "vep",
      csq: Boolean = false,
      csqHeader: String = "",
      tolerateParseError: Boolean = false,
      env: Map[String, String] = Map.empty,
      contig: String = "contig", position: String = "position",
      ref: String = "ref", alt: String = "alt"): Table = {
    val spark = tbl.spark
    val keyCols = Seq(contig, position, ref, alt)
    val lines = tbl.df.select(
        vcfLine(contig, position, ref, alt).as("value"))
      .as(org.apache.spark.sql.Encoders.STRING)
      .rdd.pipe(cmd, env)
    val out = spark.createDataset(lines)(
      org.apache.spark.sql.Encoders.STRING)
    val annotations: DataFrame =
      if (!csq) {
        val parsed = out.select(col("value"),
          from_json(col("value"), schema).as(name))
        val checked =
          if (tolerateParseError)
            parsed.filter(col(name).isNotNull &&
              col(s"$name.input").isNotNull)
          else parsed.select(col("value"),
            when(col(name).isNull || col(s"$name.input").isNull,
              raise_error(concat(lit("VEP output parse error: "),
                col("value"))))
              .otherwise(col(name)).as(name))
        checked.select(
          keyFromVcfLine(col(s"$name.input"), contig, position, ref, alt)
            :+ col(name): _*)
      } else {
        // csq mode: annotator emits VCF lines, CSQ INFO strings become
        // the annotation array (reference `qc.py:966` csq=True)
        val f = split(col("value"), "\t")
        out.filter(!col("value").startsWith("#"))
          .select(
            f.getItem(0).as(contig),
            f.getItem(1).cast(IntegerType).as(position),
            f.getItem(3).as(ref),
            split(f.getItem(4), ",").as(alt),
            split(regexp_extract(f.getItem(7), "(?:^|;)CSQ=([^;]*)", 1),
              ",").as(name))
      }
    val joined = tbl.df.join(annotations, keyCols, "left")
    val base = tbl.copy(df = joined, keySorted = false)
    if (csq) base.annotateGlobals(s"${name}_csq_header" -> csqHeader)
    else base
  }
}
