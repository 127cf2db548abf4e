package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Table
import graft.functions.ReferenceGenome

/** import_gtf / get_gene_intervals (reference
  * `python/hail/experimental/import_gtf.py`): GTF / GFF2 annotation
  * import. Rows carry the fixed GTF columns plus one column per tag
  * found in ANY row's attribute field (missing where a row lacks the
  * tag), and an inclusive `interval` struct (contig, start, end) the
  * table is keyed by.
  *
  * Spark shape: a plain csv scan; attribute parsing is codegen'd
  * split/regexp work into a map column; the tag set is discovered with
  * one distinct-keys aggregation (the reference's checkpoint +
  * collect_as_set), then widened in a single projection. */
object Gtf {

  def read(spark: SparkSession, path: String,
      referenceGenome: Option[ReferenceGenome] = None,
      skipInvalidContigs: Boolean = false): Table = {
    val raw = spark.read
      .option("sep", "\t").option("comment", "#").csv(path)
      .toDF("seqname", "source", "feature", "start", "end", "score",
        "strand", "frame", "attribute")
    val entries = transform(split(col("attribute"), "; "), a => {
      val kv = split(a, " ", 2)
      struct(element_at(kv, 1).as("k"),
        regexp_replace(element_at(kv, 2), "[\";]", "").as("v"))
    })
    val parsed = raw.select(
      col("seqname"), col("source"), col("feature"),
      col("start").cast("int").as("start"),
      col("end").cast("int").as("end"),
      when(col("score") =!= ".", col("score").cast("double")).as("score"),
      col("strand"),
      when(col("frame") =!= ".", col("frame").cast("int")).as("frame"),
      map_from_entries(filter(entries,
        e => e("k").isNotNull && e("k") =!= "")).as("__attr"))
      .localCheckpoint(false) // consumed by the key sweep AND the widen
    val tags = parsed
      .select(explode(map_keys(col("__attr"))).as("k"))
      .distinct().collect().map(_.getString(0)).sorted.toSeq
    val widened = parsed.select(
      (parsed.columns.filterNot(_ == "__attr").map(col).toSeq ++
        tags.map(t => element_at(col("__attr"), t).as(t))): _*)
    val normalized = referenceGenome match {
      case Some(rg) =>
        // GRCh38-style naming: chr-prefix everything except HLA contigs
        val fixed = widened.withColumn("seqname",
          when(col("seqname").startsWith("HLA"), col("seqname"))
            .when(col("seqname").startsWith("chrHLA"),
              regexp_replace(col("seqname"), "^chr", ""))
            .when(col("seqname").startsWith("chr"), col("seqname"))
            .otherwise(concat(lit("chr"), col("seqname"))))
        if (skipInvalidContigs)
          fixed.filter(col("seqname").isin(rg.contigs: _*))
        else fixed
      case None => widened
    }
    val out = normalized
      .withColumn("interval", struct(
        col("seqname").as("contig"),
        col("start").as("start"),
        col("end").as("end")))
      .drop("seqname", "start", "end")
    Table(out, Seq("interval"))
  }

  /** get_gene_intervals: the inclusive intervals of matching genes /
    * transcripts, collected driver-side for interval filtering. */
  def geneIntervals(spark: SparkSession, path: String,
      geneSymbols: Seq[String] = Nil, geneIds: Seq[String] = Nil,
      transcriptIds: Seq[String] = Nil,
      referenceGenome: Option[ReferenceGenome] = None)
      : Seq[(String, Int, Int)] = {
    require(geneSymbols.nonEmpty || geneIds.nonEmpty ||
      transcriptIds.nonEmpty,
      "get_gene_intervals requires gene_symbols, gene_ids, or " +
        "transcript_ids")
    val ht = read(spark, path, referenceGenome).df
    def has(c: String) = ht.columns.contains(c)
    val crit = Seq(
      if (geneSymbols.nonEmpty && has("gene_name"))
        Some(col("feature") === "gene" &&
          col("gene_name").isin(geneSymbols: _*))
      else None,
      if (geneIds.nonEmpty && has("gene_id"))
        Some(col("feature") === "gene" &&
          col("gene_id").isin(geneIds.map(_.split("\\.")(0)): _*))
      else None,
      if (transcriptIds.nonEmpty && has("transcript_id"))
        Some(col("feature") === "transcript" &&
          col("transcript_id").isin(
            transcriptIds.map(_.split("\\.")(0)): _*))
      else None).flatten
    ht.filter(crit.reduce(_ || _))
      .select(col("interval")("contig"), col("interval")("start"),
        col("interval")("end"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
      .toSeq
  }
}
