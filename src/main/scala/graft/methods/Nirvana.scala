package graft.methods

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Table

/** Nirvana annotator (reference `methods/Nirvana.scala`, registry entry
  * `expr/ir/functions/RelationalFunctions.scala`): the same
  * external-process contract as VEP — variant rows stream to the
  * annotator as minimal VCF lines, one JSON object per variant comes
  * back — with Nirvana's output shape. Unlike VEP's `--json` mode the
  * output does not echo the input line; the variant key is re-derived
  * from the annotation's own `chromosome`/`position`/`refAllele`/
  * `altAlleles` fields (reference `Nirvana.scala:468-476`).
  *
  * Spark shape: `RDD.pipe` fans the external process out per partition
  * (the reference hand-schedules the same thing with `blockSize`-sized
  * batches); the JSON parse is a codegen'd `from_json`; the annotate-back
  * is a key equi-join. */
object Nirvana {

  /** Representative subset of the Nirvana v2.0.8 positions schema
    * (reference `Nirvana.scala:31` `nirvanaSignature`; a custom
    * deployment can pass its own schema). */
  val nirvanaJsonSchema: StructType = StructType(Seq(
    StructField("chromosome", StringType),
    StructField("refAllele", StringType),
    StructField("position", IntegerType),
    StructField("altAlleles", ArrayType(StringType)),
    StructField("cytogeneticBand", StringType),
    StructField("quality", DoubleType),
    StructField("filters", ArrayType(StringType)),
    StructField("variants", ArrayType(StructType(Seq(
      StructField("altAllele", StringType),
      StructField("refAllele", StringType),
      StructField("chromosome", StringType),
      StructField("begin", IntegerType),
      StructField("end", IntegerType),
      StructField("phylopScore", DoubleType),
      StructField("isReferenceMinor", BooleanType),
      StructField("variantType", StringType),
      StructField("vid", StringType),
      StructField("hgvsg", StringType),
      StructField("regulatoryRegions", ArrayType(StructType(Seq(
        StructField("id", StringType),
        StructField("type", StringType),
        StructField("consequence", ArrayType(StringType)))))),
      StructField("transcripts", ArrayType(StructType(Seq(
        StructField("transcript", StringType),
        StructField("source", StringType),
        StructField("bioType", StringType),
        StructField("geneId", StringType),
        StructField("hgnc", StringType),
        StructField("consequence", ArrayType(StringType)),
        StructField("isCanonical", BooleanType)))))))))))

  /** Annotate a variant-keyed table with a Nirvana-invocation-shaped
    * external process; `cmd` reads minimal VCF lines on stdin and emits
    * one Nirvana positions-JSON object per line. `tolerateParseError`
    * drops unparseable lines instead of failing the job. */
  def nirvana(tbl: Table, cmd: Seq[String],
      schema: StructType = nirvanaJsonSchema,
      name: String = "nirvana",
      tolerateParseError: Boolean = false,
      env: Map[String, String] = Map.empty,
      contig: String = "contig", position: String = "position",
      ref: String = "ref", alt: String = "alt"): Table = {
    val spark = tbl.spark
    val keyCols = Seq(contig, position, ref, alt)
    val lines = tbl.df.select(
        concat_ws("\t", col(contig), col(position).cast("string"),
          lit("."), col(ref), concat_ws(",", col(alt)), lit("."),
          lit("."), lit("GT")).as("value"))
      .as(org.apache.spark.sql.Encoders.STRING)
      .rdd.pipe(cmd, env)
    val out = spark.createDataset(lines)(
      org.apache.spark.sql.Encoders.STRING)
    val parsed = out.select(col("value"),
      from_json(col("value"), schema).as(name))
    val checked =
      if (tolerateParseError)
        parsed.filter(col(name).isNotNull &&
          col(s"$name.chromosome").isNotNull)
      else parsed.select(col("value"),
        when(col(name).isNull || col(s"$name.chromosome").isNull,
          raise_error(concat(lit("Nirvana output parse error: "),
            col("value"))))
          .otherwise(col(name)).as(name))
    val annotations: DataFrame = checked.select(
      col(s"$name.chromosome").as(contig),
      col(s"$name.position").as(position),
      col(s"$name.refAllele").as(ref),
      col(s"$name.altAlleles").as(alt),
      col(name))
    tbl.copy(df = tbl.df.join(annotations, keyCols, "left"),
      keySorted = false)
  }
}
