package graft.methods

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

import graft.MatrixTable
import graft.functions.{Calls, Rand}

/** simulate_random_mating (reference
  * `python/hail/methods/relatedness/mating_simulation.py`): simulate
  * random diploid mating for `nRounds` generations; each round draws
  * `floor(prevSize * generationSizeMultiplier)` offspring whose parents
  * are uniform over the previous generation and whose alleles are a
  * uniform draw from each parent's two.
  *
  * Spark shape: the pedigree (names, mother/father indices) is
  * row-independent, so it is built ONCE driver-side with a seeded RNG —
  * the reference does the same thing in a global annotation. Per-row
  * allele transmission uses the counter-based `Rand` keyed by
  * (row key, generation, offspring, parent), so the simulation is a
  * pure codegen'd entries expression: deterministic under
  * repartitioning, one pass, no shuffle, any matrix size. Each
  * generation's call array is staged as its own column so the
  * expression tree stays linear in `nRounds`. */
object MatingSimulation {

  final case class Samp(s: String, original: String, mother: Integer,
      father: Integer)

  def simulateRandomMating(mt: MatrixTable, nRounds: Int = 1,
      generationSizeMultiplier: Double = 1.0,
      keepFounders: Boolean = true, seed: Long = 1L): MatrixTable = {
    require(generationSizeMultiplier > 0,
      s"generation_size_multiplier must be > 0: $generationSizeMultiplier")
    require(nRounds >= 1, s"n_rounds must be positive: $nRounds")
    val ckIdx = mt.colSchema.fieldIndex(mt.colKey.head)
    val founders = mt.colValues.zipWithIndex.map { case (r, i) =>
      Samp(s"generation_0_idx_$i", String.valueOf(r.get(ckIdx)), null, null)
    }
    // pedigree: row-independent, seeded, driver-side
    val rng = new scala.util.Random(seed)
    val generations = Iterator.iterate(
      (founders, founders.length, 0)) { case (_, prevSize, round) =>
        val nNew = math.floor(prevSize * generationSizeMultiplier).toInt
        val gen = (0 until nNew).map(i => Samp(
          s"generation_${round + 1}_idx_$i", null,
          rng.nextInt(prevSize), rng.nextInt(prevSize)))
        (gen.toIndexedSeq,
          if (keepFounders) prevSize + nNew else nNew, round + 1)
      }.take(nRounds + 1).map(_._1).toIndexedSeq

    val rowKeyCols = mt.rowKey.map(col)
    def transmitted(parent: Column, pick: Column): Column =
      when(pick === 0, Calls.allele1(parent)).otherwise(Calls.allele2(parent))
    // stage each generation's call array; offspring index into the
    // PREVIOUS stage (full population so far when keepFounders, else the
    // previous generation alone — the reference's prev_size semantics)
    var rows = mt.rows.withColumn("__gen0",
      transform(col(MatrixTable.EntriesField), e => e("GT")))
    for (round <- 1 to nRounds) {
      val prevCol = col(s"__gen${round - 1}")
      val gen = generations(round)
      val newCalls = gen.zipWithIndex.map { case (samp, i) =>
        val mPick = Rand.rint32(seed, 2,
          (rowKeyCols :+ lit(round) :+ lit(i) :+ lit(0)): _*)
        val fPick = Rand.rint32(seed, 2,
          (rowKeyCols :+ lit(round) :+ lit(i) :+ lit(1)): _*)
        // try_element_at: the expression must stay TOTAL on any row a
        // pushed-down predicate may reach (e.g. a VCF source's header
        // lines parse to EMPTY entries before the header filter —
        // Catalyst can evaluate generator-inferred filters below it)
        Calls.diploid(
          transmitted(try_element_at(prevCol, lit(samp.mother + 1)), mPick),
          transmitted(try_element_at(prevCol, lit(samp.father + 1)), fPick))
      }
      val genCol =
        if (newCalls.isEmpty)
          // degenerate multiplier: unchanged population (or empty when
          // only offspring are kept — typed empty via filter)
          if (keepFounders) prevCol else filter(prevCol, _ => lit(false))
        else if (keepFounders) concat(prevCol, array(newCalls: _*))
        else array(newCalls: _*)
      rows = rows.withColumn(s"__gen$round", genCol)
    }
    val kept: IndexedSeq[Samp] =
      if (keepFounders) generations.flatten
      else generations.last
    val entries = transform(col(s"__gen$nRounds"),
      c => struct(c.as("GT")))
    val outRows = rows
      .withColumn(MatrixTable.EntriesField, entries)
      .drop((0 to nRounds).map(r => s"__gen$r"): _*)
    mt.copy(
      rows = outRows,
      colValues = kept.map(s =>
        Row(s.s, s.original, s.mother, s.father)),
      colSchema = StructType(Seq(
        StructField("s", StringType, false),
        StructField("original", StringType),
        StructField("mother", IntegerType),
        StructField("father", IntegerType))),
      colKey = Seq("s"))
  }
}
