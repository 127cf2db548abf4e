package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join helpers. AQE's skew-join rewrite
  * (`spark.sql.adaptive.skewJoin`) already splits oversized sort-merge
  * partitions at runtime; explicit salting remains the right tool when
  * one side has a few pathological hot keys (a boilerplate document
  * hash, a null-ish default id) and the OTHER side is small enough per
  * key to replicate — the classic 100 TB shape Catalyst cannot fix on
  * its own because the hot key still lands in one task.
  *
  * `saltedJoin` spreads the skewed side's hot keys over `saltFactor`
  * sub-keys (deterministic hash salt, no rand()) and replicates every
  * matching right-side row `saltFactor` times, so the shuffle fans the
  * hot key across `saltFactor` tasks. Semantics are exactly those of
  * the equi-join on `keys` (inner or left_outer). */
object Skew {

  def saltedJoin(skewed: DataFrame, other: DataFrame, keys: Seq[String],
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"unsupported salted join type $joinType")
    // deterministic per-row salt: stable under retries, unlike rand()
    val salt = pmod(xxhash64(skewed.columns.map(col): _*),
      lit(saltFactor.toLong))
    val l = skewed.withColumn("__salt", salt)
    val r = other.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltFactor.toLong - 1))))
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }
}
