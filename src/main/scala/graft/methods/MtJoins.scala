package graft.methods

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.MatrixTable

/** Experimental whole-matrix reshapes (reference
  * `python/hail/experimental/full_outer_join_mt.py`,
  * `phase_by_transmission.py:explode_trio_matrix`). The column-side
  * alignment is pure driver work over `colValues` (columns are
  * "thousands, not billions"); the row side stays one join / one
  * entries projection. */
object MtJoins {

  /** full_outer_join_mt: outer-join rows AND columns of two matrices.
    * Output columns are keyed by the union of col keys (cross product
    * where a key repeats on both sides, as in the reference); each
    * entry is struct(left_entry, right_entry) with the missing side
    * null, and row fields land under left_row/right_row structs. */
  def fullOuterJoinMt(left: MatrixTable, right: MatrixTable)
      : MatrixTable = {
    require(left.rowKey == right.rowKey,
      s"row key mismatch: ${left.rowKey} vs ${right.rowKey}")
    require(left.colKey == right.colKey,
      s"col key mismatch: ${left.colKey} vs ${right.colKey}")
    val lKeyIdx = left.colKey.map(left.colSchema.fieldIndex)
    val rKeyIdx = right.colKey.map(right.colSchema.fieldIndex)
    def keyOf(r: Row, idx: Seq[Int]): Seq[Any] = idx.map(r.get)
    val lByKey = left.colValues.zipWithIndex
      .groupBy { case (r, _) => keyOf(r, lKeyIdx) }
    val rByKey = right.colValues.zipWithIndex
      .groupBy { case (r, _) => keyOf(r, rKeyIdx) }
    val allKeys = (lByKey.keySet ++ rByKey.keySet).toSeq
      .sortBy(_.mkString(""))
    // (key, leftIdx?, rightIdx?) — cross product on both-sides keys
    val keyIndices: Seq[(Seq[Any], Option[Int], Option[Int])] =
      allKeys.flatMap { k =>
        (lByKey.get(k), rByKey.get(k)) match {
          case (Some(ls), Some(rs)) =>
            for { (_, li) <- ls; (_, ri) <- rs }
              yield (k, Some(li), Some(ri))
          case (Some(ls), None) => ls.map { case (_, li) =>
            (k, Some(li), None) }
          case (None, Some(rs)) => rs.map { case (_, ri) =>
            (k, None, Some(ri)) }
          case _ => Nil
        }
      }
    val keyCols = left.rowKey
    def sideDf(mt: MatrixTable, tag: String) = {
      val others = mt.rows.columns
        .filterNot(c => keyCols.contains(c) || c == MatrixTable.EntriesField)
      mt.rows.select(
        (keyCols.map(col) :+
          struct(others.map(col): _*).as(s"${tag}_row") :+
          col(MatrixTable.EntriesField).as(s"__${tag}_e")): _*)
    }
    val joined = sideDf(left, "left")
      .join(sideDf(right, "right"), keyCols, "full_outer")
    val newEntries = array(keyIndices.map { case (_, li, ri) =>
      struct(
        li.map(i => try_element_at(col("__left_e"), lit(i + 1)))
          .getOrElse(lit(null)
            .cast(left.rows.schema(MatrixTable.EntriesField).dataType
              .asInstanceOf[ArrayType].elementType)).as("left_entry"),
        ri.map(i => try_element_at(col("__right_e"), lit(i + 1)))
          .getOrElse(lit(null)
            .cast(right.rows.schema(MatrixTable.EntriesField).dataType
              .asInstanceOf[ArrayType].elementType)).as("right_entry"))
    }: _*)
    val outRows = joined
      .withColumn(MatrixTable.EntriesField, newEntries)
      .drop("__left_e", "__right_e")
    val keyFields = left.colKey.zip(lKeyIdx).map { case (n, i) =>
      StructField(n, left.colSchema(i).dataType) }
    val outColSchema = StructType(keyFields ++ Seq(
      StructField("left_col", left.colSchema),
      StructField("right_col", right.colSchema)))
    val outColValues = keyIndices.map { case (k, li, ri) =>
      Row.fromSeq(k ++ Seq(
        li.map(left.colValues).orNull,
        ri.map(right.colValues).orNull))
    }.toIndexedSeq
    MatrixTable(outRows, left.rowKey, outColValues, outColSchema,
      left.colKey, left.globals ++ right.globals)
  }

  /** explode_trio_matrix: split a `Trios.trioMatrix` back into a
    * sample-keyed matrix — three output columns per trio (proband,
    * father, mother), each carrying that member's entry. Samples
    * appearing in several trios repeat, as in the reference. */
  def explodeTrioMatrix(tm: MatrixTable): MatrixTable = {
    val roles = Seq("proband_entry", "father_entry", "mother_entry")
    val newEntries = flatten(transform(tm.entries,
      e => array(roles.map(e(_)): _*)))
    val idIdx = Seq("id", "pat_id", "mat_id")
      .map(tm.colSchema.fieldIndex)
    val outColValues = tm.colValues.flatMap(r =>
      idIdx.map(i => Row(r.get(i)))).toIndexedSeq
    MatrixTable(
      rows = tm.rows.withColumn(MatrixTable.EntriesField, newEntries),
      rowKey = tm.rowKey,
      colValues = outColValues,
      colSchema = StructType(Seq(StructField("s", StringType))),
      colKey = Seq("s"),
      globals = tm.globals)
  }
}
