package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap join: pairs of rows whose [start, end] intervals
  * intersect — the temporal/spatial join behind incident correlation,
  * session concurrency, and reservation-conflict queries.
  *
  * The naive formulation is a theta join (`l.start <= r.end AND r.start <=
  * l.end`) which Spark can only plan as a broadcast nested loop or a
  * cartesian product — O(|L|·|R|) at 100 TB. This implementation buckets
  * time into fixed `cellMicros` grid cells, explodes each interval to the
  * cells it touches, equi-joins on the cell, verifies the exact overlap
  * predicate, and dedups pairs that met in several cells:
  *
  *   cost = Σ_cell |L_cell|·|R_cell|  — local density, not corpus².
  *
  * The cell join is a plain shuffled equi-join, so it broadcasts/salts/AQE-
  * splits like any other; cell width trades replication (long intervals
  * touch more cells) against selectivity (wide cells pair more non-
  * overlapping rows). Replication factor = avg(interval/cell) + 1.
  */
object IntervalJoin {

  /** Overlapping (l, r) id pairs. Inputs carry (idCol, startCol, endCol) in
    * exact integer units (micros); `extraPred` optionally restricts pairs
    * and must reference the sides through the `l.` / `r.` aliases (e.g.
    * `col("l.user_id") =!= col("r.user_id")`). Inclusive bounds both ends. */
  def overlapPairs(left: DataFrame, right: DataFrame,
      idCol: String, startCol: String, endCol: String,
      cellMicros: Long,
      extraPred: org.apache.spark.sql.Column = lit(true)): DataFrame = {
    require(cellMicros > 0, s"cellMicros must be positive: $cellMicros")
    // integer-exact cell indices via `div` — TRUNCATING division toward
    // zero, not floor: for negative (pre-epoch) micros cell 0 is double-
    // width and cells below zero shift by one. Candidate-generation
    // correctness only needs the cell map to be monotonic non-decreasing
    // (overlapping intervals always share ≥1 cell, and the exact overlap
    // predicate below re-verifies every candidate pair), which truncation
    // satisfies; only the replication-factor estimate in the Scaladoc is
    // approximate around zero.
    def cells(df: DataFrame): DataFrame = df.withColumn("_cell",
      explode(sequence(expr(s"$startCol div $cellMicros"),
        expr(s"$endCol div $cellMicros"))))
    val l = cells(left).as("l")
    val r = cells(right).as("r")
    l.join(r,
        col("l._cell") === col("r._cell") &&
        col(s"l.$startCol") <= col(s"r.$endCol") &&
        col(s"r.$startCol") <= col(s"l.$endCol") &&
        extraPred)
      .select(col(s"l.$idCol").as("a"), col(s"r.$idCol").as("b"))
      .distinct() // intervals spanning several cells meet more than once
  }
}
