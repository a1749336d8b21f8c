package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (SCD Type 2) maintenance from a CDC change
  * log — the warehouse pattern that keeps FULL attribute history as
  * (valid_from, valid_to, is_current) versioned rows instead of
  * overwriting in place.
  *
  * Scale shape: [[scd2FromLog]] is ONE shuffle on the dimension key plus a
  * linear window pass (lag/lead state is O(1) per row) — the same cost as
  * any keyed aggregate. [[scd2Merge]] is the incremental form: each new CDC
  * batch re-windows only `current ∪ batch` rows (|keys| + |batch|), never
  * touching the closed history — at 100 TB the history is append-only
  * cold data and the working set stays proportional to the batch. The
  * merge's correctness contract is exact equality with a from-scratch
  * rebuild over the concatenated log (`x_scd2_merge` proves
  * `merge(fromLog(log < T), log ≥ T) == fromLog(log)` against DuckDB).
  *
  * Assumption (standard for CDC): batches arrive in time order — every
  * change in a batch is newer than every already-applied change. Late data
  * breaks any incremental SCD2 and needs a rebuild of the affected keys.
  */
object Scd {

  /** Versioned SCD2 history from a change log `(key, state, ts, tiebreak)`:
    * one row per state RUN — consecutive equal states collapse into the
    * earliest row (lag-dedup), then `valid_to` = next surviving change's ts
    * (lead), open versions have `valid_to` NULL / `is_current` true.
    * `tiebreak` makes equal-ts ordering deterministic. */
  def scd2FromLog(log: DataFrame, key: String, state: String, ts: String,
      tiebreak: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tiebreak))
    log.select(col(key), col(state), col(ts), col(tiebreak))
      .withColumn("__prev", lag(col(state), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col(state))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .select(col(key), col(state), col(ts).as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }

  /** Apply one CDC batch to an existing SCD2 table: closed versions pass
    * through untouched; each key's OPEN version re-enters the window as a
    * pseudo-change at its own `valid_from` (tiebreak −1 so it sorts before
    * any real change at the same instant) together with the key's incoming
    * changes, and [[scd2FromLog]] re-versions that small union. A batch
    * whose first change repeats the current state is a no-op for that
    * version (the lag-dedup absorbs it across the boundary), which is what
    * makes the result bit-identical to a full rebuild. */
  def scd2Merge(hist: DataFrame, changes: DataFrame, key: String,
      state: String, ts: String, tiebreak: String): DataFrame = {
    val closed = hist.filter(!col("is_current"))
      .select(col(key), col(state), col("valid_from"), col("valid_to"),
        col("is_current"))
    val carryIn = hist.filter(col("is_current"))
      .select(col(key), col(state), col("valid_from").as(ts),
        lit(-1L).as(tiebreak))
    val incoming = changes
      .select(col(key), col(state), col(ts), col(tiebreak).cast("long"))
    closed.unionByName(
      scd2FromLog(carryIn.unionByName(incoming), key, state, ts, tiebreak))
  }

  /** Point-in-time (time-travel) view: each key's version in force at
    * instant `at` — `valid_from ≤ at < valid_to` with NULL valid_to = ∞.
    * A layout note for 100 TB: this predicate prunes on valid_from if the
    * history is range-clustered on it ([[ScaleLayout.writeSorted]]). */
  def stateAsOf(hist: DataFrame, at: Column): DataFrame =
    hist.filter(col("valid_from") <= at &&
      (col("valid_to").isNull || col("valid_to") > at))
}
