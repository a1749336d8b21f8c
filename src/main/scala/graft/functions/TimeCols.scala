package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.unix_micros

/** Timestamp-flavor-tolerant time helpers.
  *
  * The driver testdata has shipped `events.ts` as parquet TIMESTAMP(NANOS),
  * µs TIMESTAMP_NTZ, and µs UTC across regenerations; Spark 4's `unix_micros`
  * rejects NTZ outright (`DATATYPE_MISMATCH.UNEXPECTED_INPUT_TYPE`). Every
  * event-time site routes through [[eventMicros]] instead of a bare
  * `unix_micros(col)` so a future schema flavor degrades to a cast, not a
  * crash across every downstream query.
  */
object TimeCols {

  /** Exact epoch microseconds of a timestamp-ish column.
    *
    * `cast("timestamp")` is a no-op on `TimestampType` and a pure
    * reinterpretation under the session timezone (UTC here — Sessions.local
    * pins it) on `TIMESTAMP_NTZ` — the same normalization
    * [[graft.ops.AsOfJoin]] uses for its `asOfMicros` key. Codegen-friendly:
    * both Cast and UnixMicros are whole-stage-codegen expressions.
    */
  def eventMicros(c: Column): Column = unix_micros(c.cast("timestamp"))
}
