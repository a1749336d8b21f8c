package graft.queries

import org.apache.spark.sql.functions._

import graft.{QDef, Tables}
import graft.ops.Scd

/** SCD Type-2 / CDC queries over the `events` table — each user's
  * event_type stream read as a change log of a one-attribute dimension.
  * The oracle replays the lag-dedup + lead-versioning in SQL; the merge
  * query proves the incremental form equals a from-scratch rebuild.
  */
object Cdc {

  /** Shared oracle chain: ordered log → consecutive-dedup → versioned
    * history `hist(user_id, state, valid_from, valid_to)`. */
  private val HistCtes =
    """ordered AS (
      |  SELECT user_id, event_type, ts, event_id,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events),
      |ded AS (
      |  SELECT user_id, event_type, ts, event_id FROM ordered
      |  WHERE prev IS NULL OR prev <> event_type),
      |hist AS (
      |  SELECT user_id, event_type AS state, ts AS valid_from,
      |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
      |  FROM ded)""".stripMargin

  private val HistSelect =
    """SELECT user_id, state, valid_from, valid_to,
      |  valid_to IS NULL AS is_current FROM hist""".stripMargin

  /** CDC batch boundary for the merge query (events span 2024-01). */
  private val SplitTs = "2024-01-20 00:00:00"

  val defs: Seq[QDef] = Seq(

    // SCD2 history build: the full change log versioned in one keyed
    // window pass (consecutive equal states collapse; valid_to = next
    // change; open versions flagged current).
    QDef("x_scd2_history",
      s"""WITH $HistCtes
         |$HistSelect""".stripMargin) { (s, d) =>
      Scd.scd2FromLog(Tables(s, d).events, "user_id", "event_type", "ts",
        "event_id")
        .withColumnRenamed("event_type", "state")
    },

    // Incremental CDC merge == batch rebuild: the engine builds history
    // from events BEFORE the split, then merges the later events as a CDC
    // batch; the oracle builds the whole history in one shot. Equality
    // proves the merge semantics exactly (boundary no-op dedup, version
    // close-out, new keys).
    QDef("x_scd2_merge",
      s"""WITH $HistCtes
         |$HistSelect""".stripMargin) { (s, d) =>
      val ev = Tables(s, d).events
      val split = expr(s"timestamp'$SplitTs'")
      val hist = Scd.scd2FromLog(ev.filter(col("ts") < split),
        "user_id", "event_type", "ts", "event_id")
      Scd.scd2Merge(hist, ev.filter(col("ts") >= split),
        "user_id", "event_type", "ts", "event_id")
        .withColumnRenamed("event_type", "state")
    },

    // Point-in-time (time-travel) lookup: every user's state in force at
    // the probe instant — the query an SCD2 table exists to answer.
    QDef("x_scd2_asof",
      s"""WITH $HistCtes
         |SELECT user_id, state, valid_from FROM hist
         |WHERE valid_from <= timestamp'$SplitTs'
         |  AND (valid_to IS NULL OR valid_to > timestamp'$SplitTs')""".stripMargin) { (s, d) =>
      val hist = Scd.scd2FromLog(Tables(s, d).events, "user_id", "event_type",
        "ts", "event_id")
      Scd.stateAsOf(hist, expr(s"timestamp'$SplitTs'"))
        .select(col("user_id"), col("event_type").as("state"),
          col("valid_from"))
    }
  )
}
