package graft.queries

import graft.{QDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared derivations used by many registered queries.
  *
  * The driver testdata (TPC-H-ish) has no NULLs and no HHMM-coded times, so
  * the null-semantics and date-rebuild operators of the reference
  * (`/root/reference/src/preprocessing.py:28-72`, `src/delayed_flights.py:403`)
  * are exercised over deterministically *synthesized* nullable / HHMM columns.
  * The exact same expressions appear in the DuckDB oracle SQL — keep the two
  * in lockstep.
  */
object Derived {

  /** lineitem + three deterministic nullable columns (~20% nulls each). */
  def lineitemN(t: Tables): DataFrame =
    t.lineitem
      .withColumn("qty_n", when(col("l_quantity").between(20, 29), lit(null)).otherwise(col("l_quantity")))
      .withColumn("price_n", when(col("l_discount") > 0.07, lit(null)).otherwise(col("l_extendedprice")))
      .withColumn("flag_n", nullif(col("l_returnflag"), lit("A")))

  /** SQL CTE body equivalent to [[lineitemN]] (DuckDB). */
  val NullsCte: String =
    """lineitem_n AS (
      |  SELECT *,
      |    CASE WHEN l_quantity BETWEEN 20 AND 29 THEN NULL ELSE l_quantity END AS qty_n,
      |    CASE WHEN l_discount > 0.07 THEN NULL ELSE l_extendedprice END AS price_n,
      |    nullif(l_returnflag, 'A') AS flag_n
      |  FROM lineitem)""".stripMargin

  /** Synthetic HHMM-coded clock int (0..2559 — includes invalid hours like the
    * reference's "2400" midnight coding) plus month/day parts, mirroring the
    * Kaggle flights schema (`/root/reference/src/preprocessing.py:39-42`). */
  def withHhmm(df: DataFrame): DataFrame =
    df.withColumn("hhmm", ((col("l_suppkey") * 7 + col("l_partkey") * 13 + col("l_linenumber")) % 2560).cast("int"))
      .withColumn("mo", ((col("l_partkey") % 12) + 1).cast("int"))
      .withColumn("dy", ((col("l_orderkey") % 28) + 1).cast("int"))

  val HhmmCte: String =
    """lineitem_h AS (
      |  SELECT *,
      |    CAST((l_suppkey * 7 + l_partkey * 13 + l_linenumber) % 2560 AS INT) AS hhmm,
      |    CAST((l_partkey % 12) + 1 AS INT) AS mo,
      |    CAST((l_orderkey % 28) + 1 AS INT) AS dy
      |  FROM lineitem)""".stripMargin

  /** "YYYY-MM-DD HH:MM:00" rebuild, null-propagating concat — the reference's
    * `__conc_date` (`/root/reference/src/preprocessing.py:28-53`). */
  def dateStr: Column = {
    val padded = lpad(col("hhmm").cast("string"), 4, "0")
    concat(
      lit("2015-"), lpad(col("mo").cast("string"), 2, "0"),
      lit("-"), lpad(col("dy").cast("string"), 2, "0"),
      lit(" "), padded.substr(1, 2), lit(":"), padded.substr(3, 2), lit(":00"))
  }

  val DateStrSql: String =
    "('2015-' || lpad(CAST(mo AS VARCHAR), 2, '0') || '-' || lpad(CAST(dy AS VARCHAR), 2, '0') || ' ' || " +
      "substr(lpad(CAST(hhmm AS VARCHAR), 4, '0'), 1, 2) || ':' || substr(lpad(CAST(hhmm AS VARCHAR), 4, '0'), 3, 2) || ':00')"
}

/** Sources/sinks (S), projections (P), filters (F) from SURVEY.md §2.1-2.3.
  * Each query is a standalone `(spark, sfDir) => DataFrame` registered with a
  * DuckDB oracle. Scale notes are on each op — these all run scan-local
  * (no shuffle) except where noted.
  */
object StarCore {
  import Derived._

  val defs: Seq[QDef] = Seq(

    // S1 — parquet scan with projection+filter pushed down to the source
    // (ref: CSV scan main.py:24-29; we declare schemas instead of inferring).
    // Plan check: PushedFilters + 3-column ReadSchema, no full-width scan.
    QDef("s1_scan_pruned",
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity > 45") {
      (s, d) => Tables(s, d).lineitem
        .filter(col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    },

    // S2 — the reference's `df.show()` 20-row console grid (src/preprocessing.py:26)
    // as a deterministic top-20. TakeOrderedAndProject, no full sort.
    QDef("s2_show_grid",
      "SELECT * FROM supplier ORDER BY s_suppkey LIMIT 20") {
      (s, d) => Tables(s, d).supplier.orderBy("s_suppkey").limit(20)
    },

    // S3 — collect-to-client surface (toPandas sites): engine returns the full
    // (small) result; driver materializes. Dimension-sized only — never the fact.
    QDef("s3_collect_result",
      "SELECT n_nationkey, n_name, n_regionkey FROM nation") {
      (s, d) => Tables(s, d).nation.select("n_nationkey", "n_name", "n_regionkey")
    },

    // P1 — null-count per column in ONE single-row aggregate pass
    // (ref: src/preprocessing.py:19-20). One job, no per-column scans.
    QDef("p1_null_profile",
      s"""WITH ${NullsCte}
         |SELECT
         |  count(CASE WHEN qty_n IS NULL THEN 1 END) AS qty_n,
         |  count(CASE WHEN price_n IS NULL THEN 1 END) AS price_n,
         |  count(CASE WHEN flag_n IS NULL THEN 1 END) AS flag_n,
         |  count(CASE WHEN l_orderkey IS NULL THEN 1 END) AS l_orderkey
         |FROM lineitem_n""".stripMargin) { (s, d) =>
      val df = lineitemN(Tables(s, d))
      val cols = Seq("qty_n", "price_n", "flag_n", "l_orderkey")
      df.select(cols.map(c => count(when(col(c).isNull, c)).as(c)): _*)
    },

    // A1 — the same single-row null-count aggregate, registered under the
    // aggregation row id too (SURVEY §2.5 A1 = §2.2 P1).
    QDef("a1_null_count_agg",
      s"""WITH ${NullsCte}
         |SELECT
         |  count(CASE WHEN qty_n IS NULL THEN 1 END) AS qty_n,
         |  count(CASE WHEN price_n IS NULL THEN 1 END) AS price_n,
         |  count(CASE WHEN flag_n IS NULL THEN 1 END) AS flag_n
         |FROM lineitem_n""".stripMargin) { (s, d) =>
      val df = lineitemN(Tables(s, d))
      val cols = Seq("qty_n", "price_n", "flag_n")
      df.select(cols.map(c => count(when(col(c).isNull, c)).as(c)): _*)
    },

    // P2 — null percentage per column (ref: src/preprocessing.py:24-25).
    QDef("p2_null_pct",
      s"""WITH ${NullsCte}
         |SELECT
         |  count(CASE WHEN qty_n IS NULL THEN 1 END) / count(*) * 100 AS qty_n,
         |  count(CASE WHEN price_n IS NULL THEN 1 END) / count(*) * 100 AS price_n,
         |  count(CASE WHEN flag_n IS NULL THEN 1 END) / count(*) * 100 AS flag_n
         |FROM lineitem_n""".stripMargin) { (s, d) =>
      val df = lineitemN(Tables(s, d))
      val total = count(lit(1))
      val cols = Seq("qty_n", "price_n", "flag_n")
      df.select(cols.map(c => (count(when(col(c).isNull, c)) / total * 100).as(c)): _*)
    },

    // P3 — withColumn derived metric (ref: ~20 withColumn sites, e.g.
    // src/delayed_flights.py:46-49). Single deterministic FP op chain — exact.
    QDef("p3_derived_cols",
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  l_extendedprice * (1 - l_discount) AS net_price
        |FROM lineitem WHERE l_quantity > 45""".stripMargin) {
      (s, d) => Tables(s, d).lineitem
        .filter(col("l_quantity") > 45)
        .withColumn("net_price", col("l_extendedprice") * (lit(1) - col("l_discount")))
        .select("l_orderkey", "l_linenumber", "l_quantity", "net_price")
    },

    // P4 — lenient multi-drop: names that don't exist are silently ignored
    // (ref: src/preprocessing.py:85-88 drops conditionally-present columns).
    QDef("p4_lenient_drop",
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
        |  l_extendedprice, l_discount, l_returnflag, l_linestatus, l_shipdate
        |FROM lineitem WHERE l_quantity > 48""".stripMargin) {
      (s, d) => Tables(s, d).lineitem
        .filter(col("l_quantity") > 48)
        .drop("l_tax", "no_such_column", "also_missing", "l_tax")
    },

    // P5 — withColumnRenamed before joins (ref: src/delayed_flights.py:95-96).
    QDef("p5_rename",
      "SELECT s_suppkey, s_name AS supplier_name, s_nationkey AS nation_key FROM supplier") {
      (s, d) => Tables(s, d).supplier
        .withColumnRenamed("s_name", "supplier_name")
        .withColumnRenamed("s_nationkey", "nation_key")
        .select("s_suppkey", "supplier_name", "nation_key")
    },

    // P6 — star-expansion select: df["*"] plus one aliased column from the
    // join partner (ref: src/delayed_flights.py:137-140). Broadcast join.
    QDef("p6_star_expand",
      """SELECT l.*, s.s_name AS supplier_name
        |FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |WHERE l.l_quantity > 48""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      val l = t.lineitem.filter(col("l_quantity") > 48)
      val sup = t.supplier
      l.join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
        .select(l.col("*") +: Seq(sup("s_name").as("supplier_name")): _*)
    },

    // P7 — DataFrame alias qualifiers for a self-join (ref: dep/arr/air
    // aliases src/delayed_flights.py:265-267). Self-join shuffles once on
    // l_orderkey; both sides share the exchange (ReusedExchange).
    QDef("p7_alias_selfjoin",
      """SELECT a.l_orderkey AS l_orderkey, a.l_linenumber AS ln_a, b.l_linenumber AS ln_b,
        |  a.l_quantity + b.l_quantity AS qty_sum
        |FROM lineitem a JOIN lineitem b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      val a = t.lineitem.as("a")
      val b = t.lineitem.as("b")
      a.join(b, col("a.l_orderkey") === col("b.l_orderkey") && col("a.l_linenumber") < col("b.l_linenumber"))
        .select(col("a.l_orderkey").as("l_orderkey"), col("a.l_linenumber").as("ln_a"),
          col("b.l_linenumber").as("ln_b"), (col("a.l_quantity") + col("b.l_quantity")).as("qty_sum"))
    },

    // F1 — equality filter: the reference's CANCELLED==1/==0 dataset split
    // (src/preprocessing.py:78-79) ≙ o_orderstatus = 'F'. Pushed to the scan.
    QDef("f1_eq_filter",
      "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus = 'F'") {
      (s, d) => Tables(s, d).orders
        .filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    },

    // F3 — strict-positive filter (ref: DEPARTURE_DELAY > 0, src/delayed_flights.py:370).
    QDef("f3_gt_filter",
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity > 25") {
      (s, d) => Tables(s, d).lineitem
        .filter(col("l_quantity") > 25)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    },

    // F4 — null-safe 3-valued disjunction: row kept iff either side is TRUE
    // (null OR true = true; null OR false = null → dropped). Ref:
    // src/delayed_flights.py:403.
    QDef("f4_disjunction_3vl",
      s"""WITH ${NullsCte}
         |SELECT l_orderkey, l_linenumber, qty_n, price_n FROM lineitem_n
         |WHERE (qty_n > 40) OR (price_n > 90000)""".stripMargin) { (s, d) =>
      lineitemN(Tables(s, d))
        .filter(col("qty_n") > 40 || col("price_n") > 90000)
        .select("l_orderkey", "l_linenumber", "qty_n", "price_n")
    },

    // F5 — na.drop on a subset of columns (ref: dropna(subset=["ELAPSED_TIME"])
    // src/preprocessing.py:119).
    QDef("f5_dropna_subset",
      s"""WITH ${NullsCte}
         |SELECT l_orderkey, l_linenumber, qty_n FROM lineitem_n WHERE qty_n IS NOT NULL""".stripMargin) {
      (s, d) => lineitemN(Tables(s, d))
        .na.drop(Seq("qty_n"))
        .select("l_orderkey", "l_linenumber", "qty_n")
    },

    // F6 — isNull inside a conditional count, grouped (ref: src/preprocessing.py:20).
    QDef("f6_isnull_count",
      s"""WITH ${NullsCte}
         |SELECT l_returnflag, count(CASE WHEN price_n IS NULL THEN 1 END) AS null_price_cnt
         |FROM lineitem_n GROUP BY l_returnflag""".stripMargin) {
      (s, d) => lineitemN(Tables(s, d))
        .groupBy("l_returnflag")
        .agg(count(when(col("price_n").isNull, 1)).as("null_price_cnt"))
    },

    // C1 — lpad with explicit int→string cast (ref: src/preprocessing.py:35-40;
    // PySpark auto-casts, Scala must cast explicitly).
    QDef("c1_lpad",
      s"""WITH ${HhmmCte}
         |SELECT l_orderkey, l_linenumber, hhmm,
         |  lpad(CAST(hhmm AS VARCHAR), 4, '0') AS hhmm_pad
         |FROM lineitem_h WHERE l_quantity > 45""".stripMargin) {
      (s, d) => withHhmm(Tables(s, d).lineitem)
        .filter(col("l_quantity") > 45)
        .withColumn("hhmm_pad", lpad(col("hhmm").cast("string"), 4, "0"))
        .select("l_orderkey", "l_linenumber", "hhmm", "hhmm_pad")
    },

    // C2 — 1-based substr split of "HHMM" → HH, MM (ref: src/preprocessing.py:41-42).
    QDef("c2_substr",
      s"""WITH ${HhmmCte}
         |SELECT l_orderkey, l_linenumber,
         |  substr(lpad(CAST(hhmm AS VARCHAR), 4, '0'), 1, 2) AS hh,
         |  substr(lpad(CAST(hhmm AS VARCHAR), 4, '0'), 3, 2) AS mi
         |FROM lineitem_h WHERE l_quantity > 45""".stripMargin) { (s, d) =>
      val padded = lpad(col("hhmm").cast("string"), 4, "0")
      withHhmm(Tables(s, d).lineitem)
        .filter(col("l_quantity") > 45)
        .withColumn("hh", padded.substr(1, 2))
        .withColumn("mi", padded.substr(3, 2))
        .select("l_orderkey", "l_linenumber", "hh", "mi")
    },

    // C3 — null-PROPAGATING concat: any null operand → null result (ref:
    // src/preprocessing.py:45-49). Note: DuckDB's concat() skips nulls, so the
    // oracle uses the null-propagating || operator.
    QDef("c3_concat_nullprop",
      s"""WITH ${NullsCte}
         |SELECT l_orderkey, l_linenumber,
         |  ('K-' || flag_n || '-' || l_linestatus) AS tag
         |FROM lineitem_n WHERE l_quantity > 45""".stripMargin) {
      (s, d) => lineitemN(Tables(s, d))
        .filter(col("l_quantity") > 45)
        .withColumn("tag", concat(lit("K-"), col("flag_n"), lit("-"), col("l_linestatus")))
        .select("l_orderkey", "l_linenumber", "tag")
    },

    // C4 — literals (ref: lit sites throughout).
    QDef("c4_lit",
      "SELECT l_orderkey, l_linenumber, 1 AS one, 'x' AS tag FROM lineitem WHERE l_quantity > 48") {
      (s, d) => Tables(s, d).lineitem
        .filter(col("l_quantity") > 48)
        .select(col("l_orderkey"), col("l_linenumber"), lit(1).as("one"), lit("x").as("tag"))
    },

    // C5 — to_timestamp with null-on-error, incl. the "2400" invalid-hour
    // case (ref: src/preprocessing.py:52-53). Spark 4 defaults ANSI on (which
    // would throw), so the engine uses try_to_timestamp — same null-on-error
    // semantics as PySpark 3.5's legacy to_timestamp.
    QDef("c5_try_to_timestamp",
      s"""WITH ${HhmmCte}
         |SELECT l_orderkey, l_linenumber, hhmm,
         |  try_strptime(${Derived.DateStrSql}, '%Y-%m-%d %H:%M:%S') AS sched_ts
         |FROM lineitem_h WHERE l_quantity > 45""".stripMargin) {
      (s, d) => withHhmm(Tables(s, d).lineitem)
        .filter(col("l_quantity") > 45)
        .withColumn("sched_ts", try_to_timestamp(dateStr, lit("yyyy-MM-dd HH:mm:ss")))
        .select("l_orderkey", "l_linenumber", "hhmm", "sched_ts")
    },

    // C6 — hour() extraction from a timestamp (ref: src/delayed_flights.py:367).
    QDef("c6_hour",
      "SELECT event_id, CAST(hour(ts) AS INT) AS h FROM events WHERE value > 4.5") {
      (s, d) => Tables(s, d).events
        .filter(col("value") > 4.5)
        .select(col("event_id"), hour(col("ts")).as("h"))
    },

    // C7 — concat_ws: null-SKIPPING join of parts (unlike concat) — the
    // reference's ROUTE key (src/delayed_flights.py:174-175).
    QDef("c7_concat_ws",
      s"""WITH ${NullsCte}
         |SELECT l_orderkey, l_linenumber,
         |  concat_ws('-', l_returnflag, flag_n, l_linestatus) AS route
         |FROM lineitem_n WHERE l_quantity > 45""".stripMargin) {
      (s, d) => lineitemN(Tables(s, d))
        .filter(col("l_quantity") > 45)
        .withColumn("route", concat_ws("-", col("l_returnflag"), col("flag_n"), col("l_linestatus")))
        .select("l_orderkey", "l_linenumber", "route")
    },

    // C8 — coalesce with a fallback (ref: src/delayed_flights.py:275,283).
    QDef("c8_coalesce",
      s"""WITH ${NullsCte}
         |SELECT l_orderkey, l_linenumber, coalesce(qty_n, -1.0) AS qty_filled
         |FROM lineitem_n WHERE l_quantity > 45""".stripMargin) {
      (s, d) => lineitemN(Tables(s, d))
        .filter(col("l_quantity") > 45)
        .withColumn("qty_filled", coalesce(col("qty_n"), lit(-1.0)))
        .select("l_orderkey", "l_linenumber", "qty_filled")
    },

    // C9 — na.fill(0) over a nullable numeric column (ref: src/delayed_flights.py:284).
    QDef("c9_na_fill",
      s"""WITH ${NullsCte}
         |SELECT l_orderkey, l_linenumber, coalesce(qty_n, 0) AS qty_n
         |FROM lineitem_n WHERE l_quantity > 45""".stripMargin) {
      (s, d) => lineitemN(Tables(s, d))
        .filter(col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "qty_n")
        .na.fill(0, Seq("qty_n"))
    },

    // C10 — percentage-of-total arithmetic (ref: src/preprocessing.py:25,
    // src/delayed_flights.py:151-152). Integer counts → exact double division.
    QDef("c10_pct_arith",
      """WITH c AS (SELECT l_returnflag, count(*) AS cnt FROM lineitem GROUP BY l_returnflag),
        |     t AS (SELECT sum(cnt) AS total FROM c)
        |SELECT l_returnflag, cnt, cnt / total * 100 AS pct FROM c, t""".stripMargin) { (s, d) =>
      val c = Tables(s, d).lineitem.groupBy("l_returnflag").agg(count(lit(1)).as("cnt"))
      val t = c.agg(sum(col("cnt")).as("total"))
      c.crossJoin(broadcast(t)).select(col("l_returnflag"), col("cnt"), (col("cnt") / col("total") * 100).as("pct"))
    },

    // C12 — dict decode via a map literal + fallback for unmapped codes (ref:
    // pandas map+fillna src/delayed_flights.py:385-400 pulled into Spark).
    // try_element_at (ANSI-safe) + coalesce ≙ map...fillna(original).
    QDef("c12_dict_decode",
      """SELECT CASE n_regionkey
        |    WHEN 0 THEN 'AFRICA' WHEN 1 THEN 'AMERICA' WHEN 2 THEN 'ASIA' WHEN 3 THEN 'EUROPE'
        |    ELSE CAST(n_regionkey AS VARCHAR) END AS region_name,
        |  CAST(count(*) AS BIGINT) AS cnt
        |FROM nation GROUP BY 1""".stripMargin) { (s, d) =>
      val decode = typedLit(Map(0 -> "AFRICA", 1 -> "AMERICA", 2 -> "ASIA", 3 -> "EUROPE"))
      Tables(s, d).nation
        .withColumn("region_name",
          coalesce(try_element_at(decode, col("n_regionkey")), col("n_regionkey").cast("string")))
        .groupBy("region_name").agg(count(lit(1)).as("cnt"))
    },

    // U1 — positional union + distinct (ref: state vertex set,
    // src/graphframes_flights.py:108-109). Two scans + one shuffle for the dedup.
    QDef("u1_union_distinct",
      """SELECT s_nationkey AS nation_key FROM supplier
        |UNION
        |SELECT c_nationkey FROM customer""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      t.supplier.select(col("s_nationkey").as("nation_key"))
        .union(t.customer.select(col("c_nationkey")))
        .distinct()
    }
  )
}
