package graft.queries

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._

/** Join shapes J1-J10 from SURVEY.md §2.4, re-targeted onto the star schema
  * (FIXTURES.md §B: lineitem ≙ flights fact, supplier/nation ≙ airport/city
  * dims, customer via orders ≙ the second airport leg).
  *
  * Scale posture: every dim side is `broadcast()`-hinted (supplier ≤ sf·1k
  * rows, nation 25, region 5) so the fact table never shuffles for a dim
  * join; fact-fact joins (J6) shuffle on their keys once, and AQE handles
  * skew at real scale.
  */
object StarJoins {
  import Derived._

  val defs: Seq[QDef] = Seq(

    // J1 — fact ⋈ dim inner equi-join, broadcast (ref: flights⋈airports
    // src/delayed_flights.py:22-23). Both key columns kept, like the reference.
    QDef("j1_broadcast_dim",
      """SELECT l.l_orderkey, l.l_linenumber, l.l_suppkey, s.s_suppkey, s.s_name
        |FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |WHERE l.l_quantity > 45""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      val l = t.lineitem.filter(col("l_quantity") > 45)
      val sup = t.supplier
      l.join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
        .select("l_orderkey", "l_linenumber", "l_suppkey", "s_suppkey", "s_name")
    },

    // J2 — chained 3-table inner join with a pre-rename to avoid a column
    // clash (ref: flights⋈airports⋈airlines src/delayed_flights.py:95-100).
    QDef("j2_chain_two_dims",
      """SELECT n.n_name, CAST(count(*) AS BIGINT) AS cnt
        |FROM lineitem l
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |GROUP BY n.n_name""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      val sup = t.supplier.withColumnRenamed("s_nationkey", "nation_key")
      t.lineitem
        .join(broadcast(sup), col("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(t.nation), col("nation_key") === col("n_nationkey"))
        .groupBy("n_name").agg(count(lit(1)).as("cnt"))
    },

    // J3 — re-join a group-count back to detail rows, USING(key) emits a
    // single key column (ref: on="CITY" src/delayed_flights.py:39,109).
    QDef("j3_rejoin_using",
      """WITH det AS (
        |  SELECT l.l_orderkey, l.l_linenumber, l.l_quantity, n.n_name
        |  FROM lineitem l
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey),
        |c AS (SELECT n_name, count(*) AS num FROM det GROUP BY n_name)
        |SELECT det.n_name, det.l_orderkey, det.l_linenumber, c.num
        |FROM det JOIN c USING (n_name) WHERE det.l_quantity > 48""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      val det = t.lineitem
        .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "n_name")
      val c = det.groupBy("n_name").agg(count(lit(1)).as("num"))
      det.join(c, Seq("n_name"))
        .filter(col("l_quantity") > 48)
        .select("n_name", "l_orderkey", "l_linenumber", "num")
    },

    // J4 — inner USING(ROUTE) on a concat_ws-derived key (ref:
    // src/delayed_flights.py:174-190).
    QDef("j4_route_using",
      """WITH r AS (SELECT l_orderkey, l_linenumber, l_quantity,
        |    concat_ws('-', l_returnflag, l_linestatus) AS route FROM lineitem),
        |c AS (SELECT route, count(*) AS num FROM r GROUP BY route)
        |SELECT r.route, r.l_orderkey, r.l_linenumber, c.num
        |FROM r JOIN c USING (route) WHERE r.l_quantity > 48""".stripMargin) { (s, d) =>
      val r = Tables(s, d).lineitem
        .withColumn("route", concat_ws("-", col("l_returnflag"), col("l_linestatus")))
        .select("l_orderkey", "l_linenumber", "l_quantity", "route")
      val c = r.groupBy("route").agg(count(lit(1)).as("num"))
      r.join(broadcast(c), Seq("route"))
        .filter(col("l_quantity") > 48)
        .select("route", "l_orderkey", "l_linenumber", "num")
    },

    // J5 — aggregate ⋈ aggregate of the same base, USING(key) (ref:
    // src/delayed_flights.py:231-232). Kept as two aggregates + join to match
    // the reference shape; a11_fused_count_avg is the optimized single-pass form.
    QDef("j5_agg_join_agg",
      """WITH c AS (SELECT l_suppkey, count(*) AS cnt FROM lineitem GROUP BY l_suppkey),
        |a AS (SELECT l_suppkey, avg(l_quantity) AS avg_qty FROM lineitem GROUP BY l_suppkey)
        |SELECT c.l_suppkey, c.cnt, a.avg_qty FROM c JOIN a USING (l_suppkey)""".stripMargin) { (s, d) =>
      val li = Tables(s, d).lineitem
      val c = li.groupBy("l_suppkey").agg(count(lit(1)).as("cnt"))
      val a = li.groupBy("l_suppkey").agg(avg(col("l_quantity")).as("avg_qty"))
      c.join(a, Seq("l_suppkey")).select("l_suppkey", "cnt", "avg_qty")
    },

    // J6 — FULL OUTER join of two aggregates on different key families, then
    // coalesce the two key columns into one and fill nulls with 0 (ref: the
    // dep⟗arr airport merge src/delayed_flights.py:270-284).
    QDef("j6_full_outer_coalesce",
      """WITH dep AS (SELECT l_suppkey AS dep_key, CAST(sum(l_quantity) AS DOUBLE) AS dep_qty
        |  FROM lineitem GROUP BY l_suppkey),
        |arr AS (SELECT l_partkey % 150 AS arr_key, CAST(sum(l_quantity) AS DOUBLE) AS arr_qty
        |  FROM lineitem WHERE (l_partkey % 150) NOT BETWEEN 10 AND 19 GROUP BY 1)
        |SELECT coalesce(dep_key, arr_key) AS merged_key,
        |  coalesce(dep_qty, 0) AS dep_qty, coalesce(arr_qty, 0) AS arr_qty
        |FROM dep FULL OUTER JOIN arr ON dep.dep_key = arr.arr_key""".stripMargin) { (s, d) =>
      val li = Tables(s, d).lineitem
      val dep = li.groupBy(col("l_suppkey").as("dep_key"))
        .agg(sum(col("l_quantity")).as("dep_qty"))
      val arr = li.filter(!(col("l_partkey") % 150).between(10, 19))
        .groupBy((col("l_partkey") % 150).as("arr_key"))
        .agg(sum(col("l_quantity")).as("arr_qty"))
      dep.join(arr, col("dep_key") === col("arr_key"), "outer")
        .select(coalesce(col("dep_key"), col("arr_key")).as("merged_key"),
          col("dep_qty"), col("arr_qty"))
        .na.fill(0, Seq("dep_qty", "arr_qty"))
    },

    // J7 — LEFT OUTER to a dimension; unmatched rows keep a null dim value and
    // form their own group downstream (ref: src/delayed_flights.py:287-296).
    QDef("j7_left_outer_dim",
      """SELECT s.s_name, CAST(count(*) AS BIGINT) AS cnt
        |FROM customer c LEFT JOIN supplier s ON c.c_custkey = s.s_suppkey
        |GROUP BY s.s_name""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      t.customer
        .join(broadcast(t.supplier), col("c_custkey") === col("s_suppkey"), "left")
        .groupBy("s_name").agg(count(lit(1)).as("cnt"))
    },

    // J8 — full outer USING(hour) of two hourly aggregates (ref:
    // src/delayed_flights.py:470).
    QDef("j8_full_outer_using_hour",
      """WITH a AS (SELECT CAST(hour(ts) AS INT) AS h, count(*) AS clicks
        |  FROM events WHERE event_type = 'click' AND value > 4.0 GROUP BY 1),
        |b AS (SELECT CAST(hour(ts) AS INT) AS h, count(*) AS views
        |  FROM events WHERE event_type = 'view' AND value > 4.5 GROUP BY 1)
        |SELECT h, a.clicks, b.views FROM a FULL OUTER JOIN b USING (h)""".stripMargin) { (s, d) =>
      val ev = Tables(s, d).events
      val a = ev.filter(col("event_type") === "click" && col("value") > 4.0)
        .groupBy(hour(col("ts")).as("h")).agg(count(lit(1)).as("clicks"))
      val b = ev.filter(col("event_type") === "view" && col("value") > 4.5)
        .groupBy(hour(col("ts")).as("h")).agg(count(lit(1)).as("views"))
      a.join(b, Seq("h"), "outer").select("h", "clicks", "views")
    },

    // J9 — full outer on DIFFERENTLY-NAMED keys; both key columns survive
    // (ref: HOUR == HOUR_OF_DAY src/delayed_flights.py:486).
    QDef("j9_full_outer_diff_keys",
      """WITH a AS (SELECT CAST(hour(ts) AS INT) AS h, count(*) AS cnt
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |b AS (SELECT CAST(hour(ts) AS INT) AS hour_of_day, round(avg(value), 6) AS avg_value
        |  FROM events WHERE event_type = 'signup' AND value > 2.5 GROUP BY 1)
        |SELECT a.h, a.cnt, b.hour_of_day, b.avg_value
        |FROM a FULL OUTER JOIN b ON a.h = b.hour_of_day""".stripMargin) { (s, d) =>
      val ev = Tables(s, d).events
      val a = ev.filter(col("event_type") === "purchase")
        .groupBy(hour(col("ts")).as("h")).agg(count(lit(1)).as("cnt"))
      val b = ev.filter(col("event_type") === "signup" && col("value") > 2.5)
        .groupBy(hour(col("ts")).as("hour_of_day")).agg(round(avg(col("value")), 6).as("avg_value"))
      a.join(b, col("h") === col("hour_of_day"), "outer")
        .select("h", "cnt", "hour_of_day", "avg_value")
    },

    // J10 — the same dimension joined twice (origin & dest legs) with
    // order-sensitive sequential renames: the first n_name is renamed away
    // BEFORE the second join re-introduces n_name (ref: rename-after-USING
    // src/graphframes_flights.py:98-102).
    QDef("j10_double_dim_rename_order",
      """WITH fact AS (
        |  SELECT c.c_nationkey AS orig_key, s.s_nationkey AS dest_key
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey)
        |SELECT n1.n_name AS orig_nation, n2.n_name AS dest_nation, CAST(count(*) AS BIGINT) AS cnt
        |FROM fact
        |JOIN nation n1 ON fact.orig_key = n1.n_nationkey
        |JOIN nation n2 ON fact.dest_key = n2.n_nationkey
        |GROUP BY 1, 2""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      val fact = t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
        .select(col("c_nationkey").as("orig_key"), col("s_nationkey").as("dest_key"))
      val origDim = t.nation.withColumnRenamed("n_nationkey", "orig_key")
      val destDim = t.nation.withColumnRenamed("n_nationkey", "dest_key")
      fact
        .join(broadcast(origDim), Seq("orig_key"))
        .withColumnRenamed("n_name", "orig_nation") // consumes the FIRST n_name
        .join(broadcast(destDim), Seq("dest_key"))
        .withColumnRenamed("n_name", "dest_nation") // renames the one just added
        .groupBy("orig_nation", "dest_nation").agg(count(lit(1)).as("cnt"))
    }
  )
}
