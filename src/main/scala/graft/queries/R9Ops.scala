package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QDef, Tables}
import graft.ops.Skyline

/** Round-9 additions: market-basket association rules, Markov event
  * transitions, cohort retention matrices, an exact distribute-then-merge
  * 2-D skyline, and a one-pass correlation matrix — the classic OLAP
  * analytics shapes the surface didn't yet cover, each oracle-paired.
  */
object R9Ops {

  def defs: Seq[QDef] = Seq(

    // Market-basket association rules over orders: items = the DISTINCT
    // part brands in each order, rules = brand pairs with support ≥ 40
    // scored by confidence and lift. The scale shape: after the distinct,
    // ONE groupBy collapses each basket to its sorted item array and the
    // pair expansion happens IN-ROW (bounded by basket size squared — no
    // basket self-join shuffling the corpus twice); the item-frequency and
    // order-count frames are item-/1-row-sized broadcasts. At 100 TB the
    // only corpus exchanges are the basket collapse and the pair aggregate,
    // both map-side-combined; a hot item inflates no bucket because pairs
    // are keyed by (item_a, item_b), not by item.
    QDef("x_basket_pairs",
      """WITH items AS (
        |  SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS item
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |n AS (SELECT CAST(count(DISTINCT o) AS DOUBLE) AS n_orders FROM items),
        |ic AS (SELECT item, CAST(count(*) AS DOUBLE) AS c FROM items GROUP BY 1),
        |pairs AS (
        |  SELECT a.item AS item_a, b.item AS item_b, count(*) AS supp
        |  FROM items a JOIN items b ON a.o = b.o AND a.item < b.item
        |  GROUP BY 1, 2)
        |SELECT item_a, item_b, CAST(supp AS BIGINT) AS support,
        |  round(supp / ca.c, 6) AS confidence,
        |  round((supp / ca.c) / (cb.c / n.n_orders), 6) AS lift
        |FROM pairs JOIN ic ca ON ca.item = pairs.item_a
        |JOIN ic cb ON cb.item = pairs.item_b, n
        |WHERE supp >= 40""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      val items = t.lineitem
        .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("o"), col("p_brand").as("item"))
        .distinct()
      val n = items.agg(countDistinct(col("o")).cast("double").as("n_orders"))
      val ic = items.groupBy("item").agg(count(lit(1)).cast("double").as("c"))
      val pairs = items
        .groupBy("o").agg(sort_array(collect_set(col("item"))).as("its"))
        .select(explode(expr(
          """flatten(transform(its, (x, i) ->
            |  transform(slice(its, i + 2, size(its)),
            |            y -> struct(x AS item_a, y AS item_b))))""".stripMargin))
          .as("p"))
        .select(col("p.item_a"), col("p.item_b"))
        .groupBy("item_a", "item_b").agg(count(lit(1)).as("supp"))
        .filter(col("supp") >= 40)
      pairs
        .join(broadcast(ic.select(col("item").as("item_a"), col("c").as("ca"))), "item_a")
        .join(broadcast(ic.select(col("item").as("item_b"), col("c").as("cb"))), "item_b")
        .crossJoin(broadcast(n))
        .select(col("item_a"), col("item_b"),
          col("supp").cast("long").as("support"),
          round(col("supp") / col("ca"), 6).as("confidence"),
          round((col("supp") / col("ca")) / (col("cb") / col("n_orders")), 6)
            .as("lift"))
    },

    // First-order Markov transitions over each user's event sequence:
    // lead() within (user_id ORDER BY ts, event_id) pairs every event with
    // its successor, then transition counts and per-source probabilities.
    // ONE corpus shuffle (the user-keyed window); the row-probability
    // normalizer is a 5-row broadcast. The event_id tie-break makes
    // same-timestamp ordering engine-identical.
    QDef("x_seq_transitions",
      """WITH s AS (
        |  SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS nxt
        |  FROM events),
        |t AS (SELECT event_type AS src, nxt AS dst, count(*) AS c
        |      FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT src, CAST(sum(c) AS DOUBLE) AS n FROM t GROUP BY 1)
        |SELECT t.src, t.dst, CAST(c AS BIGINT) AS transitions,
        |  round(c / n, 6) AS p
        |FROM t JOIN tot ON tot.src = t.src""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val seq = Tables(s, d).events
        .select(col("user_id"), col("event_type"),
          lead(col("event_type"), 1).over(w).as("nxt"))
      val trans = seq.filter(col("nxt").isNotNull)
        .groupBy(col("event_type").as("src"), col("nxt").as("dst"))
        .agg(count(lit(1)).as("c"))
      val tot = trans.groupBy("src").agg(sum(col("c")).cast("double").as("n"))
      trans.join(broadcast(tot), "src")
        .select(col("src"), col("dst"), col("c").cast("long").as("transitions"),
          round(col("c") / col("n"), 6).as("p"))
    },

    // Cohort retention matrix: cohort = each user's first active day,
    // cell (cohort, day_offset) = the share of the cohort active that many
    // days later. Two corpus aggregates (per-user first day; distinct
    // (cohort, offset, user) activity) — the first-day frame is user-sized
    // and joins back user-keyed (same partitioning, no extra exchange at
    // scale), cohort sizes are a date-cardinality broadcast.
    QDef("x_retention_cohorts",
      """WITH w AS (
        |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d FROM events),
        |fst AS (SELECT user_id, min(d) AS cohort FROM w GROUP BY 1),
        |act AS (
        |  SELECT DISTINCT f.cohort,
        |    CAST(date_diff('day', f.cohort, w.d) AS INT) AS day_offset,
        |    w.user_id
        |  FROM w JOIN fst f ON f.user_id = w.user_id),
        |sz AS (SELECT cohort, CAST(count(*) AS DOUBLE) AS n0 FROM fst GROUP BY 1)
        |SELECT act.cohort, day_offset, CAST(count(*) AS BIGINT) AS n_active,
        |  round(count(*) / s.n0, 6) AS retention
        |FROM act JOIN sz s ON s.cohort = act.cohort
        |GROUP BY 1, 2, s.n0""".stripMargin) { (s, d) =>
      val w = Tables(s, d).events
        .select(col("user_id"), to_date(date_trunc("day", col("ts"))).as("d"))
      val fst = w.groupBy("user_id").agg(min(col("d")).as("cohort"))
      val act = w.join(fst, "user_id")
        .select(col("cohort"), datediff(col("d"), col("cohort")).as("day_offset"),
          col("user_id"))
        .distinct()
      val sz = fst.groupBy("cohort").agg(count(lit(1)).cast("double").as("n0"))
      act.groupBy("cohort", "day_offset").agg(count(lit(1)).as("n_active"))
        .join(broadcast(sz), "cohort")
        .select(col("cohort"), col("day_offset"),
          col("n_active").cast("long").as("n_active"),
          round(col("n_active") / col("n0"), 6).as("retention"))
    },

    // 2-D skyline of the part table: cheapest-for-the-size Pareto frontier
    // (minimize p_retailprice, maximize p_size). The oracle is the
    // textbook quadratic NOT-EXISTS; the engine runs the exact
    // distribute-then-merge staircase ([[graft.ops.Skyline]]): local
    // skylines over hash buckets in parallel windows, global pass over the
    // small survivor union, semi-join back — O(N log N), no self-join.
    QDef("x_skyline",
      """SELECT a.p_partkey, a.p_retailprice, a.p_size FROM part a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part b
        |  WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
        |    AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))""".stripMargin) {
      (s, d) =>
        Skyline.skyline2d(Tables(s, d).part, "p_retailprice", "p_size")
          .select("p_partkey", "p_retailprice", "p_size")
    },

    // Pairwise Pearson correlation matrix over the four lineitem measures,
    // in ONE corpus pass: a single aggregate computes all six co-moment
    // pairs (map-side combined), then stack() pivots the 1-row frame to
    // (col_a, col_b, r) rows driver-free. 4dp rounding absorbs partial-sum
    // order across engines.
    QDef("x_corr_matrix",
      """SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
        |  round(corr(l_quantity, l_extendedprice), 4) AS r FROM lineitem
        |UNION ALL SELECT 'l_quantity', 'l_discount',
        |  round(corr(l_quantity, l_discount), 4) FROM lineitem
        |UNION ALL SELECT 'l_quantity', 'l_tax',
        |  round(corr(l_quantity, l_tax), 4) FROM lineitem
        |UNION ALL SELECT 'l_extendedprice', 'l_discount',
        |  round(corr(l_extendedprice, l_discount), 4) FROM lineitem
        |UNION ALL SELECT 'l_extendedprice', 'l_tax',
        |  round(corr(l_extendedprice, l_tax), 4) FROM lineitem
        |UNION ALL SELECT 'l_discount', 'l_tax',
        |  round(corr(l_discount, l_tax), 4) FROM lineitem""".stripMargin) { (s, d) =>
      val pairsOf = Seq(
        ("l_quantity", "l_extendedprice"), ("l_quantity", "l_discount"),
        ("l_quantity", "l_tax"), ("l_extendedprice", "l_discount"),
        ("l_extendedprice", "l_tax"), ("l_discount", "l_tax"))
      val agg = Tables(s, d).lineitem.agg(
        pairsOf.head match { case (a, b) => round(corr(col(a), col(b)), 4).as(s"r0") },
        pairsOf.tail.zipWithIndex.map { case ((a, b), i) =>
          round(corr(col(a), col(b)), 4).as(s"r${i + 1}")
        }: _*)
      val stackArgs = pairsOf.zipWithIndex
        .map { case ((a, b), i) => s"'$a', '$b', r$i" }.mkString(", ")
      agg.select(expr(s"stack(6, $stackArgs) AS (col_a, col_b, r)"))
    }
  )
}
