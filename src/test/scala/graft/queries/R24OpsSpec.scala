package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}

/** Round-24 checks: the four new SQL twins must return row-identical
  * frames to their Dataset siblings; Theil's U re-derives directly and
  * respects its bounds and asymmetry identity.
  */
class R24OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def sortedRows(name: String) =
    SparkEntry.queries(name)(spark, sf).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  test("x_sql_kruskal is row-identical to x_kruskal_wallis") {
    assert(sortedRows("x_sql_kruskal") === sortedRows("x_kruskal_wallis"))
  }

  test("x_sql_jb is row-identical to x_jarque_bera") {
    assert(sortedRows("x_sql_jb") === sortedRows("x_jarque_bera"))
  }

  test("x_sql_cochran is row-identical to x_cochran_q") {
    assert(sortedRows("x_sql_cochran") === sortedRows("x_cochran_q"))
  }

  test("x_sql_odds is row-identical to x_odds_ratio") {
    assert(sortedRows("x_sql_odds") === sortedRows("x_odds_ratio"))
  }

  test("x_theil_u matches direct entropies; 0 <= U <= 1") {
    val rows = Tables(spark, sf).orders
      .select(col("o_orderpriority"), col("o_orderstatus"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val n = rows.length.toDouble
    def ent(counts: Iterable[Int]): Double =
      -counts.map(c => c / n * math.log(c / n)).sum
    val hj = ent(rows.groupBy(identity).values.map(_.size))
    val hp = ent(rows.groupBy(_._1).values.map(_.size))
    val hs = ent(rows.groupBy(_._2).values.map(_.size))
    val u = (hs + hp - hj) / hs
    val row = SparkEntry.queries("x_theil_u")(spark, sf).collect().head
    assert(row.getLong(0) === rows.length.toLong)
    assert(math.abs(row.getDouble(1) - hs) < 1e-5)
    assert(math.abs(row.getDouble(2) - hp) < 1e-5)
    assert(math.abs(row.getDouble(3) - hj) < 1e-5)
    assert(math.abs(row.getDouble(4) - u) < 1e-5)
    assert(u >= -1e-9 && u <= 1 + 1e-9)
  }
}
