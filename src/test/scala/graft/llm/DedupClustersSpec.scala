package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Connected-components clustering over near-dup pairs
  * ([[Dedup.clusters]] / [[Dedup.survivors]]). Fixtures cover the shapes
  * that break naive approaches: chains (transitivity without direct
  * similarity), cycles (propagation must terminate), singletons (must pass
  * through survivors untouched); a ScalaCheck property checks agreement
  * with GraphX ConnectedComponents on random graphs.
  */
class DedupClustersSpec extends SparkSpec {
  import spark.implicits._

  // bare ScalaCheck driven from ScalaTest (no bridge in the offline cache)
  private def check[A](gen: Gen[A], n: Int = 5)(f: A => Boolean): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n).withWorkers(1),
      Prop.forAll(gen)(f))
    assert(res.passed, res.status.toString)
  }

  private def pairsDF(ps: (Long, Long)*): DataFrame = ps.toDF("d1", "d2")

  private def labels(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain A~B~C (A not ~ C) collapses into one component, min label") {
    val got = labels(Dedup.clusters(pairsDF((1L, 2L), (2L, 3L))))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("cycle terminates and labels with the min id") {
    val got = labels(Dedup.clusters(pairsDF((4L, 5L), (5L, 6L), (6L, 4L))))
    assert(got === Map(4L -> 4L, 5L -> 4L, 6L -> 4L))
  }

  test("disjoint components keep distinct labels; long chain converges") {
    // chain 0..9 (diameter 9 exercises pointer jumping) + separate pair
    val chain = (0L until 9L).map(i => (i, i + 1))
    val got = labels(Dedup.clusters(pairsDF(chain :+ (100L, 101L): _*)))
    assert((0L to 9L).forall(got(_) == 0L))
    assert(got(100L) == 100L && got(101L) == 100L)
    assert(got.size == 12)
  }

  test("survivors keeps the representative per cluster and all singletons") {
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c"), (7L, "lonely"))
      .toDF("doc_id", "text")
    val surv = Dedup.survivors(docs, "doc_id", Dedup.clusters(pairsDF((1L, 2L), (2L, 3L))))
      .select("doc_id").as[Long].collect().sorted
    assert(surv === Array(1L, 7L)) // 2 and 3 collapse into 1; 7 untouched
  }

  test("empty pair set: clusters is empty, survivors is identity") {
    val docs = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val cl = Dedup.clusters(pairsDF())
    assert(cl.count() == 0)
    assert(Dedup.survivors(docs, "doc_id", cl).count() == 2)
  }

  test("property: clusters agrees with GraphX ConnectedComponents") {
    val genEdges = for {
      n <- Gen.choose(2, 30)
      m <- Gen.choose(1, 40)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong - 1)
        b <- Gen.choose(0L, n.toLong - 1) if a != b
      } yield (math.min(a, b), math.max(a, b)))
    } yield es.distinct
    check(genEdges) { es =>
      es.isEmpty || {
        val got = labels(Dedup.clusters(pairsDF(es: _*)))
        val g = org.apache.spark.graphx.Graph.fromEdgeTuples(
          spark.sparkContext.parallelize(es), defaultValue = 0)
        val expect = org.apache.spark.graphx.lib.ConnectedComponents.run(g)
          .vertices.collect().toMap
        got == expect
      }
    }
  }
}
