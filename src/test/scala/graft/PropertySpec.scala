package graft

import graft.flights.{Ingest, Preprocessing, Rounding}
import graft.graph.GraphMetrics
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based invariants (SURVEY §5.2(3)) — bare ScalaCheck driven from
  * ScalaTest (the scalatest-scalacheck bridge isn't in the offline dep
  * cache). Fixed seed count keeps runs deterministic-ish and fast on a
  * local session. */
class PropertySpec extends SparkSpec {

  import spark.implicits._

  private def check[A](gen: Gen[A], n: Int = 5)(f: A => Boolean): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n).withWorkers(1),
      Prop.forAll(gen)(f))
    assert(res.passed, res.status.toString)
  }

  private val edgeListGen: Gen[List[(Long, Long)]] =
    Gen.listOfN(40, Gen.zip(Gen.choose(0L, 7L), Gen.choose(0L, 7L)))

  test("invariant: |cancelled| + |delayed| + |null-ELAPSED delayed rows| = |flights|") {
    val flights = Ingest.readFlights(spark, resource("flights.csv"))
    val (cancelled, delayed) = Preprocessing.preprocess(flights)
    val droppedByElapsed = flights
      .filter(col("CANCELLED") === 0 && col("ELAPSED_TIME").isNull).count()
    assert(cancelled.count() + delayed.count() + droppedByElapsed === flights.count())
  }

  // small key/ts domains force heavy collisions: duplicate (key, ts) rows,
  // ties between left and right timestamps, keys on one side only
  private val asofGen: Gen[(List[(Long, Long, Double)], List[(Long, Long, Double)])] =
    Gen.zip(
      Gen.listOfN(30, Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 9L),
        Gen.choose(0.0, 99.0))),
      Gen.listOfN(20, Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 9L),
        Gen.choose(0.0, 99.0))))

  test("invariant: custom AsOfJoinExec == window formulation on random data") {
    check(asofGen, 8) { case (l, r) =>
      val left = l.zipWithIndex
        .map { case ((k, t, v), i) => (i.toLong, k, t, v) }
        .toDF("event_id", "k", "t", "v")
      val right = r.toDF("k", "t", "snap")
      def res(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(row => row.getLong(0) ->
          (if (row.isNullAt(4)) None else Some(row.getDouble(4)))).toMap
      res(ops.AsOfJoin.asofJoinMerge(left, right, "k", "t", "snap", "a")) ==
        res(ops.AsOfJoin.asofJoin(left, right, "k", "t", "snap", "a"))
    }
  }

  test("invariant: as-of value is max value at the latest right ts <= left ts") {
    check(asofGen, 5) { case (l, r) =>
      val left = l.zipWithIndex
        .map { case ((k, t, v), i) => (i.toLong, k, t, v) }
        .toDF("event_id", "k", "t", "v")
      val right = r.toDF("k", "t", "snap")
      val got = ops.AsOfJoin.asofJoinMerge(left, right, "k", "t", "snap", "a")
        .collect().map(row => row.getLong(0) ->
          (if (row.isNullAt(4)) None else Some(row.getDouble(4)))).toMap
      l.zipWithIndex.forall { case ((k, t, _), i) =>
        val eligible = r.filter { case (rk, rt, _) => rk == k && rt <= t }
        val expect =
          if (eligible.isEmpty) None
          else {
            val latest = eligible.map(_._2).max
            Some(eligible.filter(_._2 == latest).map(_._3).max)
          }
        got(i.toLong) == expect
      }
    }
  }

  test("invariant: sum(inDegree) == edge count, on random multigraphs") {
    check(edgeListGen, 5) { pairs =>
      pairs.isEmpty || {
        val total = GraphMetrics.inDegrees(pairs.toDF("src", "dst"))
          .agg(sum("inDegree")).first().getLong(0)
        total == pairs.size.toLong
      }
    }
  }

  test("invariant: PageRank of every vertex is >= resetProb and <= N") {
    check(edgeListGen, 3) { pairs =>
      val clean = pairs.filter { case (a, b) => a != b }
      clean.isEmpty || {
        val ranks = GraphMetrics.staticPageRank(clean.toDF("src", "dst"), 0.15, 5)
          .collect().map(_.getDouble(1))
        ranks.forall(r => r >= 0.15 - 1e-12 && r <= ranks.length.toDouble)
      }
    }
  }

  test("invariant: triangle counts are direction-invariant and sum to 3x#triangles") {
    check(edgeListGen, 3) { pairs =>
      val clean = pairs.filter { case (a, b) => a != b }
      clean.isEmpty || {
        val fwd = GraphMetrics.triangleCounts(clean.toDF("src", "dst"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val rev = GraphMetrics.triangleCounts(clean.map(_.swap).toDF("src", "dst"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        fwd == rev && fwd.values.sum % 3 == 0
      }
    }
  }

  test("invariant: percentage-of-total sums to 100") {
    val pct = new graft.flights.CancelledFlights(
      Preprocessing.preprocess(Ingest.readFlights(spark, resource("flights.csv")))._1)
      .cancellationReasonsPct
    assert(math.abs(pct.agg(sum("percentage")).first().getDouble(0) - 100.0) < 1e-9)
  }

  test("invariant: state vertex set covers every edge endpoint") {
    val flights = Ingest.readFlights(spark, resource("flights.csv"))
    val (_, delayed) = Preprocessing.preprocess(flights)
    val airports = Ingest.readAirports(spark, resource("airports.csv"))
    val g = new graft.flights.GraphFlights(delayed, airports)
    val verts = g.stateVertices.collect().map(_.getString(0)).toSet
    val endpoints = g.stateEdges.select("src").union(g.stateEdges.select("dst"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(endpoints.subsetOf(verts))
  }

  test("property: halfEven matches Python round() incl. half-integer ties") {
    assert(Rounding.halfEven(0.5) === 0.0)
    assert(Rounding.halfEven(1.5) === 2.0)
    assert(Rounding.halfEven(2.5) === 2.0)
    assert(Rounding.halfEven(-0.5) === 0.0)
    assert(Rounding.halfEven(-1.5) === -2.0)
    check(Gen.choose(-1e6, 1e6), 50)(x => Rounding.halfEven(x) == math.rint(x))
  }

  test("property: native MinHash16 == grouped formulation on random token streams") {
    // random word soups, including repeats (multiset-min == set-min) and
    // docs shorter than one trigram (null signature == no signature row)
    val docGen = Gen.listOfN(8, Gen.zip(Gen.choose(1L, 1000L),
      Gen.listOf(Gen.oneOf("alpha", "beta", "gamma", "delta", "x", "yy", ""))
        .map(_.mkString(" "))))
    check(docGen, 5) { docs =>
      docs.map(_._1).distinct.size != docs.size || docs.isEmpty || {
        val df = docs.toDF("doc_id", "text")
        val native = df.select(col("doc_id"),
            graft.functions.MinHash16.minHash16(col("text")).as("mh"))
          .collect().flatMap(r =>
            if (r.isNullAt(1)) None
            else Some(r.getLong(0) -> r.getSeq[Long](1).toIndexedSeq)).toMap
        val grouped = graft.llm.Dedup.minHashSignatures(
            graft.llm.Dedup.wordShingleSet(df, "doc_id", "text"))
          .collect().map(r => r.getLong(0) -> (1 to 16).map(r.getLong(_)).toIndexedSeq).toMap
        native == grouped
      }
    }
  }

  test("property: exact dedup keeps one group per distinct text, min id wins") {
    val rowsGen = Gen.listOfN(20,
      Gen.zip(Gen.choose(1L, 1000L), Gen.oneOf("a b c", "d e f", "g h i")))
    check(rowsGen, 5) { rows =>
      rows.map(_._1).distinct.size != rows.size || rows.isEmpty || {
        val out = graft.llm.Dedup.exactDedup(rows.toDF("doc_id", "text"), "doc_id", "text")
          .collect()
        val byText = rows.groupBy(_._2)
        out.length == byText.size && out.forall { r =>
          byText.values.exists(g =>
            g.size.toLong == r.getLong(2) && g.map(_._1).min == r.getLong(1))
        }
      }
    }
  }

  // docs = unique prefix + phrases drawn from a shared pool: pool reuse
  // across docs manufactures cross-doc duplicated spans at random offsets,
  // including adjacent/overlapping ones
  private val phraseDocsGen: Gen[List[(Long, String)]] = {
    val pool = Vector(
      "alpha beta gamma delta epsilon zeta ",
      "eta theta iota kappa lambda mu nu ",
      "xi omicron pi rho sigma tau upsilon ",
      "phi chi psi omega aleph beth gimel ",
      "one two three four five six seven ",
      "eight nine ten eleven twelve thirteen ")
    Gen.listOfN(5, Gen.listOfN(4, Gen.choose(0, pool.size - 1))).map { docs =>
      docs.zipWithIndex.map { case (ph, i) =>
        (i.toLong, s"DOC${i}UNIQ${i * 7919} " + ph.map(pool).mkString)
      }
    }
  }

  test("property: removeSpans == driver-side interval-union stitch; windows " +
      "inside kept segments are never cross-doc duplicated") {
    val minLen = 20
    check(phraseDocsGen, 5) { docs =>
      val df = docs.toDF("doc_id", "text")
      val spans = llm.Dedup.substringSpans(df, "doc_id", "text", minLen)
      val spanMap = spans.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
        .groupBy(_._1)
        .map { case (k, v) => k -> v.map(t => (t._2, t._3)).sortBy(_._1).toSeq }
      val cleaned = llm.Dedup.removeSpans(df, spans, "doc_id", "text").collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
      // independent reference implementation of the interval-union cut
      def keptSegments(len: Int, sp: Seq[(Int, Int)]): Seq[(Int, Int)] = {
        var cur = 0; val out = Seq.newBuilder[(Int, Int)]
        sp.foreach { case (s, e) =>
          if (s > cur) out += ((cur, s)); cur = math.max(cur, e) }
        if (cur < len) out += ((cur, len))
        out.result()
      }
      // cross-doc duplicated windows of the ORIGINAL corpus, driver-side
      val dupWins = docs.flatMap { case (_, t) => t.sliding(minLen).toSet }
        .groupBy(identity).collect { case (w, o) if o.size > 1 => w }.toSet
      docs.forall { case (id, text) =>
        val sp = spanMap.getOrElse(id, Seq.empty)
        val segs = keptSegments(text.length, sp)
        val (clean, removed) = cleaned(id)
        clean == segs.map { case (s, e) => text.substring(s, e) }.mkString &&
        removed == (text.length - clean.length).toLong &&
        // soundness of the marking itself: a window lying FULLY inside a
        // kept segment was left uncut, so it must not be duplicated
        // (windows crossing stitch junctions are synthetic — excluded)
        segs.forall { case (s, e) =>
          (s to e - minLen).forall(i =>
            !dupWins.contains(text.substring(i, i + minLen)))
        }
      }
    }
  }

  // random (id -> group) maps with skewed group sizes
  private val groupedDocsGen: Gen[Map[Long, Int]] =
    Gen.listOfN(60, Gen.zip(Gen.choose(0L, 400L), Gen.frequency(
      5 -> Gen.const(0), 2 -> Gen.const(1), 1 -> Gen.const(2))))
      .map(_.toMap)

  test("property: temperatureSample is monotone in the budget") {
    check(Gen.zip(groupedDocsGen, Gen.choose(5L, 25L), Gen.choose(26L, 80L)), 4) {
      case (docs, b1, b2) =>
        val df = docs.toSeq.map { case (id, g) => (id, s"g$g") }
          .toDF("doc_id", "grp")
        def ids(b: Long) = graft.llm.Sampling
          .temperatureSample(df, "grp", "doc_id", 0.5, b)
          .collect().map(_.getLong(0)).toSet
        val (s1, s2) = (ids(b1), ids(b2))
        s1.subsetOf(s2) // raising the budget only ever ADDS documents
    }
  }

  // pseudo-docs over a tiny vocabulary so near-dups occur by chance
  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta")
  private val corpusBatchGen: Gen[(List[String], List[String])] =
    Gen.zip(
      Gen.listOfN(5, Gen.listOfN(12, Gen.choose(0, 7)).map(_.map(vocab).mkString(" "))),
      Gen.listOfN(8, Gen.listOfN(12, Gen.choose(0, 7)).map(_.map(vocab).mkString(" "))))

  test("property: dedupAgainst admission is closed — re-admitting survivors " +
      "against the grown corpus admits nothing") {
    check(corpusBatchGen, 4) { case (corpusTexts, batchTexts) =>
      val corpus = corpusTexts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val batch = batchTexts.zipWithIndex
        .map { case (t, i) => (100L + i, t) }.toDF("doc_id", "text")
      val admitted = graft.llm.Dedup
        .dedupAgainst(batch, corpus, "doc_id", "text", 0.6)
      val grown = corpus.unionByName(admitted)
      graft.llm.Dedup
        .dedupAgainst(admitted, grown, "doc_id", "text", 0.6).count() == 0L
    }
  }

  test("property: budgetSelect == naive greedy prefix on random scored corpora") {
    // scores quantized to 2 decimals force heavy bin collisions AND exact
    // ties; budgets span empty → boundary-heavy → keep-all
    val gen = Gen.zip(
      Gen.listOfN(40, Gen.zip(Gen.choose(0, 99), Gen.choose(1L, 20L))),
      Gen.choose(0L, 500L))
    check(gen, 8) { case (rows, budget) =>
      val data = rows.zipWithIndex
        .map { case ((s, t), i) => (i.toLong, s / 100.0, t) }
      val df = data.toDF("doc_id", "score", "toks")
      val got = graft.llm.Curation
        .budgetSelect(df, "doc_id", "score", "toks", budget)
        .collect().map(_.getLong(0)).toSet
      var cum = 0L
      val want = data.sortBy { case (id, s, _) => (-s, id) }
        .flatMap { case (id, _, t) => cum += t
          if (cum <= budget) Some(id) else None }.toSet
      got == want
    }
  }

  test("property: budgetSelect kept tokens are maximal — adding the best " +
      "dropped doc would break the budget") {
    val gen = Gen.listOfN(30, Gen.zip(Gen.choose(0, 50), Gen.choose(1L, 30L)))
    check(gen, 6) { rows =>
      val data = rows.zipWithIndex
        .map { case ((s, t), i) => (i.toLong, s / 50.0, t) }
      val df = data.toDF("doc_id", "score", "toks")
      val budget = 100L
      val kept = graft.llm.Curation
        .budgetSelect(df, "doc_id", "score", "toks", budget)
        .collect().map(_.getLong(0)).toSet
      val keptToks = data.collect { case (id, _, t) if kept(id) => t }.sum
      // the FIRST doc in rank order not kept (if any) must not fit
      val firstDropped = data.sortBy { case (id, s, _) => (-s, id) }
        .find { case (id, _, _) => !kept(id) }
      keptToks <= budget && firstDropped.forall {
        case (_, _, t) => keptToks + t > budget }
    }
  }

  test("property: banded Hamming pairs are EXACT to distance 3 on random 64-bit hashes") {
    // random base hashes + random ≤3-bit perturbations: every true pair
    // (hamming ≤ 3) must be found; every reported pair must verify.
    // Full signed-Long range: bit 63 (the sign bit) must band correctly.
    val gen = Gen.listOfN(12,
      Gen.zip(Gen.choose(Long.MinValue, Long.MaxValue), Gen.listOfN(3, Gen.choose(0, 63))))
    check(gen, 6) { raw =>
      val hashes = raw.zipWithIndex.flatMap { case ((h, flips), i) =>
        val perturbed = flips.distinct.take(3)
          .foldLeft(h)((acc, b) => acc ^ (1L << b))
        Seq((i.toLong * 2, h), (i.toLong * 2 + 1, perturbed))
      }
      val df = hashes.toDF("id", "phash")
      val got = graft.llm.Multimodal.hashNearDupPairs(df, 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        (a, ha) <- hashes; (b, hb) <- hashes if a < b
        if java.lang.Long.bitCount(ha ^ hb) <= 3
      } yield (a, b)).toSet
      got == want
    }
  }

  test("property: sssp equals reference Dijkstra on random weighted digraphs (cycles included)") {
    val gen = Gen.listOfN(50,
      Gen.zip(Gen.choose(0L, 9L), Gen.choose(0L, 9L), Gen.choose(1L, 20L)))
    check(gen, 6) { raw =>
      val edges = raw.map { case (s, t, w) => (s, t, w) }
      // in-memory Dijkstra over the collapsed (min-weight) edge set
      val adj = edges.groupBy(e => (e._1, e._2))
        .map { case ((s, t), es) => (s, t, es.map(_._3).min) }
        .groupBy(_._1).view.mapValues(_.map(e => (e._2, e._3))).toMap
      val dist = scala.collection.mutable.Map(0L -> 0L)
      val pq = scala.collection.mutable.PriorityQueue((0L, 0L))(
        Ordering.by[(Long, Long), Long](_._1).reverse)
      while (pq.nonEmpty) {
        val (d, u) = pq.dequeue()
        if (d == dist(u)) adj.getOrElse(u, Nil).foreach { case (v, w) =>
          if (dist.get(v).forall(_ > d + w)) { dist(v) = d + w; pq.enqueue((d + w, v)) }
        }
      }
      val got = GraphMetrics.sssp(edges.toDF("src", "dst", "w"), source = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == dist.toMap
    }
  }

  test("property: prototypeFilter shrinks monotonically with the drop fractions") {
    check(Gen.listOfN(24, Gen.listOfN(4, Gen.choose(-10, 10))), 4) { raw =>
      val vs = raw.zipWithIndex
        .map { case (v, i) => (i.toLong, v.map(_.toFloat / 10f).toArray) }
        .toDF("vec_id", "embedding")
      def ids(p: Double) = graft.llm.Similarity
        .prototypeFilter(vs, k = 2, iters = 1, dropNear = p, dropFar = p)
        .collect().map(_.getLong(0)).toSet
      val (all, some) = (ids(0.0), ids(0.25))
      all.size == 24 && some.subsetOf(all) && some.size < 24
    }
  }
}
