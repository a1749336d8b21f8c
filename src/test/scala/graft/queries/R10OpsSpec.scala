package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** Invariants of the round-10 batch the row-hash oracle can't articulate:
  * interpolation exactness, HITS normalization/fixpoint behavior, DP noise
  * shape, and quantile-normalization distribution preservation.
  */
class R10OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("x_acf values are valid correlations at every lag") {
    val rows = SparkEntry.queries("x_acf")(spark, sf).collect()
    assert(rows.map(_.getInt(0)).sorted.toSeq === (1 to 7))
    rows.foreach(r => assert(math.abs(r.getDouble(1)) <= 1.0 + 1e-9))
  }

  test("x_interpolate: filled values on knocked-out days obey the linear formula") {
    val out = SparkEntry.queries("x_interpolate")(spark, sf)
    // every interpolated day sits strictly between its neighbors' values —
    // recheck by recomputing the lerp from the SURVIVING observations
    val obs = graft.Tables(spark, sf).events
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(round(avg(col("value")), 6).as("v"))
      .filter(dayofmonth(col("d")) % 5 =!= 2)
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate) -> r.getDouble(2)).toMap
    val interp = out.filter(col("interpolated")).collect()
    assert(interp.nonEmpty)
    interp.foreach { r =>
      val t = r.getString(0); val d = r.getDate(1).toLocalDate
      val prev = Iterator.iterate(d.minusDays(1))(_.minusDays(1)).take(10)
        .find(x => obs.contains((t, x)))
      val next = Iterator.iterate(d.plusDays(1))(_.plusDays(1)).take(10)
        .find(x => obs.contains((t, x)))
      (prev, next) match {
        case (Some(p), Some(n)) =>
          val pv = obs((t, p)); val nv = obs((t, n))
          val frac = (d.toEpochDay - p.toEpochDay).toDouble / (n.toEpochDay - p.toEpochDay)
          val want = BigDecimal(pv + (nv - pv) * frac)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          assert(math.abs(r.getDouble(2) - want) < 1e-9, s"($t, $d)")
        case _ => // edge gap: filled is null-free only inside the series
      }
    }
    // observed days pass through untouched
    val kept = out.filter(!col("interpolated")).collect()
    kept.foreach { r =>
      assert(obs((r.getString(0), r.getDate(1).toLocalDate)) === r.getDouble(2))
    }
  }

  test("x_graph_hits: hubs and authorities each L1-normalize to 1") {
    val rows = SparkEntry.queries("x_graph_hits")(spark, sf).collect()
    assert(rows.nonEmpty)
    val hubSum = rows.map(_.getDouble(1)).sum
    val authSum = rows.map(_.getDouble(2)).sum
    assert(math.abs(hubSum - 1.0) < 1e-4, s"hub sum $hubSum")
    assert(math.abs(authSum - 1.0) < 1e-4, s"auth sum $authSum")
    rows.foreach { r =>
      assert(r.getDouble(1) >= 0.0 && r.getDouble(2) >= 0.0)
    }
  }

  test("x_dp_counts: released counts differ from true counts by Laplace noise") {
    val t = graft.Tables(spark, sf).events
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = SparkEntry.queries("x_dp_counts")(spark, sf).collect()
    assert(rows.length === t.size)
    var moved = 0
    rows.foreach { r =>
      val noise = r.getDouble(1) - t(r.getString(0))
      // Laplace(b=1): |noise| beyond ~7 has probability < 1e-3 per draw
      assert(math.abs(noise) < 8.0, s"${r.getString(0)} noise $noise")
      if (math.abs(noise) > 1e-9) moved += 1
    }
    assert(moved > 0, "every draw returned exactly zero noise")
  }

  test("x_quantile_norm: normalized range equals the global value range") {
    val t = graft.Tables(spark, sf)
    val (gMin, gMax) = {
      val r = t.orders.agg(min("o_totalprice"), max("o_totalprice")).head()
      (r.getDouble(0), r.getDouble(1))
    }
    val rows = SparkEntry.queries("x_quantile_norm")(spark, sf).collect()
    // every segment's mapped distribution spans the global min..max:
    // rank 0 maps to the global minimum, rank 1e6 to the global maximum
    rows.foreach { r =>
      assert(math.abs(r.getDouble(3) - gMin) < 1e-6, s"min_norm ${r.getDouble(3)}")
      assert(math.abs(r.getDouble(4) - gMax) < 1e-6, s"max_norm ${r.getDouble(4)}")
    }
  }

  test("x_embed_dimstats: one row per dimension, nonnegative variance") {
    val rows = SparkEntry.queries("x_embed_dimstats")(spark, sf).collect()
    assert(rows.map(_.getInt(0)).sorted.toSeq === (0 until 64))
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0)
      assert(math.abs(r.getDouble(3)) <= 1.0 + 1e-9)
    }
  }

  test("x_embed_dimstats plan: partial aggregation bounds the exploded shuffle") {
    val plan = SparkEntry.queries("x_embed_dimstats")(spark, sf)
      .queryExecution.executedPlan.toString
    // map-side partial agg must sit below the exchange: dims×partitions
    // rows cross the wire, not dims×corpus
    assert(plan.contains("partial_avg") || plan.contains("Partial"),
      s"no partial aggregate in:\n$plan")
  }

  test("x_rolling_corr: correlations valid, one row per full 7-day window") {
    val rows = SparkEntry.queries("x_rolling_corr")(spark, sf).collect()
    val nDays = graft.Tables(spark, sf).events
      .select(to_date(col("ts"))).distinct().count()
    assert(rows.length === (nDays - 6))
    rows.foreach(r => assert(math.abs(r.getDouble(1)) <= 1.0 + 1e-9))
  }

  test("x_rake_keyphrases: no phrase contains a stopword or exceeds 4 words") {
    val stop = Set("a", "the", "of", "and", "to", "in", "is", "on", "for", "with")
    val rows = SparkEntry.queries("x_rake_keyphrases")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ws = r.getString(0).split(" ")
      assert(ws.length <= 4, r.getString(0))
      assert(!ws.exists(stop), r.getString(0))
      assert(r.getLong(1) >= 5)
      assert(r.getDouble(2) > 0.0)
    }
  }

  test("x_readability: Flesch recomputes from one document by hand") {
    val doc = graft.Tables(spark, sf).documents
      .select("lang", "text").head()
    val text = doc.getString(1)
    val words = text.split(" ", -1).length
    val sents = math.max(1, text.count(c => c == '.' || c == '!' || c == '?'))
    val sylls = "[aeiouy]+".r.findAllIn(text.toLowerCase).length
    val score = 206.835 - 1.015 * (words.toDouble / sents) -
      84.6 * (sylls.toDouble / words)
    // the per-doc formula embedded in the aggregate, reproduced exactly
    val sdf = graft.Tables(spark, sf).documents.limit(1)
      .select((lit(206.835)
        - lit(1.015) * (size(split(col("text"), " "))
          * 1.0 / greatest(lit(1), length(regexp_replace(col("text"), "[^.!?]", ""))))
        - lit(84.6) * ((length(regexp_replace(lower(col("text")), "[aeiouy]+", "#"))
          - length(regexp_replace(regexp_replace(lower(col("text")), "[aeiouy]+", "#"), "#", "")))
          * 1.0 / size(split(col("text"), " ")))).as("f"))
      .head().getDouble(0)
    assert(math.abs(sdf - score) < 1e-9)
  }

  test("x_embed_pca: unit-norm direction, sign fixed by dim 0") {
    val rows = SparkEntry.queries("x_embed_pca")(spark, sf).collect()
    assert(rows.map(_.getInt(0)).sorted.toSeq === (0 until 64))
    val norm = math.sqrt(rows.map(r => r.getDouble(1) * r.getDouble(1)).sum)
    assert(math.abs(norm - 1.0) < 1e-4, s"norm $norm")
    assert(rows.find(_.getInt(0) == 0).get.getDouble(1) >= 0.0)
    // deterministic: a second run returns the identical direction
    val again = SparkEntry.queries("x_embed_pca")(spark, sf).collect()
    assert(rows.map(r => r.getInt(0) -> r.getDouble(1)).toMap ===
      again.map(r => r.getInt(0) -> r.getDouble(1)).toMap)
  }

  test("x_embed_pca captures more variance than any single axis") {
    val rows = SparkEntry.queries("x_embed_pca")(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val t = graft.Tables(spark, sf).embeddings
    val stats = t.select(posexplode(col("embedding")))
      .groupBy("pos").agg(avg(col("col")).as("m"), var_pop(col("col")).as("s2"))
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val muLit = array((0 until 64).map(i => lit(stats(i)._1)): _*)
    val vLit = array((0 until 64).map(i => lit(rows(i))): _*)
    val projVar = t.select(
        aggregate(zip_with(zip_with(col("embedding"), muLit,
          (x, m) => x.cast("double") - m), vLit, (c, v) => c * v),
          lit(0.0), (a, x) => a + x).as("p"))
      .agg(var_pop(col("p"))).head().getDouble(0)
    val maxAxisVar = (0 until 64).map(i => stats(i)._2).max
    assert(projVar >= maxAxisVar - 1e-6,
      s"principal variance $projVar < best axis $maxAxisVar")
  }

  test("x_graph_closeness: values in [0,1]; 0 only for sink vertices") {
    val rows = SparkEntry.queries("x_graph_closeness")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getDouble(1)
      // 0.0 = a vertex with no out-edges (reaches nothing; by contract)
      assert(c >= 0.0 && c <= 1.0 + 1e-9, s"closeness $c")
    }
    assert(rows.exists(_.getDouble(1) > 0.0))
  }

  test("x_benford: expected counts sum to the observed total") {
    val rows = SparkEntry.queries("x_benford")(spark, sf).collect()
    assert(rows.map(_.getInt(0)).sorted.toSeq === (1 to 9))
    val total = rows.map(_.getLong(1)).sum
    val expSum = rows.map(_.getDouble(2)).sum
    assert(math.abs(expSum - total) < 0.01, s"$expSum vs $total")
    rows.foreach(r => assert(r.getDouble(3) >= 0.0))
  }

  test("x_isotonic: fit is nondecreasing and conserves weighted mass") {
    val rows = SparkEntry.queries("x_isotonic")(spark, sf).collect()
      .sortBy(_.getInt(0))
    assert(rows.map(_.getInt(0)).toSeq === (0 to 9))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(3) <= b.getDouble(3) + 1e-9,
        s"not monotone at bucket ${b.getInt(0)}")
    }
    // PAV preserves the weighted mean: Σ n·iso = Σ n·raw
    val isoMass = rows.map(r => r.getLong(1) * r.getDouble(3)).sum
    val rawMass = rows.map(r => r.getLong(1) * r.getDouble(2)).sum
    assert(math.abs(isoMass - rawMass) < rawMass * 1e-3)
  }

  test("x_gini: coefficients in [0,1)") {
    val rows = SparkEntry.queries("x_gini")(spark, sf).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val g = r.getDouble(2)
      assert(g >= -1e-9 && g < 1.0, s"${r.getString(0)} gini $g")
    }
  }

  test("x_text_zipf: slope negative (frequency falls with rank), r2 in [0,1]") {
    val r = SparkEntry.queries("x_text_zipf")(spark, sf).head()
    assert(r.getLong(0) > 10)
    assert(r.getDouble(1) < 0.0)
    assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
  }

  test("x_embed_confusion: counts partition the corpus; labels closed") {
    val rows = SparkEntry.queries("x_embed_confusion")(spark, sf).collect()
    val t = graft.Tables(spark, sf).embeddings
    val n = t.count()
    assert(rows.map(_.getLong(2)).sum === n)
    val labels = t.select("label").distinct().collect().map(_.getInt(0)).toSet
    rows.foreach { r =>
      assert(labels(r.getInt(0)) && labels(r.getInt(1)))
    }
    // the classifier beats uniform guessing: diagonal mass > 1/|labels|
    val diag = rows.filter(r => r.getInt(0) == r.getInt(1)).map(_.getLong(2)).sum
    assert(diag.toDouble / n > 1.0 / labels.size,
      s"diagonal $diag of $n with ${labels.size} labels")
  }

  test("x_changepoint: split is optimal among all candidate days") {
    val best = SparkEntry.queries("x_changepoint")(spark, sf).head()
    assert(best.getDouble(3) >= 0.0) // variance can only fall at a split
    // recompute every candidate's reduction and confirm argmax
    val daily = graft.Tables(spark, sf).events
      .groupBy(to_date(col("ts")).as("d"))
      .agg(round(avg(col("value")), 6).as("v"))
      .collect().map(r => r.getDate(0).toLocalDate -> r.getDouble(1))
      .sortBy(_._1.toEpochDay)
    val xs = daily.map(_._2)
    def ss(a: Seq[Double]) = a.map(x => x * x).sum - math.pow(a.sum, 2) / a.length
    val total = ss(xs.toSeq)
    val reds = (1 until xs.length).map { k =>
      daily(k - 1)._1 -> (total - ss(xs.take(k).toSeq) - ss(xs.drop(k).toSeq))
    }
    val (bd, br) = reds.maxBy(_._2)
    assert(best.getDate(0).toLocalDate === bd)
    assert(math.abs(best.getDouble(3) - br) < 1e-6)
  }

  test("x_graph_assortativity: coefficient in [-1,1] over a non-degenerate graph") {
    val r = SparkEntry.queries("x_graph_assortativity")(spark, sf).head()
    assert(math.abs(r.getDouble(0)) <= 1.0 + 1e-9)
    assert(r.getLong(1) > 0)
  }

  test("x_jaro_entity: every corrupted name recovers its source above 0.9") {
    val rows = SparkEntry.queries("x_jaro_entity")(spark, sf).collect()
    val names = graft.Tables(spark, sf).part
      .filter(length(col("p_name")) >= 4)
      .select("p_name").distinct().collect().map(_.getString(0))
    def corrupt(n: String) = n.substring(0, 2) + n.charAt(3) + n.charAt(2) + n.substring(4)
    val pairs = rows.map(r => (r.getString(0), r.getString(1))).toSet
    names.foreach { n =>
      assert(pairs.contains((corrupt(n), n)), s"lost: $n")
    }
  }
}
