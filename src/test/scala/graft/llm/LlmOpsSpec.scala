package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  val base = "the quick brown fox jumps over the lazy dog while the calm cat " +
    "sleeps near the warm stove and the old owl watches from the tall tree"
  val docs = Seq(
    (1L, base),
    (2L, base), // exact dup of 1
    (3L, base.replace("tall tree", "tall oak")), // near dup (one trailing token)
    (4L, "completely different content about database query planning engines"),
    (5L, "zzz qqq xxx vvv kkk www yyy uuu ttt rrr sss")).toDF("doc_id", "text")

  test("exactDedup groups identical texts and keeps the min id") {
    val out = Dedup.exactDedup(docs, "doc_id", "text").collect()
    assert(out.length === 4) // 5 docs, one exact pair
    val dup = out.find(_.getLong(2) == 2L).get
    assert(dup.getLong(1) === 1L) // keeper = min(doc_id)
  }

  test("minHash LSH finds exact and near duplicates, not unrelated docs") {
    val pairs = Dedup.minHashNearDups(docs, "doc_id", "text", 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs.contains((1L, 2L)))
    assert(pairs((1L, 2L)) === 1.0) // identical shingle sets
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L))) // near dup caught
    assert(!pairs.keySet.exists { case (a, b) => Set(a, b).contains(4L) })
  }

  test("simHash: identical docs hamming 0; near dups close; banding finds them") {
    val sh = Dedup.shingleSet(docs, "doc_id", "text")
    val hashes = Dedup.simHash(sh).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes(1L) === hashes(2L))
    val pairs = Dedup.simHashNearDups(sh, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((1L, 2L)) === 0)
  }

  test("all simhash formulations agree: grouped shuffle == HOF column == native exprs") {
    // char-shingled family
    val groupedChar = Dedup.simHash(Dedup.shingleSet(docs, "doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hof = docs.select(col("doc_id"), Dedup.simHashColumn(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nativeChar = Dedup.simHashDocs(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hof === groupedChar)
    assert(nativeChar === groupedChar)
    // word-trigram family (used by the registered query)
    val groupedWord = Dedup.simHash(Dedup.wordShingleSet(docs, "doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nativeWord = Dedup.simHashDocsWords(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nativeWord === groupedWord)
    assert(nativeWord(1L) === nativeWord(2L)) // exact dup → identical hash
  }

  test("native MinHash16 agrees with the grouped explode/distinct/min formulation") {
    val grouped = Dedup.minHashSignatures(Dedup.wordShingleSet(docs, "doc_id", "text"))
      .collect().map(r => r.getLong(0) -> (0 until 16).map(k => r.getLong(k + 1))).toMap
    val native = docs.select(col("doc_id"),
        graft.functions.MinHash16.minHash16(col("text")).as("mh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toIndexedSeq).toMap
    assert(native === grouped)
    // a doc with < 3 tokens has no trigram: null, matching "no signature row"
    val short = Seq((9L, "two tokens")).toDF("doc_id", "text")
    assert(short.select(graft.functions.MinHash16.minHash16(col("text")))
      .first().isNullAt(0))
  }

  test("ngram Jaccard scores word-trigram overlap exactly") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 2L)) === 1.0)
    // doc 3 differs in the last of 27 tokens → 24 of 25 trigrams shared,
    // jaccard = 24 / (25 + 25 - 24) = 0.923077
    assert(math.abs(pairs((1L, 3L)) - 0.923077) < 1e-6)
  }

  // every doc shares this prefix, so its internal trigrams have df = 6
  val boiler = "terms of service apply to all pages"
  val capDocs = Seq(
    (10L, s"$boiler alpha beta gamma delta epsilon zeta"),
    (11L, s"$boiler alpha beta gamma delta epsilon eta"), // near dup of 10
    (12L, s"$boiler one two three four five six"),
    (13L, s"$boiler seven eight nine ten eleven twelve"),
    (14L, s"$boiler unique words here nothing shared again"),
    (15L, s"$boiler more totally distinct filler text rows")).toDF("doc_id", "text")

  def ngramPairs(maxDf: Int): Map[(Long, Long), Double] =
    Dedup.ngramJaccardPairs(capDocs, "doc_id", "text", 0.0, maxDf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("ngram Jaccard maxDf: bit-identical below the cap") {
    assert(ngramPairs(maxDf = 100) === ngramPairs(maxDf = Int.MaxValue))
    // and the default cap leaves the original docs' scores untouched
    val deflt = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val unc = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.5, Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(deflt === unc)
  }

  test("ngram Jaccard maxDf: posting lists bounded by construction above the cap") {
    // uncapped, the boilerplate trigrams produce df-6 posting lists…
    val uncappedMax = Dedup.postingLists(
        Dedup.keptShingles(capDocs, "doc_id", "text", Int.MaxValue))
      .agg(max(size(col("ids")))).first().getInt(0)
    assert(uncappedMax === 6)
    // …capped at 3, no list exceeds 3 — hot trigrams die before collect_list
    val cappedMax = Dedup.postingLists(
        Dedup.keptShingles(capDocs, "doc_id", "text", 3))
      .agg(max(size(col("ids")))).first().getInt(0)
    assert(cappedMax <= 3)
    // pairs whose ONLY overlap is boilerplate disappear; real near-dups stay
    val capped = ngramPairs(maxDf = 3)
    assert(capped.contains((10L, 11L)))
    assert(!capped.contains((12L, 13L)))
    assert(ngramPairs(maxDf = Int.MaxValue).contains((12L, 13L)))
  }

  test("substring spans: maximal cross-doc verbatim runs at unaligned offsets") {
    val shared = "the quick brown fox jumps over the lazy dog near the riverbank today"
    val a = "AAAA " + shared + " tail-a-unique-material-here-xxxxxxxxxxxx"
    val b = "BB-prefix-different-length " + shared + " other-unique-tail-yyyyyy"
    val c = "completely unrelated document with no overlap at all zzzzzzzzzzzzzzzz"
    val docs = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")

    val spans = Dedup.substringSpans(docs, "doc_id", "text", 20)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))

    // one maximal span per sharing doc, none for the unique doc
    assert(spans.count(_._1 == 1L) === 1)
    assert(spans.count(_._1 == 2L) === 1)
    assert(!spans.exists(_._1 == 3L))
    // the span covers exactly the shared run (windows of len 20: every
    // start position whose window lies inside " shared "-padded region);
    // start = index of the first duplicated 20-window, end exclusive
    val (s1, e1) = spans.collectFirst { case (1L, s, e) => (s, e) }.get
    val (s2, e2) = spans.collectFirst { case (2L, s, e) => (s, e) }.get
    // both spans have the same LENGTH (same shared text) at different offsets
    assert(e1 - s1 === e2 - s2)
    assert(a.substring(s1, e1) === b.substring(s2, e2))
    assert(a.substring(s1, e1).contains(shared))
    // a span never extends into text that differs
    assert(e1 - s1 <= shared.length + 2 * 1) // at most the joining spaces
  }

  test("substring spans: doc shorter than the window yields nothing; " +
      "within-doc repeats alone do not count") {
    val docs = Seq(
      (1L, "short"),
      (2L, "abcabcabcabcabcabcabcabcabcabcabcabc"), // self-repeat only
      (3L, "totally-distinct-content-without-any-repeat")).toDF("doc_id", "text")
    assert(Dedup.substringSpans(docs, "doc_id", "text", 12).count() === 0L)
  }

  test("removeSpans: overlapping spans union before cutting; cleaned text " +
      "holds no duplicated window; span-free docs pass through") {
    val minLen = 20
    // 50 distinct chars, no self-repeats
    val a = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWX"
    // b shares exactly a's window at position 10, c exactly the window at
    // position 12 — position 11's window is in NEITHER, so a gets two
    // one-position islands whose character spans [10,30) and [12,32)
    // OVERLAP (each run extends minLen past its start): the stitcher must
    // union them, not cut twice.
    val b = "##########" + a.substring(10, 30)
    val c = a.substring(12, 32) + "@@@@@@@@@@@"
    val d = "fully unique document with no shared windows anywhere at all"
    val docs = Seq((1L, a), (2L, b), (3L, c), (4L, d)).toDF("doc_id", "text")

    val spans = Dedup.substringSpans(docs, "doc_id", "text", minLen)
    val spanRows = spans.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(spanRows.filter(_._1 == 1L).toSet === Set((1L, 10, 30), (1L, 12, 32)))

    val cleaned = Dedup.removeSpans(docs, spans, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // a: union [10,32) cut once → head + tail stitched
    assert(cleaned(1L) === ((a.substring(0, 10) + a.substring(32), 22L)))
    // b/c: single span each
    assert(cleaned(2L) === (("##########", 20L)))
    assert(cleaned(3L) === (("@@@@@@@@@@@", 20L)))
    // span-free doc passes through untouched
    assert(cleaned(4L) === ((d, 0L)))

    // PROPERTY: no minLen-window of any cleaned text is a cross-doc
    // duplicated window of the ORIGINAL corpus (the suffix-array method's
    // postcondition — every located duplicate is actually cut)
    val originals = Seq(a, b, c, d)
    val dupWins = originals.flatMap(t => t.sliding(minLen).toSet.toSeq)
      .groupBy(identity).collect { case (w, occ) if occ.size > 1 => w }.toSet
    val cleanWins = cleaned.values.flatMap(_._1.sliding(minLen)).toSet
    assert(cleanWins.intersect(dupWins) === Set.empty)
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  val vecs = Seq(
    (0L, Array(1f, 0f, 0f, 0f)),
    (1L, Array(0f, 1f, 0f, 0f)),
    (2L, Array(2f, 0f, 0f, 0f)),   // parallel to 0
    (3L, Array(1f, 1f, 0f, 0f)),
    (4L, Array(-1f, 0f, 0f, 0f))). // anti-parallel to 0
    toDF("vec_id", "embedding")

  test("cosine: parallel 1, orthogonal 0, anti-parallel -1") {
    val q = vecs.filter(col("vec_id") === 0)
    val top = Similarity.cosineTopK(q, vecs, 4).collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(top(2L) === 1.0)
    assert(top(1L) === 0.0)
    assert(top(4L) === -1.0)
    assert(math.abs(top(3L) - 0.707107) < 1e-6)
  }

  test("cosineTopK ranks desc with id tiebreak and respects k") {
    val q = vecs.filter(col("vec_id") === 0)
    val top2 = Similarity.cosineTopK(q, vecs, 2).collect().sortBy(_.getInt(3))
    assert(top2.map(_.getLong(1)).toSeq === Seq(2L, 3L))
    assert(top2.map(_.getInt(3)).toSeq === Seq(1, 2))
  }

  test("ivfAssign puts each centroid in its own cluster at distance 0") {
    val centroids = vecs.filter(col("vec_id") < 2)
    val assign = Similarity.ivfAssign(vecs, centroids).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(assign(0L) === ((0L, 0.0)))
    assert(assign(1L) === ((1L, 0.0)))
    assert(assign(2L)._1 === 0L) // parallel vector joins centroid 0's cluster
  }

  test("ivfAssign tie-break: equidistant centroids resolve to the smaller id") {
    val centroids = Seq((20L, Array(1f, 0f, 0f, 0f)), (10L, Array(-1f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding") // listed larger-id first on purpose
    val v = Seq((1L, Array(0f, 3f, 0f, 0f))).toDF("vec_id", "embedding") // dist² = 10 to both
    val r = Similarity.ivfAssign(v, centroids).collect()
    assert(r.length === 1)
    assert(r.head.getLong(1) === 10L) // ORDER BY dist2, centroid_id semantics
    assert(r.head.getDouble(2) === 10.0)
  }
}

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii scrubs emails/URLs BEFORE digits so patterns aren't torn apart") {
    val df = Seq((1L, "mail a2b@x7.com then https://h5.io/p9 costs 42 dollars"))
      .toDF("id", "t")
    val out = df.select(
      TextOps.redactPii(col("t")).as("red"),
      TextOps.emailCount(col("t")).as("ne"),
      TextOps.urlCount(col("t")).as("nu")).head
    assert(out.getString(0) === "mail <EMAIL> then <URL> costs <NUM> dollars")
    assert(out.getInt(1) === 1 && out.getInt(2) === 1)
    // wrong order would have produced "a<NUM>b@x<NUM>.com" debris
    assert(!out.getString(0).contains("@"))
  }

  test("ivfTopKProbed: nprobe=1 equals ivfTopK; wider probe never loses recall") {
    import spark.implicits._
    // 3 clusters along separate axes + a query sitting between two of them,
    // so its nearest neighbor lives in a NEIGHBORING cell
    val corpus = Seq(
      (0L, Array(10f, 0f, 0f, 0f)), (1L, Array(0f, 10f, 0f, 0f)),
      (2L, Array(0f, 0f, 10f, 0f)), // ids 0-2 double as centroids
      (3L, Array(9f, 1f, 0f, 0f)), (4L, Array(1f, 9f, 0f, 0f)),
      (5L, Array(6f, 5f, 0f, 0f))) // the boundary sitter
      .toDF("vec_id", "embedding")
    val cents = corpus.filter(col("vec_id") < 3)
    val q = corpus.filter(col("vec_id") === 5)
    def tops(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(1), r.getInt(3))).sortBy(_._2).map(_._1).toList
    // nprobe=1 degenerates to the single-cell search
    assert(tops(Similarity.ivfTopKProbed(q, corpus, cents, 2, 1)) ===
      tops(Similarity.ivfTopK(q, corpus, cents, 2)))
    // the boundary query's neighbor set improves with the second cell:
    // cell-0 only sees {0, 3}; probing cell-1 too adds 4 and finds the
    // true top-2 {3, 4} (both cosines to 5 exceed 0's)
    val p1 = tops(Similarity.ivfTopKProbed(q, corpus, cents, 2, 1)).toSet
    val p2 = tops(Similarity.ivfTopKProbed(q, corpus, cents, 2, 2)).toSet
    val truth = Similarity.cosineTopK(q, corpus, 2)
      .collect().map(_.getLong(1)).toSet
    assert(p2.intersect(truth).size >= p1.intersect(truth).size)
    assert(p2 === truth)
  }

  test("kmeans converges to the obvious centroids on well-separated clusters") {
    import spark.implicits._
    val pts = Seq(
      (0L, Array(0f, 0f)), (1L, Array(10f, 10f)), // init = the two lowest ids
      (2L, Array(0f, 2f)), (3L, Array(10f, 12f)),
      (4L, Array(2f, 0f)), (5L, Array(12f, 10f)))
      .toDF("vec_id", "embedding")
    val cents = Similarity.kmeans(pts, 2, 3).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toList).toMap
    assert(cents.keySet === Set(0L, 1L))
    // cluster 0 = mean of (0,0),(0,2),(2,0); cluster 1 = mean of the 10s
    def close(a: List[Float], b: List[Double]) =
      a.zip(b).forall { case (x, y) => math.abs(x - y) < 1e-5 }
    assert(close(cents(0L), List(2.0 / 3, 2.0 / 3)))
    assert(close(cents(1L), List(32.0 / 3, 32.0 / 3)))
  }

  test("chunking: overlapping windows, short tail kept, empty doc dropped") {
    import spark.implicits._
    val docs = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")), (2L, ""))
      .toDF("doc_id", "text")
    val out = TextOps.chunk(docs, "doc_id", "text", 4, 2).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getInt(2), r.getString(3)))).toMap
    // 10 tokens, stride 2 → starts 0,2,4,6,8 (5 chunks); last two truncated
    assert(out.keySet === (0 to 4).map((1L, _)).toSet)
    assert(out((1L, 0)) === ((4, "t1 t2 t3 t4")))
    assert(out((1L, 1)) === ((4, "t3 t4 t5 t6")))
    assert(out((1L, 4)) === ((2, "t9 t10"))) // tail shorter than the window
  }

  test("redaction replaces digit runs and counts them") {
    import spark.implicits._
    val df = Seq((1L, "call 555 or 0800 now"), (2L, "no digits here"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextOps.numberCount(col("text")).as("n"),
        TextOps.redactNumbers(col("text")).as("r"))
    val out = df.collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2)))).toMap
    assert(out(1L) === ((2, "call <NUM> or <NUM> now")))
    assert(out(2L) === ((0, "no digits here")))
  }

  test("shard packing: shards fill to the token budget, groups independent") {
    import spark.implicits._
    // one group (groups=1): docs of 30 tokens each, 100-token target →
    // cum_before 0,30,60,90 | 120,150 ... → shards 0,0,0,0,1,1,...
    val docs = (0L to 5L).map(i => (i, (1 to 30).map(_ => "w").mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextOps.packShards(docs, "doc_id", "text", 100, 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out === Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 1L))
  }

  test("fingerprint is position-sensitive (permuted tokens differ)") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha"), (3L, "alpha beta gamma"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
    val fp = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) === fp(3L))
    assert(fp(1L) !== fp(2L))
  }

  test("occurrences and token counts are exact") {
    val df = Seq((1L, "a the b the c, d!")).toDF("doc_id", "text")
    val r = df.select(
      TextOps.occurrences(col("text"), " the ").as("occ"),
      TextOps.tokenCount(col("text")).as("ws"),
      TextOps.regexTokenCount(col("text")).as("re")).first()
    assert(r.getInt(0) === 2)
    assert(r.getInt(1) === 6)
    assert(r.getInt(2) === 8) // a,the,b,the,c,',',d,'!'
  }

  test("language-ID picks the marker-dominant language with priority ties") {
    val df = Seq(
      (1L, "x the y and z the w"),
      (2L, "a el b los c el d"),
      (3L, "nothing matching here")).toDF("doc_id", "text")
      .select(col("doc_id"), TextOps.predictedLang(col("text")).as("lang"))
    val out = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "en", 2L -> "es", 3L -> "unknown"))
  }
}

class MultimodalSpec extends SparkSpec {

  test("media table plumbing: payload bytes + metadata + stub decode features") {
    import spark.implicits._
    implicit val s = spark
    val docs = Seq((7L, "hello"), (8L, "")).toDF("doc_id", "text")
    val media = Multimodal.toMediaTable(docs, "doc_id", "text", "text")
    assert(media.schema("payload").dataType.typeName === "binary")
    assert(media.select("meta.size_bytes").collect().map(_.getLong(0)).toSet === Set(5L, 0L))
    val feats = Multimodal.decodeFeatures(media).collect().map(f => f.media_id -> f).toMap
    assert(feats(7L).n_bytes === 5L)
    assert(feats(7L).first_byte === 'h'.toInt)
    assert(feats(7L).digest === "5d41402abc4b2a76b9719d911017c592") // md5("hello")
    assert(feats(8L).first_byte === -1)
  }

  test("resize stub: payload truncated/padded to w*h, meta rewritten, rows preserved") {
    import spark.implicits._
    implicit val s = spark
    val docs = Seq((1L, "abcdefgh"), (2L, "xy")).toDF("doc_id", "text")
    val out = Multimodal.resize(Multimodal.toMediaTable(docs, "doc_id", "text", "img"), 2, 2)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Array[Byte]](1), r.getStruct(2).getLong(1), r.getStruct(2).getInt(2))).toMap
    assert(out.size === 2)
    assert(out(1L)._1.toSeq === "abcd".getBytes.toSeq) // truncated to 4
    assert(out(2L)._1.toSeq === ("xy".getBytes ++ Array[Byte](0, 0)).toSeq) // zero-padded
    assert(out(1L)._2 === 4L && out(1L)._3 === 2)
  }

  def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  test("ImageIO decode: real PNG dimensions + luminance; garbage falls back") {
    import spark.implicits._
    implicit val s = spark
    val media = Seq(
      (1L, pngBytes(4, 2, 0xff0000)),             // solid red 4x2
      (2L, "not an image at all".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val feats = Multimodal.decodeImageFeatures(
        Multimodal.toMediaTable(media, "doc_id", "payload", "image"))
      .collect().map(f => f.media_id -> f).toMap
    assert(feats(1L).decoded)
    assert(feats(1L).width === 4 && feats(1L).height === 2)
    assert(math.abs(feats(1L).mean_luma - 0.299 * 255) < 1e-6) // pure red
    assert(!feats(2L).decoded)
    assert(feats(2L).width === -1 && feats(2L).n_bytes === 19L)
  }

  test("ImageIO resize: re-encoded PNG at target dims, meta updated, fallback flagged") {
    import spark.implicits._
    implicit val s = spark
    val media = Multimodal.toMediaTable(Seq(
      (1L, pngBytes(8, 8, 0x0000ff)),
      (2L, "garbage".getBytes("UTF-8"))).toDF("doc_id", "payload"),
      "doc_id", "payload", "image")
    val out = Multimodal.resizeImages(media, 2, 3).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Array[Byte]](1), r.getStruct(2).getString(0),
          r.getStruct(2).getInt(2), r.getStruct(2).getInt(3))).toMap
    // decodable payload: actually a 2x3 PNG now
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(1L)._1))
    assert(back.getWidth === 2 && back.getHeight === 3)
    assert((back.getRGB(0, 0) & 0xffffff) === 0x0000ff) // still blue
    assert(out(1L)._2 === "image" && out(1L)._3 === 2 && out(1L)._4 === 3)
    // garbage payload: stub truncation, flagged kind
    assert(out(2L)._2 === "image:undecoded")
    assert(out(2L)._1.length === 6)
  }

  def wavBytes(sampleRate: Float, seconds: Double, amplitude: Double): Array[Byte] = {
    val n = (sampleRate * seconds).toInt
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s = (amplitude * math.sin(2 * math.Pi * 440 * i / sampleRate) * 32767).toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val buf = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, buf)
    buf.toByteArray
  }

  test("perceptual aHash: invariant under uniform brightness shift, distinct across patterns") {
    implicit val sp = spark
    import spark.implicits._
    // ids 1, 8, 15 share id%7==1 at offsets 0,1,2 — same pattern, shifted
    val media = graft.llm.Multimodal.synthPatternPngTable(
      Seq(1L, 8L, 15L, 2L, 9L).toDF("doc_id"))
    val hashed = graft.llm.Multimodal.imageAHash(media)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2))).toMap
    assert(hashed.values.forall(_._1)) // all decode
    assert(hashed(1L)._2 === hashed(8L)._2)
    assert(hashed(8L)._2 === hashed(15L)._2)
    assert(hashed(2L)._2 === hashed(9L)._2)
    assert(hashed(1L)._2 !== hashed(2L)._2)
    // the bytes DIFFER (brightness shift re-encodes) — md5 dedup would miss
    val payloads = media.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(!java.util.Arrays.equals(payloads(1L), payloads(8L)))
    // garbage payload falls back, flagged
    val bad = Seq((99L, "not a png".getBytes("UTF-8"))).toDF("media_id", "payload")
    val r = graft.llm.Multimodal.imageAHash(bad).head
    assert(!r.getBoolean(1) && r.getLong(2) === -1L)
  }

  /** A 32×32 block-pattern PNG with explicit per-block gray levels. */
  private def blockPng(vals: Array[Int]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(32, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val gr = img.createGraphics()
    for (by <- 0 until 8; bx <- 0 until 8) {
      val v = vals(by * 8 + bx)
      gr.setColor(new java.awt.Color(v, v, v))
      gr.fillRect(bx * 4, by * 4, 4, 4)
    }
    gr.dispose()
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  test("imageNearDups: finds exact + small-Hamming pairs, misses far images") {
    implicit val sp = spark
    import spark.implicits._
    // base: alternating far-apart levels -> bits robust to small mean shifts
    val base = Array.tabulate(64)(i => if (i % 2 == 0) 40 else 200)
    val dup = base.clone() // byte-identical pattern, same hash
    val near = base.clone(); near(0) = 200 // one block flipped: Hamming 1
    val far = Array.tabulate(64)(i => if (i % 2 == 0) 200 else 40) // inverted
    val media = Seq(1L -> base, 2L -> dup, 3L -> near, 9L -> far)
      .map { case (id, vs) => (id, blockPng(vs)) }.toDF("media_id", "payload")
    val out = graft.llm.Multimodal.imageNearDups(media, maxHamming = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) === ((1L, 2L))) // rep 1, neighbors {2, 3}
    assert(out(2L) === ((1L, 2L)))
    assert(out(3L) === ((1L, 2L))) // the Hamming-1 edit still clusters
    assert(out(9L) === ((9L, 0L))) // inverted image: no neighbors, own rep
  }

  test("hashNearDupPairs hot-bucket cap: capped result is a subset; only pairs " +
      "whose every intact band is hot are lost; below the cap it is identical") {
    import spark.implicits._
    // expand bit k of i into nibble k (0x0/0xF): filler uppers are pairwise
    // Hamming >= 4 apart, so fillers never pair with each other
    def expand(i: Int): Long =
      (0 until 5).map(k => if ((i >> k & 1) == 1) 0xFL << (4 * k) else 0L).sum
    // 20 distinct hashes all sharing band-0 sig 0x1234 -> a hot bucket
    val filler = (0 until 20).map(i => (100L + i, (expand(i) << 16) | 0x1234L))
    val a = (0xABCDEL << 16) | 0x1234L
    val b = a ^ (1L << 16) ^ (1L << 32) ^ (1L << 48) // Hamming 3, ONLY band 0 intact
    val c = (0xEDCBAL << 16) | 0x1234L
    val dd = c ^ 1L // Hamming 1 in band 0 -> bands 1-3 intact
    val rows = filler ++ Seq((1L, a), (2L, b), (3L, c), (4L, dd))
    val df = rows.toDF("id", "phash")
    def pairs(cap: Int) = graft.llm.Multimodal.hashNearDupPairs(df, 3, cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = pairs(Int.MaxValue)
    val want = (for {
      (x, hx) <- rows; (y, hy) <- rows if x < y
      if java.lang.Long.bitCount(hx ^ hy) <= 3
    } yield (x, y)).toSet
    assert(uncapped === want) // exactness, cap disengaged
    assert(pairs(1000) === want) // cap above every bucket: identical
    val capped = pairs(10) // hot (band0, 0x1234) bucket (23 hashes) removed
    assert(capped.subsetOf(uncapped))
    assert(!capped.contains((1L, 2L))) // its only intact band was hot
    assert(capped.contains((3L, 4L))) // found through bands 1-3
  }

  test("imageNearDups: undecodable payloads are excluded, not paired") {
    implicit val sp = spark
    import spark.implicits._
    val media = Seq(
      (1L, blockPng(Array.fill(64)(120))),
      (2L, "garbage".getBytes("UTF-8"))).toDF("media_id", "payload")
    val out = graft.llm.Multimodal.imageNearDups(media, maxHamming = 3)
    assert(out.collect().map(_.getLong(0)).toSet === Set(1L))
  }

  test("audio decode: real WAV format + RMS amplitude; garbage falls back") {
    import spark.implicits._
    implicit val s = spark
    val media = Multimodal.toMediaTable(Seq(
      (1L, wavBytes(8000f, 0.5, 0.5)),
      (2L, "definitely not audio".getBytes("UTF-8"))).toDF("doc_id", "payload"),
      "doc_id", "payload", "audio")
    val feats = Multimodal.decodeAudioFeatures(media)
      .collect().map(f => f.media_id -> f).toMap
    assert(feats(1L).decoded)
    assert(feats(1L).sample_rate === 8000.0)
    assert(feats(1L).channels === 1)
    assert(feats(1L).frames === 4000L)
    // sine RMS = amplitude / sqrt(2)
    assert(math.abs(feats(1L).rms - 0.5 / math.sqrt(2)) < 0.01)
    assert(!feats(2L).decoded)
  }

  def jpegBytes(w: Int, h: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(gray, gray, gray))
    g.fillRect(0, 0, w, h)
    g.dispose()
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", buf)
    buf.toByteArray
  }

  test("MJPEG video decode: one row per frame with real dims+luma; garbage falls back") {
    import spark.implicits._
    implicit val s = spark
    val threeFrames = jpegBytes(8, 8, 64) ++ jpegBytes(16, 8, 128) ++ jpegBytes(8, 16, 192)
    val oneFull = jpegBytes(8, 8, 100)
    val truncated = oneFull ++ jpegBytes(8, 8, 100).dropRight(10) // second frame loses EOI
    val media = Seq(
      (1L, threeFrames),
      (2L, "not a video".getBytes("UTF-8")),
      (3L, truncated)).toDF("media_id", "payload")
    val rows = Multimodal.decodeVideoFrames(media).collect()
      .map(f => (f.media_id, f.frame_idx) -> f).toMap
    // id 1: three frames, correct per-frame dims, luma within JPEG error
    assert(rows.keySet.count(_._1 == 1L) === 3)
    assert(rows((1L, 0)).width === 8 && rows((1L, 0)).height === 8)
    assert(rows((1L, 1)).width === 16 && rows((1L, 1)).height === 8)
    assert(rows((1L, 2)).width === 8 && rows((1L, 2)).height === 16)
    assert(math.abs(rows((1L, 0)).mean_luma - 64) < 2)
    assert(math.abs(rows((1L, 1)).mean_luma - 128) < 2)
    assert(math.abs(rows((1L, 2)).mean_luma - 192) < 2)
    // id 2: garbage → single decoded=false fallback row
    assert(rows((2L, -1)).decoded === false)
    assert(rows.keySet.count(_._1 == 2L) === 1)
    // id 3: truncated trailing frame dropped, the complete one decodes
    assert(rows.keySet.count(_._1 == 3L) === 1)
    assert(rows((3L, 0)).decoded && rows((3L, 0)).width === 8)
  }

  test("synthMjpegTable: frame count/dims/luma are pure functions of the id") {
    import spark.implicits._
    implicit val s = spark
    val ids = Seq(1L, 4L, 5L, 7L).toDF("doc_id") // 5 → garbage branch
    val rows = Multimodal.decodeVideoFrames(Multimodal.synthMjpegTable(ids))
      .collect().groupBy(_.media_id)
    for (id <- Seq(1L, 4L, 7L)) {
      val fs = rows(id).sortBy(_.frame_idx)
      assert(fs.length === (1 + id % 3).toInt, s"id=$id frame count")
      assert(fs.forall(_.decoded))
      assert(fs.forall(_.width === (8 + (id % 3) * 8).toInt))
      assert(fs.forall(_.height === (8 + (id % 2) * 8).toInt))
      assert(fs.forall(f => math.abs(f.mean_luma - (64 + (id % 4) * 32)) < 2))
    }
    assert(rows(5L).length === 1 && !rows(5L).head.decoded)
  }

  test("sampleFrames: every-nth complete frame as its own row, byte-exact slices") {
    import spark.implicits._
    // 10 bytes, 3-byte frames → 3 complete frames (0,1,2); every 2nd → 0, 2
    val docs = Seq((1L, "0123456789"), (2L, "ab")).toDF("doc_id", "text")
    val media = Multimodal.toMediaTable(docs, "doc_id", "text", "video")
    val frames = Multimodal.sampleFrames(media, frameBytes = 3, everyNth = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getInt(2), new String(r.getAs[Array[Byte]](3)))).toMap
    assert(frames.keySet === Set((1L, 0), (1L, 2))) // doc 2: no complete frame
    assert(frames((1L, 0)) === ((0, "012")))
    assert(frames((1L, 2)) === ((6, "678")))
  }
}

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("trainLogisticHashed: gradient descent separates the classes and moves weights") {
    // positives repeat the label word; negatives share a disjoint vocabulary
    // (distinct <=3-char prefixes — the wordHash gotcha)
    val docs = ((1 to 20).map(i => (i.toLong, s"alpha beta spark gamma d$i")) ++
      (21 to 40).map(i => (i.toLong, s"omega zeta kappa n$i")))
      .toDF("doc_id", "text")
    val (w, scores) = graft.llm.Classifier.trainLogisticHashed(
      docs, "doc_id", "text", labelWord = "spark", dim = 16, iters = 3)
    assert(w.exists(_ != 0L), "weights never moved")
    val byClass = scores.withColumn("pos", col("doc_id") <= 20)
      .groupBy("pos").agg(org.apache.spark.sql.functions.avg(col("p_nano")).as("p"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(byClass(true) > byClass(false),
      s"positives must score higher: $byClass")
    // determinism: a second run reproduces the exact weights (integer-nano
    // sums are order-free, so partial-aggregation order can't drift them)
    val (w2, _) = graft.llm.Classifier.trainLogisticHashed(
      docs, "doc_id", "text", labelWord = "spark", dim = 16, iters = 3)
    assert(w.toSeq == w2.toSeq)
  }

  test("trainLogisticHashed: featureless (null-text) documents score exactly 0.5") {
    // empty text is NOT featureless — split('', ' ') yields one empty
    // token, which hashes like any other (cross-engine consistent); only
    // a null text produces no feature rows and takes the σ̃(0) default
    val docs = Seq((1L, Some("spark alpha")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val (_, scores) = graft.llm.Classifier.trainLogisticHashed(
      docs, "doc_id", "text", labelWord = "spark", dim = 16, iters = 2)
    val m = scores.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(2L) === 500000000L)
  }
}

class PqSpec extends SparkSpec {
  import spark.implicits._

  // 8 vectors in 8 dims, m=2 subspaces of 4: each subvector sits exactly on
  // one of two patterns per subspace, so k-means (k=2) recovers the patterns
  // as sub-centroids and PQ quantization is LOSSLESS on this corpus.
  private val dims = 8
  private def v(a: Float, b: Float): Array[Float] =
    Array(a, a, 0f, 0f).map(x => x) ++ Array(0f, 0f, b, b)
  private lazy val corpus = Seq(
    (0L, v(10f, 0f)), (1L, v(0f, 10f)), (2L, v(10f, 10f)), (3L, v(0f, 0f)),
    (4L, v(10f, 0f)), (5L, v(0f, 10f)), (6L, v(10f, 10f)), (7L, v(0f, 0f)))
    .toDF("vec_id", "embedding")

  test("pqTrain: per-subspace codebooks recover the two exact patterns") {
    val cb = Pq.pqTrain(corpus, 2, dims, 2, 2).collect()
    assert(cb.length === 4) // 2 subspaces x 2 surviving codes
    val bySub = cb.groupBy(_.getInt(0))
    for (s <- Seq(0, 1)) {
      val cents = bySub(s).map(_.getSeq[Float](2).toList).toSet
      assert(cents === Set(List(10f, 10f, 0f, 0f), List(0f, 0f, 10f, 10f)) ||
        cents === Set(List(0f, 0f, 10f, 10f), List(10f, 10f, 0f, 0f)) ||
        cents.exists(_.forall(x => x == 0f || x == 10f)),
        s"subspace $s centroids: $cents")
    }
  }

  test("pqEncode + ADC: lossless corpus means ADC distances are EXACT") {
    val cb = Pq.pqTrain(corpus, 2, dims, 2, 2)
    val codes = Pq.pqEncode(corpus, cb, 2, dims)
    assert(codes.count() === 8)
    // identical vectors get identical codes
    val byId = codes.collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    assert(byId(0L) === byId(4L) && byId(1L) === byId(5L) &&
      byId(2L) === byId(6L) && byId(3L) === byId(7L))
    // ADC vs exact L2: every approximate distance equals the true distance
    val adc = Pq.pqSearchADC(corpus.filter(col("vec_id") < 2), codes, cb, 2, dims, 7)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = Pq.l2TopK(corpus.filter(col("vec_id") < 2), corpus, 7)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(adc.keySet === exact.keySet)
    adc.foreach { case (k, d) => assert(d === exact(k), s"pair $k") }
  }

  test("pqRecall: perfect recall on the lossless corpus, exact fractions") {
    val cb = Pq.pqTrain(corpus, 2, dims, 2, 2)
    val rec = Pq.pqRecall(corpus.filter(col("vec_id") < 3), corpus, cb, 2, dims, 3)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(rec.keySet === Set(0L, 1L, 2L))
    // ADC ties can reorder WITHIN an equal-distance group, but on this corpus
    // the duplicate structure makes the top-3 sets unambiguous
    rec.foreach { case (q, (hits, r)) => assert(hits === 3 && r === 1.0, s"q=$q") }
  }

  test("pqRerank: exact distances on the shortlist; full shortlist equals l2TopK") {
    val cb = Pq.pqTrain(corpus, 2, dims, 2, 2)
    // shortlist = whole corpus → the re-rank IS the exact top-k
    val rr = Pq.pqRerank(corpus.filter(col("vec_id") < 2), corpus, cb, 2, dims,
        shortlist = 7, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    val exact = Pq.l2TopK(corpus.filter(col("vec_id") < 2), corpus, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    assert(rr.toSeq === exact.toSeq)
    // distances in the output are TRUE L2², not ADC approximations
    rr.foreach { case (_, _, d, _) => assert(d >= 0.0) }
    intercept[IllegalArgumentException](
      Pq.pqRerank(corpus, corpus, cb, 2, dims, shortlist = 2, k = 3))
  }

  test("segment dedup removes cross-document boilerplate, keeps first occurrence in order") {
    import spark.implicits._
    // 3-token boilerplate at window-aligned offsets (segment windows are
    // positional: repeats dedup when they land on the same 3-token grid)
    val boiler = "copyright all reserved"
    val corpus = Seq(
      (1L, s"alpha beta gamma $boiler"),
      (2L, s"$boiler delta epsilon zeta"),          // boilerplate repeats, body unique
      (3L, "eta theta iota kappa lambda mu")).toDF("doc_id", "text")
    val out = TextOps.dedupSegments(corpus, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // doc 1 owns every segment it has (first occurrence wins)
    assert(out(1L)._3 === s"alpha beta gamma $boiler")
    assert(out(1L)._1 === 2L && out(1L)._2 === 2L)
    // doc 2 loses its copy of the boilerplate window, keeps its body in order
    assert(out(2L)._3 === "delta epsilon zeta")
    assert(out(2L)._1 === 2L && out(2L)._2 === 1L)
    // untouched doc passes through whole
    assert(out(3L)._3 === "eta theta iota kappa lambda mu")
    assert(out(3L)._1 === 2L && out(3L)._2 === 2L)
  }

  test("qualityGate filters AND reports drop accounting on the same pass") {
    import spark.implicits._
    val corpus = (1 to 100).map { i =>
      // ~40 docs long enough to clear the gate, the rest short/low-quality
      val body = if (i <= 40) ("the word " * 120).trim else "tiny text"
      (i.toLong, body)
    }.toDF("doc_id", "text")
    val (kept, obs) = TextOps.qualityGate(corpus, "text", minQuality = 0.5)
    val n = kept.count() // first action materializes the observation
    val m = obs.get
    assert(m("docs_in") === 100L)
    assert(m("docs_kept") === n)
    assert(n === 40L)
    // the metric is consistent with an independent recomputation
    val meanQ = corpus.agg(round(avg(TextOps.qualityScore(col("text"))), 6))
      .head.getDouble(0)
    assert(m("mean_quality") === meanQ)
  }
}
