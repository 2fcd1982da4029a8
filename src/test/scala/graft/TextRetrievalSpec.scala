package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Brute-force and invariant checks for the retrieval/robust-stats family:
  * inverted index, BM25 scoring, the linear quality classifier, the dyadic
  * EMA window, and the median/MAD outlier gate.
  */
class TextRetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("inverted index: df equals posting length and every posting doc contains the token") {
    val out = SparkEntry.queries("q_text_inverted_index")(spark, TestSpark.sf).collect()
    assert(out.nonEmpty)
    val byDoc = Tables(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    out.foreach { r =>
      val token = r.getString(0)
      val df = r.getLong(1)
      // postings are serialized ("1,5,9") — the oracle harness cannot sort
      // raw list cells, so the query emits the q_agg_collect string form
      val postings = r.getString(2).split(",").map(_.toLong).toSeq
      assert(postings.length == df, s"$token: df $df != postings ${postings.length}")
      assert(postings == postings.sorted, s"$token postings unsorted")
      postings.foreach(d => assert(byDoc(d).contains(token), s"doc $d lacks '$token'"))
    }
  }

  test("bm25: returned docs contain a query term; higher tf at equal dl scores higher") {
    val out = SparkEntry.queries("q_text_bm25")(spark, TestSpark.sf).collect()
    assert(out.nonEmpty)
    val qterms = Set("table", "query", "vector")
    val byDoc = Tables(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    out.foreach { r =>
      val (doc, nTerms, score) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      val matched = byDoc(doc).toSet.intersect(qterms)
      assert(matched.nonEmpty, s"doc $doc matches no query term")
      assert(matched.size == nTerms, s"doc $doc n_terms $nTerms != ${matched.size}")
      assert(score > 0.0)
    }
    // Monotonicity in tf: synthesize two docs with identical length, one
    // repeating the term twice — its per-term BM25 component must be larger
    // (k1 damping shrinks but never reverses the gain).
    val k1 = 1.2; val b = 0.75
    def s(tf: Int, dl: Int, avgdl: Double, n: Double, df: Double): Double =
      math.log(1.0 + (n - df + 0.5) / (df + 0.5)) *
        (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))
    assert(s(2, 40, 40.0, 500, 100) > s(1, 40, 40.0, 500, 100))
    assert(s(1, 20, 40.0, 500, 100) > s(1, 80, 40.0, 500, 100)) // shorter doc wins
  }

  test("quality classifier: logit is the mean hash weight, run-deterministic, keep = logit>0") {
    val out1 = SparkEntry.queries("q_quality_classifier")(spark, TestSpark.sf).collect()
    val out2 = SparkEntry.queries("q_quality_classifier")(spark, TestSpark.sf).collect()
    assert(out1.sameElements(out2), "classifier must be run-deterministic")
    assert(out1.nonEmpty)
    out1.foreach { r =>
      val (logit, keep) = (r.getDouble(2), r.getBoolean(3))
      assert(logit >= -1.0 && logit < 1.0, s"logit $logit out of weight range")
      assert(keep == (logit > 0.0))
    }
    // both classes must actually occur on the corpus (a degenerate
    // all-keep/all-drop gate would be useless as a filter)
    assert(out1.exists(_.getBoolean(3)) && out1.exists(!_.getBoolean(3)))
  }

  test("dyadic EMA matches a brute-force recomputation per user") {
    val rows = SparkEntry.queries("q_window_ema")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    // brute force: for each user, events in (ts, event_id) order — the
    // query emits ordered by event_id, and event ids are assigned in ts
    // order per the corpus, so recompute from the emitted (value) sequence
    // grouped by user in emitted order.
    val byUser = Tables(spark, TestSpark.sf, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0),
        (r.getAs[java.time.LocalDateTime](1)
          .toInstant(java.time.ZoneOffset.UTC).toEpochMilli,
          r.getLong(2), r.getDouble(3))))
      .groupBy(_._1).map { case (u, xs) =>
        val ordered = xs.map(_._2).sortBy(t => (t._1, t._2))
        u -> ordered.zipWithIndex.map { case ((_, eid, _), i) =>
          val window = ordered.slice(math.max(0, i - 7), i + 1).map(_._3).reverse
          val ema = window.zipWithIndex.map { case (v, j) => v * math.pow(0.5, j + 1) }.sum
          eid -> ema
        }.toMap
      }
    rows.foreach { case (eid, uid, _, ema) =>
      val expect = byUser(uid)(eid)
      assert(math.abs(ema - expect) < 1e-9, s"event $eid: $ema != $expect")
    }
  }

  test("textrank: fixed-point PageRank matches a brute-force integer recomputation") {
    val out = SparkEntry.queries("q_text_rank")(spark, TestSpark.sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty)
    // rebuild the graph + 10 fixed-point iterations in plain Scala
    val docs = Tables(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
    val nDocs = docs.length
    val pairCounts = docs.flatMap { case (_, ts) =>
      val sorted = ts.toSeq.sorted
      for (i <- sorted.indices; j <- (i + 1) until sorted.length)
        yield (sorted(i), sorted(j))
    }.groupBy(identity).map { case (p, xs) => p -> xs.length }
    // .toSeq first: collect on a Map rebuilding key-value tuples would
    // dedupe edges by their first token
    val edges = pairCounts.toSeq.collect { case ((a, b), n) if n * 5 >= nDocs => (a, b) }
    val und = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = und.groupBy(_._1).map { case (k, xs) => k -> xs.length.toLong }
    var pr = deg.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to 10) {
      val shares = und.groupBy(_._2).map { case (dst, ins) =>
        dst -> ins.map { case (src, _) => pr(src) / deg(src) }.sum
      }
      pr = shares.map { case (t, s) => t -> (150000L + s * 17 / 20) }
    }
    val expectTop = pr.toSeq.sortBy { case (t, r) => (-r, t) }.take(50).toMap
    out.foreach { case (t, r) =>
      assert(expectTop(t) == r, s"$t: got $r expected ${expectTop(t)}")
    }
  }

  test("expectations: planted violations are counted exactly") {
    import spark.implicits._
    // 3 rows: one clean, one with quantity out of range, one duplicated key
    val df = Seq(
      (1L, 1, 5.0, 100.0, 0.05, "A"),
      (2L, 1, 99.0, -10.0, 0.5, "X"),
      (3L, 1, 5.0, 100.0, 0.05, "N"),
      (3L, 1, 5.0, 100.0, 0.05, "N"))
      .toDF("k", "ln", "qty", "price", "disc", "flag")
    val out = df.agg(
      sum(when(!col("qty").between(1, 50), 1L).otherwise(0L)).as("qty_bad"),
      sum(when(col("price") <= 0, 1L).otherwise(0L)).as("price_bad"),
      sum(when(!col("flag").isin("A", "N", "R"), 1L).otherwise(0L)).as("flag_bad"),
      sum(when(col("disc") < 0 || col("disc") > 0.1, 1L).otherwise(0L)).as("disc_bad"),
      (count(lit(1)) - countDistinct(struct(col("k"), col("ln"), col("qty"),
        col("price"), col("disc"), col("flag")))).as("dup")).head()
    assert((out.getLong(0), out.getLong(1), out.getLong(2), out.getLong(3),
      out.getLong(4)) == ((1L, 1L, 1L, 1L, 1L)))
    // corpus-level suite runs and emits one row per rule with pass flags
    val rules = SparkEntry.queries("q_expectations")(spark, TestSpark.sf).collect()
    assert(rules.length == 7)
    rules.foreach(r => assert(r.getBoolean(2) == (r.getLong(1) == 0L)))
  }

  test("dedup_span: every reported span really occurs in >1 doc, brute-forced") {
    val out = SparkEntry.queries("q_dedup_span")(spark, TestSpark.sf).collect()
    assert(out.nonEmpty)
    val docs = Tables(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
    val spanDocs = scala.collection.mutable.Map.empty[String, Set[Long]]
    val spanOccur = scala.collection.mutable.Map.empty[String, Int]
    docs.foreach { case (id, t) =>
      if (t.length >= 16) {
        // mirror the query: k in 0..floor((n-16)/8)
        (0 to (t.length - 16) / 8).foreach { k =>
          val span = t.slice(k * 8, k * 8 + 16).mkString(" ")
          spanDocs(span) = spanDocs.getOrElse(span, Set.empty) + id
          spanOccur(span) = spanOccur.getOrElse(span, 0) + 1
        }
      }
    }
    val expected = spanDocs.filter(_._2.size > 1)
    assert(out.length == expected.size, s"${out.length} != ${expected.size}")
    val md5Of = expected.map { case (span, ids) =>
      java.security.MessageDigest.getInstance("MD5").digest(
        span.getBytes("UTF-8")).map("%02x".format(_)).mkString ->
        (ids.size.toLong, spanOccur(span).toLong, ids.min)
    }
    out.foreach { r =>
      val (fp, nd, no, first) = (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(md5Of(fp) == ((nd, no, first)), s"span $fp mismatch")
    }
  }

  test("recursive CTE reachability agrees with a Scala BFS over the same graph") {
    val out = SparkEntry.queries("q_recursive_cte")(spark, TestSpark.sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty && out("table") == 0L)
    val docs = Tables(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
    val nDocs = docs.length
    val pairCounts = docs.flatMap { case (_, ts) =>
      val sorted = ts.toSeq.sorted
      for (i <- sorted.indices; j <- (i + 1) until sorted.length)
        yield (sorted(i), sorted(j))
    }.groupBy(identity).map { case (p, xs) => p -> xs.length }
    val adj = pairCounts.toSeq.collect { case ((a, b), n) if n * 5 >= nDocs => Seq(a -> b, b -> a) }
      .flatten.groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).toSet }
    // BFS from 'table', depth <= 2 (matching the query's hop guard)
    var frontier = Set("table"); var seen = Map("table" -> 0L)
    for (hop <- 1 to 2) {
      frontier = frontier.flatMap(adj.getOrElse(_, Set.empty)).diff(seen.keySet)
      seen ++= frontier.map(_ -> hop.toLong)
    }
    assert(out == seen, s"reachability mismatch: ${out.size} vs ${seen.size}")
  }

  test("graph triangles: every emitted triple is a real triangle and none is missed") {
    val out = SparkEntry.queries("q_graph_triangles")(spark, TestSpark.sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val docs = Tables(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
    val nDocs = docs.length
    val pairCounts = docs.flatMap { case (_, ts) =>
      val sorted = ts.toSeq.sorted
      for (i <- sorted.indices; j <- (i + 1) until sorted.length)
        yield (sorted(i), sorted(j))
    }.groupBy(identity).map { case (p, xs) => p -> xs.length }
    // .toSeq first: collect-ing (a, b) pairs straight off the Map would
    // rebuild a Map keyed by `a` and silently drop all but one edge per key
    val edges = pairCounts.toSeq.collect { case ((a, b), n) if n * 5 >= nDocs => (a, b) }.toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val expected = (for {
      a <- nodes; b <- nodes if a < b && edges((a, b))
      c <- nodes if b < c && edges((b, c)) && edges((a, c))
    } yield (a, b, c)).toSet
    assert(out == expected, s"${out.size} vs ${expected.size} triangles")
  }

  test("lm_score: brute-force unigram log-prob agrees per doc") {
    val out = SparkEntry.queries("q_text_lm_score")(spark, TestSpark.sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.nonEmpty)
    val docs = Tables(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
    val freq = docs.flatMap(_._2).groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val total = freq.values.sum.toDouble
    docs.foreach { case (id, ts) =>
      val n = ts.length
      val lp = ts.groupBy(identity).map { case (t, xs) =>
        xs.length * math.log(freq(t) / total)
      }.sum
      val (gotN, gotScore) = out(id)
      assert(gotN == n, s"doc $id n_tokens")
      assert(math.abs(gotScore - lp / n) < 1e-3, s"doc $id: $gotScore vs ${lp / n}")
      assert(gotScore < 0.0, "log-prob of a non-trivial doc must be negative")
    }
  }

  test("bigrams: brute-force adjacency tally and conditional probability agree") {
    val out = SparkEntry.queries("q_text_bigrams")(spark, TestSpark.sf).collect()
    assert(out.length == 50)
    val docs = Tables(spark, TestSpark.sf, "documents")
      .select(split(col("text"), " ").as("t")).collect()
      .map(_.getSeq[String](0))
    val pairCounts = docs.filter(_.length >= 2)
      .flatMap(t => t.zip(t.tail))
      .groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
    val firstCounts = pairCounts.toSeq.groupBy(_._1._1)
      .map { case (w1, xs) => w1 -> xs.map(_._2).sum }
    out.foreach { r =>
      val (w1, w2, n, p) = (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))
      assert(pairCounts((w1, w2)) == n, s"($w1,$w2): $n")
      val expP = math.rint(n.toDouble / firstCounts(w1) * 1e4) / 1e4
      assert(math.abs(p - expP) < 1e-9, s"($w1,$w2): p $p vs $expP")
    }
    // the emitted 50 are exactly the top-50 under the total (n desc, w1, w2) order
    val top = pairCounts.toSeq.map { case ((a, b), n) => (-n, a, b) }.sorted.take(50)
    assert(out.map(r => (-r.getLong(2), r.getString(0), r.getString(1))).toSeq == top)
  }

  test("graph degree distribution sums to token count and 2x edge count") {
    val out = SparkEntry.queries("q_graph_degree")(spark, TestSpark.sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(out.nonEmpty)
    val docs = Tables(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
    val nDocs = docs.length
    val pairCounts = docs.flatMap { case (_, ts) =>
      val sorted = ts.toSeq.sorted
      for (i <- sorted.indices; j <- (i + 1) until sorted.length)
        yield (sorted(i), sorted(j))
    }.groupBy(identity).map { case (p, xs) => p -> xs.length }
    val edges = pairCounts.toSeq.collect { case ((a, b), n) if n * 5 >= nDocs => (a, b) }
    val degs = edges.flatMap { case (a, b) => Seq(a, b) }.groupBy(identity)
      .map { case (_, xs) => xs.length.toLong }
    // histogram of degrees matches
    val hist = degs.groupBy(identity).map { case (d, xs) => d -> xs.size.toLong }
    assert(out.toMap == hist)
    // sum(degree * n_tokens) = 2 |E|
    assert(out.map { case (d, n) => d * n }.sum == 2L * edges.length)
  }

  test("MAD gate flags a planted far outlier and not the bulk") {
    import spark.implicits._
    val vals = (1 to 99).map(i => ("x", i.toLong, 10.0 + (i % 5))) :+ (("x", 100L, 500.0))
    val df = vals.toDF("lang", "doc_id", "m")
    val med = df.groupBy("lang").agg(expr("percentile(m, 0.5)").as("med"))
    val dev = df.join(med, "lang").withColumn("dev", abs(col("m") - col("med")))
    val mad = dev.groupBy("lang").agg(expr("percentile(dev, 0.5)").as("mad"))
    val flagged = dev.join(mad, "lang")
      .filter(col("dev") > lit(3.0) * lit(1.4826) * col("mad"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(flagged == Set(100L), s"flagged $flagged")
    // and the corpus-level operator runs non-degenerately
    val nDocs = Tables(spark, TestSpark.sf, "documents").count()
    val out = SparkEntry.queries("q_outlier_mad")(spark, TestSpark.sf).collect()
    assert(out.length < nDocs / 2, "MAD gate must not flag the bulk of the corpus")
  }

  test("cross-lingual overlap: complete lower triangle, Jaccard bounded by vocab sizes") {
    val rows = SparkEntry.queries("q_cross_lingual_overlap")(spark, TestSpark.sf)
      .collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getDouble(4)))
    val vocab = Tables(spark, TestSpark.sf, "documents")
      .select(col("lang"), explode(split(col("text"), " ")).as("t"))
      .distinct().groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val k = vocab.size
    assert(rows.length == k * (k - 1) / 2, "lower triangle incomplete")
    rows.foreach { case (a, b, inter, uni, j) =>
      assert(a < b, "pair not canonically ordered")
      assert(inter <= math.min(vocab(a), vocab(b)))
      assert(uni >= math.max(vocab(a), vocab(b)))
      assert(j >= 0.0 && j <= 1.0)
      assert(math.abs(j - inter.toDouble / uni) < 1e-3)
    }
  }

  test("vocab coverage table matches a brute-force frequency prefix scan") {
    val freq = Tables(spark, TestSpark.sf, "documents")
      .select(explode(split(col("text"), " ")).as("t"))
      .groupBy("t").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .sortBy { case (t, c) => (-c, t) }
    val total = freq.map(_._2).sum
    val cums = freq.scanLeft(0L)(_ + _._2).drop(1)
    val rows = SparkEntry.queries("q_vocab_coverage")(spark, TestSpark.sf)
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(50L, 90L, 95L, 99L))
    rows.foreach { r =>
      val (pct, size, covered, tot) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(tot == total)
      val expectedSize = cums.indexWhere(_ * 100 >= pct * total) + 1
      assert(size == expectedSize, s"pct $pct: $size vs $expectedSize")
      assert(covered == cums(expectedSize - 1))
      // minimality: one token fewer must NOT reach the target
      if (expectedSize > 1)
        assert(cums(expectedSize - 2) * 100 < pct * total)
    }
  }

  test("ndcg/mrr bounded and consistent with a brute-force ranking for q1") {
    val rows = SparkEntry.queries("q_rank_ndcg")(spark, TestSpark.sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(rows.keySet == Set("q1", "q2", "q3"))
    rows.values.foreach { case (ndcg, mrr) =>
      assert(ndcg >= 0.0 && ndcg <= 1.0 + 1e-9, s"ndcg out of range: $ndcg")
      assert(mrr >= 0.0 && mrr <= 1.0, s"mrr out of range: $mrr")
    }
    // brute force q1: term=spark, relterm=join
    val docs = Tables(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("ts")).collect()
      .map(r => (r.getLong(0), r.getSeq[String](1)))
    val scored = docs.map { case (id, ts) =>
      (id, ts.count(_ == "spark").toLong, ts.count(_ == "join").toLong) }
    val top = scored.filter(_._2 > 0).sortBy(t => (-t._2, t._1)).take(10)
    def dcg(rels: Seq[Long]): Double =
      rels.zipWithIndex.map { case (rel, i) =>
        math.round(1e8 * rel / (math.log(i + 2) / math.log(2))) / 1e8 }.sum
    val ideal = scored.filter(_._3 > 0).sortBy(t => (-t._3, t._1)).take(10)
    val expNdcg = dcg(top.map(_._3).toSeq) / dcg(ideal.map(_._3).toSeq)
    assert(math.abs(rows("q1")._1 - expNdcg) < 1e-3,
      s"q1 ndcg ${rows("q1")._1} vs brute $expNdcg")
    val firstRel = top.indexWhere(_._3 > 0)
    val expMrr = if (firstRel < 0) 0.0 else 1.0 / (firstRel + 1)
    assert(math.abs(rows("q1")._2 - expMrr) < 1e-3)
  }

  test("tokenizer fertility >= 1 per language (subwords never fewer than words)") {
    val rows = SparkEntry.queries("q_tokenizer_fertility")(spark, TestSpark.sf)
      .collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"${r.getString(0)}: bpe < ws tokens")
      assert(r.getDouble(3) >= 1.0)
    }
  }

  test("context budget table: losses shrink and utilization behaves as budget grows") {
    val rows = SparkEntry.queries("q_context_budget")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getLong(5), r.getDouble(6)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(32L, 64L, 128L))
    assert(rows.map(_._2).distinct.length == 1, "doc counts differ per budget")
    assert(rows.map(_._5).distinct.length == 1, "token totals differ per budget")
    // more budget → fewer truncations, less loss
    assert(rows.map(_._3).toSeq == rows.map(_._3).sorted.reverse.toSeq)
    assert(rows.map(_._6).toSeq == rows.map(_._6).sorted.reverse.toSeq)
    rows.foreach { case (b, docs, trunc, share, total, lost, util) =>
      assert(util > 0.0 && util <= 1.0)
      assert(lost <= total && trunc <= docs)
      assert(math.abs(share - trunc.toDouble / docs) < 1e-3)
      // kept = total - lost must equal util * docs * budget (r4 slack)
      assert(math.abs((total - lost).toDouble / (docs * b) - util) < 1e-3)
    }
  }

  test("q_token_drift: PSI >= 0 for every source, all sources covered") {
    val rows = SparkEntry.queries("q_token_drift")(spark, TestSpark.sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    val sources = Tables(spark, TestSpark.sf, "documents")
      .select("source").distinct().count()
    assert(rows.length == sources)
    // PSI is a sum of (p-q)ln(p/q) terms, each individually >= 0
    rows.foreach { case (src, psi) =>
      assert(psi >= -1e-4, s"$src: negative PSI $psi")
    }
  }

  test("q_text_logodds: z matches a brute-force recount; ordered desc; min-count respected") {
    val rows = SparkEntry.queries("q_text_logodds")(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    val zs = rows.map(_.getDouble(3))
    assert(zs.sameElements(zs.sorted.reverse), "not z-descending")
    rows.foreach(r => assert(r.getLong(1) + r.getLong(2) >= 20, "min-count"))
    // brute-force the top row's z from the raw corpus
    val docs = Tables(spark, TestSpark.sf, "documents")
      .select(col("lang"), split(col("text"), " ").as("t")).collect()
      .map(r => (r.getString(0) == "en", r.getSeq[String](1)))
    val all = docs.flatMap { case (en, ts) => ts.map(t => (t, en)) }
    val v = all.map(_._1).distinct.length.toLong
    val n1 = all.count(_._2).toLong
    val n2 = all.length - n1
    val top = rows.head
    val tok = top.getString(0)
    val y1 = all.count(p => p._1 == tok && p._2).toLong
    val y2 = all.count(p => p._1 == tok && !p._2).toLong
    assert(y1 == top.getLong(1) && y2 == top.getLong(2))
    val dlt = math.log((y1 + 1).toDouble / (n1 + v - y1 - 1)) -
      math.log((y2 + 1).toDouble / (n2 + v - y2 - 1))
    val z = dlt / math.sqrt(1.0 / (y1 + 1) + 1.0 / (y2 + 1))
    assert(math.abs(z - top.getDouble(3)) < 1e-3, s"z ${top.getDouble(3)} vs brute $z")
  }
}
