package graft

import graft.llm.Curation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the curation operators on sf0.001, asserting the
  * semantic claims the oracle hash-match can't express directly (brute-force
  * ground truth, split determinism, sampling-rate concentration). */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) = Curation.qs(name).fn(spark, TestSpark.sf)

  private lazy val docTokens: Map[Long, Seq[String]] =
    Tables(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap

  private def fiveGrams(t: Seq[String]): Set[String] =
    t.sliding(5).filter(_.size == 5).map(_.mkString(" ")).toSet

  test("k-anonymity: every published cohort has n >= 5 and totals are preserved") {
    val rows = run("q_k_anonymity").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getLong(2)))
    val (supp, pub) = rows.partition(_._1 == "*")
    assert(pub.forall(_._3 >= 5L), "published cohort below k")
    assert(supp.length <= 1 && supp.forall(_._2.isEmpty), "suppressed row leaks a band")
    val total = Tables(spark, TestSpark.sf, "customer").count()
    assert(rows.map(_._3).sum == total, "suppression must not drop records from the totals")
    // brute-force the cohort counts
    val brute = Tables(spark, TestSpark.sf, "customer")
      .join(Tables(spark, TestSpark.sf, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), (floor(col("c_acctbal") / 5000) * 5000).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val expPub = brute.filter(_._2 >= 5L).map { case ((n, b), c) => (n, Some(b), c) }.toSet
    assert(pub.toSet == expPub)
  }

  test("dp counts: deterministic, unbiased-shape noise, all groups published") {
    val a = run("q_dp_counts").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val b = run("q_dp_counts").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(a.toSeq == b.toSeq, "noise must be deterministic across runs")
    assert(a.length == Tables(spark, TestSpark.sf, "events")
      .select("event_type").distinct().count())
    a.foreach { case (t, n, noisy) =>
      assert(noisy != n.toDouble, s"$t: noise degenerated to zero")
      assert(math.abs(noisy - n) < 25.0, s"$t: |Laplace(b=1)| sample implausibly large")
    }
  }

  test("decontaminate matches brute-force 5-gram overlap vs the eval split") {
    val evalGrams = docTokens.collect {
      case (id, t) if id % 97 == 0 => fiveGrams(t)
    }.fold(Set.empty)(_ ++ _)
    val expected = docTokens.collect {
      case (id, t) if id % 97 != 0 =>
        id -> (fiveGrams(t) & evalGrams).size
    }
    val got = run("q_decontaminate").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet === expected.keySet)                // eval docs excluded
    expected.foreach { case (id, n) => assert(got(id) === n.toLong, s"doc $id") }
  }

  test("gopher pass is exactly the conjunction of its rule flags") {
    val rows = run("q_quality_gopher").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pass = r.getBoolean(r.fieldIndex("pass"))
      val conj = Seq("word_count_ok", "mean_len_ok", "alpha_ok", "stopword_ok")
        .forall(f => r.getBoolean(r.fieldIndex(f)))
      assert(pass === conj)
    }
  }

  test("repetition metrics match brute force per doc") {
    val got = run("q_repetition").collect().map { r =>
      r.getLong(0) -> (r.getDouble(r.fieldIndex("distinct_ratio")),
        r.getDouble(r.fieldIndex("top_token_frac")),
        r.getDouble(r.fieldIndex("top_bigram_frac")))
    }.toMap
    docTokens.filter(_._2.size >= 2).foreach { case (id, t) =>
      val bigrams = t.sliding(2).map(_.mkString(" ")).toSeq
      val exp = (
        t.distinct.size.toDouble / t.size,
        t.groupBy(identity).values.map(_.size).max.toDouble / t.size,
        bigrams.groupBy(identity).values.map(_.size).max.toDouble / bigrams.size)
      assert(got(id) === exp, s"doc $id")
    }
  }

  test("split_hash partitions the corpus exactly and near 80/10/10") {
    val rows = run("q_split_hash").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = docTokens.size.toLong
    assert(rows.values.sum === total)
    assert(rows.keySet === Set("train", "val", "test"))
    // 500 docs: binomial 6-sigma bands around 400/50/50.
    assert(math.abs(rows("train") - 0.8 * total) <= 6 * math.sqrt(total * 0.8 * 0.2))
    assert(math.abs(rows("val") - 0.1 * total) <= 6 * math.sqrt(total * 0.1 * 0.9))
  }

  test("mixture resample keeps rare sources whole-ish and downsamples at rate") {
    val rows = run("q_mixture_resample").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nOrig = r.getLong(r.fieldIndex("n_orig"))
      val nSel = r.getLong(r.fieldIndex("n_selected"))
      val rate = r.getDouble(r.fieldIndex("rate"))
      assert(rate > 0 && rate <= 1.0)
      assert(nSel <= nOrig)
      // Binomial 6-sigma concentration around nOrig * rate.
      assert(math.abs(nSel - nOrig * rate) <= 6 * math.sqrt(nOrig * rate * (1 - rate)) + 1)
    }
  }

  test("pii redaction finds the synthesized identifiers and strips them") {
    val rows = run("q_text_pii").collect()
    assert(rows.length === docTokens.size)
    rows.foreach { r =>
      assert(r.getInt(r.fieldIndex("n_email")) >= 1)
      assert(r.getInt(r.fieldIndex("n_ip")) >= 1)
      assert(r.getInt(r.fieldIndex("n_card")) >= 1)
    }
  }

  test("pii redaction is idempotent on already-clean text") {
    import spark.implicits._
    // A doc with no synthesized tail would redact to itself; here assert the
    // redacted text of a hand-built row hashes to the md5 of the expected
    // literal replacement.
    val df = Seq((1L, "reach me at a.b@x.io or 192.168.0.1")).toDF("doc_id", "text")
    val emailRe = "[0-9A-Za-z._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ipRe = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
    val red = df.select(regexp_replace(regexp_replace(col("text"),
      emailRe, "<EMAIL>"), ipRe, "<IP>").as("r")).head().getString(0)
    assert(red === "reach me at <EMAIL> or <IP>")
  }

  test("q_text_blocklist: zero rows survive for absent terms, counts match brute force, list broadcasts") {
    val df = run("q_text_blocklist")
    val rows = df.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet ==
      Set("slow", "error", "crash", "spark", "deprecated"))
    // brute-force recount from the collected corpus
    Seq("slow", "error", "crash", "spark", "deprecated").foreach { t =>
      val docs = docTokens.count(_._2.contains(t)).toLong
      val hits = docTokens.values.map(_.count(_ == t).toLong).sum
      assert(rows(t) == ((docs, hits)), s"$t: ${rows(t)} vs ($docs, $hits)")
    }
    // absent terms MUST still be emitted (the left-join contract)
    assert(rows("deprecated") == ((0L, 0L)))
    assert(rows("slow")._2 >= rows("slow")._1 && rows("slow")._1 > 0)
    // the blocklist relation must broadcast: the corpus-side explode is
    // filtered map-side before any exchange
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), "blocklist probe fell to SMJ")
  }

  test("q_quality_funnel: shares sum to 1 per lang, pass row equals q_quality_gopher") {
    val rows = run("q_quality_funnel").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val byLang = rows.groupBy(_._1)
    val docCounts = Tables(spark, TestSpark.sf, "documents")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byLang.foreach { case (lang, rs) =>
      assert(rs.map(_._3).sum == docCounts(lang), s"$lang census incomplete")
      assert(math.abs(rs.map(_._4).sum - 1.0) < 5e-4, s"$lang shares != 1")
    }
    // the funnel's survivor row must agree with the per-doc boolean query
    val gopherPass = run("q_quality_gopher").filter(col("pass"))
      .join(Tables(spark, TestSpark.sf, "documents").select("doc_id", "lang"),
        "doc_id")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byLang.foreach { case (lang, rs) =>
      val passRow = rs.filter(_._2 == "5_pass").map(_._3).sum
      assert(passRow == gopherPass.getOrElse(lang, 0L),
        s"$lang: funnel pass $passRow vs gopher ${gopherPass.get(lang)}")
    }
  }

  test("q_source_novelty matches a brute-force shingle uniqueness census") {
    val docs = Tables(spark, TestSpark.sf, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ").toSeq))
    val bySource = docs.groupBy(_._1).map { case (src, ds) =>
      src -> ds.flatMap(_._2.sliding(3).filter(_.length == 3)
        .map(_.mkString(" "))).toSet
    }
    val got = run("q_source_novelty").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got.keySet == bySource.keySet)
    bySource.foreach { case (src, shingles) =>
      val others = bySource.filter(_._1 != src).values.flatten.toSet
      val unique = shingles.count(!others.contains(_)).toLong
      val (n, u, nov) = got(src)
      assert(n == shingles.size.toLong, s"$src shingle count")
      assert(u == unique, s"$src unique: $u vs $unique")
      assert(math.abs(nov - unique.toDouble / shingles.size) < 1e-3)
    }
  }

  test("q_dsir: weights brute-force exactly and rank the English target slice first") {
    import org.apache.spark.unsafe.types.UTF8String
    val out = SparkEntry.queries("q_dsir")(spark, TestSpark.sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val docs = Tables(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def bucket(tok: String): Long =
      (graft.functions.VectorKernels.md5Lower64(
        UTF8String.fromString(tok)) >>> 11) % 64
    // per-doc bucket counts + the smoothed 64-bucket models
    val perDoc = docs.map { case (id, lang, text) =>
      (id, lang, text.split(" ", -1).map(bucket)
        .groupBy(identity).view.mapValues(_.length.toLong).toMap)
    }
    val cr = new Array[Long](64); val ct = new Array[Long](64)
    perDoc.foreach { case (_, lang, bs) =>
      bs.foreach { case (b, c) =>
        cr(b.toInt) += c; if (lang == "en") ct(b.toInt) += c } }
    val nt = ct.sum; val nr = cr.sum
    def w8(b: Int): Long =
      new java.math.BigDecimal(1e8 * (math.log(ct(b) + 1) - math.log(nt + 64)
        - math.log(cr(b) + 1) + math.log(nr + 64)))
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    var enSum = 0.0; var enN = 0; var otherSum = 0.0; var otherN = 0
    perDoc.foreach { case (id, lang, bs) =>
      val nTokens = bs.values.sum
      val logw = bs.map { case (b, c) => c * w8(b.toInt) }.sum
      assert(out(id) == ((nTokens, logw)),
        s"doc $id: got ${out(id)}, brute force ($nTokens, $logw)")
      val avg = logw.toDouble / nTokens
      if (lang == "en") { enSum += avg; enN += 1 }
      else { otherSum += avg; otherN += 1 }
    }
    // the semantic contract: importance weights must favor the target
    // distribution — mean per-token log weight of English docs above the
    // rest (this is WHY DSIR selects what it selects)
    assert(enN > 0 && otherN > 0, "corpus missing en or non-en docs")
    assert(enSum / enN > otherSum / otherN,
      s"en mean ${enSum / enN} not above non-en ${otherSum / otherN}")
  }
}
