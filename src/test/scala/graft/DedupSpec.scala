package graft

import graft.llm.Dedup
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MinHash+LSH vs brute-force shingle-set Jaccard on sf0.001:
  * every reported pair must truly have J ≥ τ (precision 100% — the exact
  * re-check guarantees it) and high-similarity pairs (J ≥ 0.8) must be
  * recalled (8 bands × 4 rows ⇒ P[detect J=0.8] ≈ 1 - (1-0.8^4)^8 ≈ 0.99). */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def shingleSets = {
    val docs = Tables(spark, TestSpark.sf, "documents")
    docs.select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), posexplode(col("t")).as(Seq("i", "w")))
      .withColumn("n1", lead(col("w"), 1).over(Window.partitionBy("doc_id").orderBy("i")))
      .withColumn("n2", lead(col("w"), 2).over(Window.partitionBy("doc_id").orderBy("i")))
      .filter(col("n2").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("w"), col("n1"), col("n2")).as("s"))
      .groupBy("doc_id").agg(collect_set(col("s")).as("tokens"))
  }

  private lazy val bruteForce: Map[(Long, Long), Double] = {
    val sets = shingleSets.collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    (for {
      (a, sa) <- sets.toSeq
      (b, sb) <- sets.toSeq if a < b
      inter = (sa & sb).size
      if inter > 0
      j = inter.toDouble / (sa | sb).size
    } yield (a, b) -> j).toMap
  }

  private lazy val lsh: Map[(Long, Long), Double] =
    Dedup.minHashDedup(shingleSets, numHashes = 32, bands = 8, tau = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("precision: every reported pair truly has J >= 0.3") {
    lsh.foreach { case (pair, j) =>
      val truth = bruteForce.getOrElse(pair, 0.0)
      assert(truth >= 0.3, s"pair $pair reported j=$j but true j=$truth")
      assert(math.abs(truth - j) < 1e-3)
    }
  }

  test("recall: all J >= 0.8 pairs are found") {
    val strong = bruteForce.filter(_._2 >= 0.8).keySet
    assert(strong.nonEmpty, "corpus should contain planted near-dups")
    val missed = strong -- lsh.keySet
    assert(missed.isEmpty, s"missed strong pairs: $missed")
  }

  test("exact dedup is idempotent") {
    val once = SparkEntry.queries("q_dedup_exact")(spark, TestSpark.sf)
    assert(once.count() == once.distinct().count())
  }

  test("64/32 banding (the q_dedup_fuzzy oracle contract) equals brute force exactly") {
    // Precision is exact by construction (re-check); recall at J>=0.9 is
    // 1-(1-J^2)^32 ~ 1-1e-23, and the corpus has no pairs between 0.15 and
    // 0.9 — so the LSH pair set must EQUAL the brute-force one.
    val lsh6432 = Dedup.minHashDedup(shingleSets, numHashes = 64, bands = 32, tau = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = bruteForce.filter(_._2 >= 0.3).keySet
    assert(lsh6432 == exact,
      s"missing=${exact -- lsh6432} extra=${lsh6432 -- exact}")
  }

  test("connectedComponents: min-label propagation over chain, triangle, singleton pair") {
    import spark.implicits._
    // chain 1-2-3-4, triangle 10-11-12 (+edge 11-12), pair 20-21
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("a", "b")
    val got = Dedup.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("cluster query: labels are closed under the pair graph and survivors are minima") {
    val pairs = Dedup.minHashDedup(shingleSets, numHashes = 64, bands = 32, tau = 0.3)
      .select(col("da"), col("db")).collect().map(r => (r.getLong(0), r.getLong(1)))
    val labels = SparkEntry.queries("q_dedup_cluster")(spark, TestSpark.sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.foreach { case (a, b) =>
      assert(labels(a) == labels(b), s"pair ($a,$b) split across clusters")
    }
    labels.groupBy(_._2).foreach { case (lbl, members) =>
      assert(members.keys.min == lbl, s"cluster $lbl survivor is not the min id")
    }
  }

  test("simhash pigeonhole banding finds EVERY pair within hamming <= 3") {
    graft.functions.VectorFunctions.register(spark)
    val sigs = Tables(spark, TestSpark.sf, "documents")
      .select(col("doc_id"),
        graft.functions.VectorFunctions.simhash(split(col("text"), " ")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (a, ha) <- sigs; (b, hb) <- sigs if a < b
      h = java.lang.Long.bitCount(ha ^ hb) if h <= 3
    } yield (a, b)).toSet
    val blocked = SparkEntry.queries("q_dedup_simhash")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked == brute,
      s"pigeonhole blocking must be exhaustive: missing=${brute -- blocked} extra=${blocked -- brute}")
  }
}
