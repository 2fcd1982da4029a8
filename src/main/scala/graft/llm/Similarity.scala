package graft.llm

import graft.{Q, Tables}
import graft.Q._
import graft.functions.VectorFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vector similarity search (SURVEY.md §2.5): brute-force cosine top-k as
  * the exact baseline, and an LSH-bucketed (random-hyperplane) approximate
  * variant as the scale path.
  *
  * 100 TB design: brute force broadcasts the (small) query set against the
  * partitioned corpus — a map-side nested loop with no shuffle until the
  * final per-query top-k (WindowGroupLimit keeps k rows per partition before
  * the exchange). The ANN variant buckets both sides by a deterministic
  * 8-bit hyperplane signature so each query only scans its bucket
  * (~1/256th of the corpus per probe).
  */
object Similarity {

  val qs: Map[String, Q] = Map(

    // Exact top-5 cosine neighbors for query vectors (vec_id < 10), via the
    // codegen'd CosineSimilarity expression; tie-break by vec_id.
    "q_similarity_topk" -> Q(
      fn = (s, d) => {
        VectorFunctions.register(s)
        val e = Tables(s, d, "embeddings")
          .select(col("vec_id"), transform(col("embedding"), _.cast(DoubleType)).as("v"))
        val queries = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("v").as("qv"))
        e.join(broadcast(queries), col("vec_id") =!= col("q_id"))
          .withColumn("cos", r4(VectorFunctions.cosineSim(col("qv"), col("v"))))
          .withColumn("rnk", rank().over(
            Window.partitionBy(col("q_id"))
              .orderBy(col("cos").desc, col("vec_id").asc)).cast(LongType))
          .filter(col("rnk") <= 5)
          .select("q_id", "vec_id", "cos", "rnk")
          .orderBy("q_id", "rnk", "vec_id")
      },
      oracle = Some("""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
        scored AS (
          SELECT q.q_id, e.vec_id,
                 CAST(ROUND(list_dot_product(q.qv, e.v) /
                   (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))), 4)
                   AS DOUBLE) AS cos
          FROM q JOIN e ON e.vec_id <> q.q_id),
        ranked AS (
          SELECT q_id, vec_id, cos,
                 rank() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rnk
          FROM scored)
        SELECT q_id, vec_id, cos, rnk FROM ranked WHERE rnk <= 5
        ORDER BY q_id, rnk, vec_id""")),

    // ANN: random-hyperplane LSH. Deterministic pseudo-planes — component j
    // of plane p is a hash-derived value in [-1, 1] — give every vector an
    // 8-bit signature; top-3 neighbors are searched within the same bucket
    // only. Approximate by construction → rows-only (recall asserted vs
    // brute force in SimilaritySpec).
    "q_similarity_ann" -> Q(
      fn = (s, d) => annTopK(s, Tables(s, d, "embeddings"), k = 3)
        .orderBy("q_id", "rnk", "vec_id")),

    // IVF: coarse-quantize every vector to its nearest centroid cell; each
    // query probes only its `nprobe` closest cells. Approximate → rows-only
    // (SimilaritySpec asserts the probed-cell scan is exact and reports
    // recall vs brute force).
    "q_similarity_ivf" -> Q(
      fn = (s, d) => ivfTopK(s, Tables(s, d, "embeddings"), k = 3,
          nlist = 16, nprobe = 4)
        .orderBy("q_id", "rnk", "vec_id")))

  /** IVF-style ANN: a deterministic coarse quantizer (here: the first
    * `nlist` vectors as the codebook; on a real corpus a KMeans-trained
    * codebook, still tiny and broadcast) assigns every vector to its
    * highest-cosine cell. A query probes its `nprobe` closest cells and
    * runs exact cosine top-k inside them — scanning ~nprobe/nlist of the
    * corpus. Centroid assignment is a broadcast nested-loop against the
    * codebook (no shuffle of the corpus); the probe join shuffles only by
    * cell id.
    */
  def ivfTopK(spark: SparkSession, embeddings: DataFrame, k: Int,
      nlist: Int, nprobe: Int): DataFrame = {
    VectorFunctions.register(spark)
    val e = embeddings
      .select(col("vec_id"), transform(col("embedding"), _.cast(DoubleType)).as("v"))
    val codebook = broadcast(e.filter(col("vec_id") < nlist)
      .select(col("vec_id").as("cent_id"), col("v").as("cv")))

    def nearestCells(points: DataFrame, idCol: String, vecCol: String, n: Int) =
      points.crossJoin(codebook)
        .withColumn("__ccos", VectorFunctions.cosineSim(col(vecCol), col("cv")))
        .withColumn("__crnk", rank().over(
          Window.partitionBy(col(idCol))
            .orderBy(col("__ccos").desc, col("cent_id").asc)))
        .filter(col("__crnk") <= n)
        .drop("cv", "__ccos", "__crnk")

    val assigned = nearestCells(e, "vec_id", "v", 1)
    val queries = nearestCells(
      e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("v").as("qv")),
      "q_id", "qv", nprobe)
      .select(col("cent_id"), col("q_id"), col("qv"))

    assigned.join(queries, Seq("cent_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", r4(VectorFunctions.cosineSim(col("qv"), col("v"))))
      .withColumn("rnk", rank().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("vec_id").asc)).cast(LongType))
      .filter(col("rnk") <= k)
      .select("q_id", "vec_id", "cos", "rnk")
  }

  /** 8-bit hyperplane signature (native expression — the HOF formulation
    * is interpreted per element) + within-bucket exact cosine top-k. */
  def annTopK(spark: SparkSession, embeddings: DataFrame, k: Int): DataFrame = {
    VectorFunctions.register(spark)
    val e = embeddings
      .select(col("vec_id"), transform(col("embedding"), _.cast(DoubleType)).as("v"))
      .withColumn("bucket", VectorFunctions.hyperplaneSig(col("v"), 8))
    val queries = e.filter(col("vec_id") < 10)
      .select(col("bucket"), col("vec_id").as("q_id"), col("v").as("qv"))
    e.join(queries, Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", r4(VectorFunctions.cosineSim(col("qv"), col("v"))))
      .withColumn("rnk", rank().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("vec_id").asc)).cast(LongType))
      .filter(col("rnk") <= k)
      .select("q_id", "vec_id", "cos", "rnk")
  }
}
