package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers over the driver corpus (TESTDATA.md): one parquet file per table
  * under the scale-factor directory. Parquet footers carry the schema, so
  * reads are deterministic without a declared StructType; Catalyst pushes
  * projections and predicates into the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** `events.ts` has shipped in two physical types across driver corpus
    * generations: parquet TIMESTAMP(NANOS) — which Spark's reader rejects
    * outright (PARQUET_TYPE_ILLEGAL) unless
    * `spark.sql.legacy.parquet.nanosAsLong=true` turns it into LongType
    * nanos — and plain TIMESTAMP(MICROS). Both normalize here to a
    * millisecond-truncated TIMESTAMP_NTZ, the contract every events oracle
    * assumes (SURVEY §7.4 rule 4 — oracle SQL compares
    * `date_trunc('milliseconds', ts)`), so the engine/oracle comparison is
    * independent of which corpus generation is on disk.
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          // ns → ms via integer `div` (a double division would lose µs
          // precision at ns-epoch magnitudes). NTZ matches how the other
          // corpus timestamps load (inferTimestampNTZ), so outputs
          // round-trip parquet without the isAdjustedToUTC flag.
          df.withColumn("ts",
            org.apache.spark.sql.functions.expr(
              "CAST(timestamp_millis(ts div 1000000) AS TIMESTAMP_NTZ)"))
        case _ =>
          // µs-native read (TIMESTAMP_NTZ): same ms truncation, in place.
          df.withColumn("ts",
            org.apache.spark.sql.functions.expr(
              "CAST(date_trunc('MILLISECOND', ts) AS TIMESTAMP_NTZ)"))
      }
    else df
  }

  /** Register every corpus table as a temp view (for spark.sql queries —
    * correlated subqueries, GROUPING SETS — which mirror the oracle SQL).
    *
    * Memoized per (session, dir): each registration re-reads 10 parquet
    * footers and re-resolves 10 view plans, which showed up as ~0.5s of
    * pure overhead on every spark.sql query in the round-3 bench. The memo
    * invalidates when the same session switches corpus dirs (tests do),
    * keyed on the session so a stopped session's entry can't leak onto a
    * new one with the same dir.
    */
  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())
  def registerViews(spark: SparkSession, dir: String): Unit =
    if (registered.get(spark) != dir) {
      names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
      registered.put(spark, dir)
    }

  /** localCheckpoint with run-scoped block reclamation.
    *
    * A checkpointed frame's blocks live until the ContextCleaner GC-detects
    * the RDD — inside a bench loop that runs the same query repeatedly, the
    * superseded generations pile up and bleed memory pressure into later
    * runs (the round-5 q_graph_triangles signature: runs degrading
    * 1.0→4.6 s). This keeps ONE live checkpoint per key: invoking it again
    * under the same key eagerly unpersists the previous run's blocks first
    * (safe — the previous run's result has been consumed by then; its
    * lineage is truncated, so it must not be re-read either way).
    *
    * Dataset.unpersist would be a NO-OP here: it only clears CacheManager
    * (InMemoryRelation) entries, while localCheckpoint persists the
    * internal RDD directly (ADVICE r6). So the persisted RDD ids are
    * captured by diffing sparkContext.getPersistentRDDs around the
    * checkpoint call and those RDDs are unpersisted directly. The id set
    * is only meaningful within its own SparkContext (ids restart at 0 per
    * context — test suites churn sessions), hence the `eq` guard; blocks
    * of a stopped context died with it.
    */
  /** localCheckpoint plus a release handle that ACTUALLY frees the
    * checkpoint's blocks (the building block for the iterative operators'
    * per-generation reclamation — connected components, TextRank). Calling
    * the handle after the frame's last consumer is safe; calling it and
    * then re-reading the frame is not (the lineage is truncated).
    */
  def checkpointEager(df: DataFrame): (DataFrame, () => Unit) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val chk = df.localCheckpoint()
    val ids = sc.getPersistentRDDs.keySet.diff(before).toSet
    val release = () => {
      scala.util.Try {
        val live = sc.getPersistentRDDs
        ids.foreach(id => live.get(id).foreach(_.unpersist(false)))
      }
      ()
    }
    (chk, release)
  }

  private final case class Chk(
      sc: org.apache.spark.SparkContext, release: () => Unit)
  private val checkpoints =
    java.util.Collections.synchronizedMap(
      new java.util.HashMap[String, Chk]())
  def runScopedCheckpoint(key: String, df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val prev = checkpoints.get(key)
    // Only release within the owning context (RDD ids restart per context;
    // a stopped context's blocks died with it — checkpointEager's Try
    // absorbs that case anyway, but don't touch a DIFFERENT live context).
    if (prev != null && (prev.sc eq sc)) prev.release()
    val (chk, release) = checkpointEager(df)
    checkpoints.put(key, Chk(sc, release))
    chk
  }
}
