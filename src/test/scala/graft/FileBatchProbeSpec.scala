package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Pins the file-source mechanics q_stream_late_drop's oracle relies on:
  *   1. under AvailableNow + maxFilesPerTrigger=1, FileStreamSource forms
  *      one micro-batch per file, ordered by file MODIFICATION TIME
  *      ascending (fileSortOrder under latestFirst=false) — not by path;
  *   2. the event-time watermark ladder those batches see (how many
  *      batches of lag between data arriving and the watermark
  *      reflecting it).
  * The probe writes three single-row-group files with row counts 2/4/1
  * and mtimes deliberately REVERSED w.r.t. their names, then reads the
  * per-batch numInputRows + watermark from the query progress.
  */
class FileBatchProbeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("AvailableNow + maxFilesPerTrigger=1: one batch per file in mtime order; watermark ladder") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val root = Files.createTempDirectory("graft_probe_").toString
    val inDir = Paths.get(root, "in")
    Files.createDirectories(inDir)
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(h: Int) = new java.sql.Timestamp(base.getTime + h * 3600000L)
    import spark.implicits._
    // (name, mtime rank, rows): mtime order B(2 rows) < C(4 rows) < A(1 row)
    val files = Seq(
      ("a", 2L, Seq(graft.streaming.Streams.Event(1, ts(1), 1, "x", 1.0))),
      ("b", 0L, Seq(graft.streaming.Streams.Event(2, ts(2), 1, "x", 1.0),
        graft.streaming.Streams.Event(3, ts(30), 1, "x", 1.0))),
      ("c", 1L, Seq(
        graft.streaming.Streams.Event(4, ts(3), 1, "x", 1.0),
        graft.streaming.Streams.Event(5, ts(4), 1, "x", 1.0),
        graft.streaming.Streams.Event(6, ts(5), 1, "x", 1.0),
        graft.streaming.Streams.Event(7, ts(40), 1, "x", 1.0))))
    for ((name, rank, rows) <- files) {
      val stage = Paths.get(root, s"stage_$name")
      rows.toDF().coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val listing = Files.list(stage)
      val part =
        try listing.iterator().asScala
          .find(_.getFileName.toString.endsWith(".parquet")).get
        finally listing.close()
      val dest = inDir.resolve(s"$name.parquet")
      Files.move(part, dest)
      Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(1704067200000L + rank * 60000L))
    }
    val agg = graft.streaming.Streams.tumblingWithWatermark(
      spark.readStream.schema(Scratch.inputSchema)
        .option("maxFilesPerTrigger", "1")
        .parquet(inDir.toString), "10 minutes")
    val q = agg.writeStream.format("memory").queryName("probe")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val prog = q.recentProgress.toSeq
      .filter(_.numInputRows > 0)
    val rowsPerBatch = prog.map(_.numInputRows)
    // one batch per file, in MTIME order (b=2 rows, c=4, a=1), not path order
    assert(rowsPerBatch == Seq(2L, 4L, 1L),
      s"expected batches of 2/4/1 rows in mtime order, got $rowsPerBatch " +
        s"(all progress: ${q.recentProgress.toSeq.map(_.numInputRows)})")
    // EVICTION watermark each data batch ran with (the 'watermark' entry):
    // lag ONE batch — batch b uses max(ts over batches ≤ b−1) − 10 min.
    val wms = prog.map(_.eventTime.get("watermark"))
    assert(wms == Seq("1970-01-01T00:00:00.000Z",
      "2024-01-02T05:50:00.000Z", "2024-01-02T15:50:00.000Z"),
      s"eviction watermark ladder changed: $wms")
    // LATE-ROW filtering lags one MORE batch (watermarkForLateEvents = the
    // previous batch's watermark): batch 1's hour-3/4/5 rows sit far below
    // its 05:50 eviction watermark, yet are KEPT (filtered against batch
    // 0's epoch watermark) and emitted by the final no-data batch.
    val emitted = spark.table("probe").collect()
      .map(r => (r.getAs[java.sql.Timestamp]("w_start"), r.getAs[Long]("n")))
      .toMap
    for (h <- Seq(3, 4, 5))
      assert(emitted.get(ts(h)).contains(1L),
        s"hour-$h window missing/wrong: late filter no longer lags eviction by one batch ($emitted)")
    q.stop()
    // cleanup
    Files.walk(Paths.get(root)).iterator().asScala.toSeq.reverse
      .foreach(p => scala.util.Try(Files.deleteIfExists(p)))
  }

  test("q_stream_late_drop: drops are non-vacuous and bounded by the no-drop aggregate") {
    import java.time.ZoneOffset
    def ms(t: java.time.LocalDateTime): Long =
      t.toInstant(ZoneOffset.UTC).toEpochMilli
    val got = SparkEntry.queries("q_stream_late_drop")(spark, TestSpark.sf)
      .collect()
      .map(r => (ms(r.getAs[java.time.LocalDateTime]("w_start")),
        r.getAs[String]("event_type")) -> r.getAs[Long]("n")).toMap
    // the no-drop batch twin over the same corpus, restricted to closed
    // windows (end <= max ts − 10 min)
    val ev = Tables(spark, TestSpark.sf, "events")
      .select(org.apache.spark.sql.functions.col("ts"),
        org.apache.spark.sql.functions.col("event_type"))
      .collect()
      .map(r => (ms(r.getAs[java.time.LocalDateTime](0)), r.getString(1)))
    val wmFinal = ev.map(_._1).max - 600000L
    val full = ev.groupBy { case (t, typ) => (t - Math.floorMod(t, 3600000L), typ) }
      .view.mapValues(_.length.toLong).toMap
      .filter { case ((w, _), _) => w + 3600000L <= wmFinal }
    // every emitted window is a closed window, count ≤ the full count,
    // and at least one window genuinely lost late rows
    assert(got.nonEmpty)
    got.foreach { case (k, n) =>
      assert(full.contains(k), s"emitted non-closed window $k")
      assert(n <= full(k), s"window $k: streamed $n > batch ${full(k)}")
    }
    assert(got.exists { case (k, n) => n < full(k) },
      "late-row drop vacuous: every window kept every row")
  }

  test("chained join→agg: downstream watermark is DELAYED by the join interval (SPARK-42599 propagation)") {
    // The q_stream_chained oracle's load-bearing discovery: a windowed agg
    // DOWNSTREAM of a time-interval stream-stream join does not see the
    // raw eviction watermark — the propagation simulator delays it by the
    // join interval (a signup can be held in join state until signup_ts +
    // interval passes, so join output lags the input watermark by up to
    // the interval). Pin: a window whose end is ≤ wm_evict but >
    // wm_evict − interval must NOT emit (the naive ladder would emit it),
    // and must emit once the DELAYED watermark passes it.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Streams.Event
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def tm(min: Long) = new java.sql.Timestamp(base + min * 60000L)
    val sg = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event]
    val pu = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event]
    val joined = graft.streaming.Streams.signupToPurchase(
      sg.toDF(), pu.toDF(), within = "60 minutes", joinType = "inner")
    val agg = joined
      .groupBy(window(col("signup_ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("n"))
    val q = agg.writeStream.format("memory").queryName("chainprobe")
      .outputMode("append").start()
    def emitted(): Map[java.sql.Timestamp, Long] =
      spark.table("chainprobe").collect()
        .map(r => r.getAs[java.sql.Timestamp]("w_start") -> r.getAs[Long]("n")).toMap
    try {
      // processAllAvailable DRAINS no-data batches, so each read below
      // observes the FULLY-ADVANCED watermark of everything fed so far —
      // the discriminator is therefore placed relative to the final
      // drained watermark of each step, not an intermediate batch.
      // b0: pair in window [0,60) (end 60) and pair in window
      // [1920,1980) (end 1980)
      sg.addData(Event(1, tm(0), 1, "signup", 0.0), Event(2, tm(1935), 2, "signup", 0.0))
      pu.addData(Event(3, tm(30), 1, "purchase", 0.0), Event(4, tm(1936), 2, "purchase", 0.0))
      q.processAllAvailable()   // drained wm: min(1935,1936)-10 = 1925
      // b1: advance to wm 1990; delayed agg watermark = 1990−60 = 1930.
      // Window end 60 ≤ 1930 → emits. Window end 1980: the NAIVE rule
      // (end ≤ 1990) would emit it; the interval-delayed rule (end ≤
      // 1930) must hold it open.
      sg.addData(Event(5, tm(2000), 3, "signup", 0.0))
      pu.addData(Event(6, tm(2000), 3, "purchase", 0.0))
      q.processAllAvailable()
      assert(emitted().get(tm(0)).contains(1L),
        s"window [0,60) should close under the delayed watermark 1930: ${emitted()}")
      assert(!emitted().contains(tm(1920)),
        s"window [1920,1980) emitted at eviction wm 1990 — the agg is NOT seeing the interval-delayed watermark: ${emitted()}")
      // b2: advance to wm 2090; delayed = 2030 ≥ 1980 → now it closes
      sg.addData(Event(7, tm(2100), 4, "signup", 0.0))
      pu.addData(Event(8, tm(2100), 4, "purchase", 0.0))
      q.processAllAvailable()
      assert(emitted().get(tm(1920)).contains(1L),
        s"window [1920,1980) must emit once the delayed watermark passes 1980: ${emitted()}")
      // the agg never counts chained inputs as late-dropped (they are
      // filtered against the DELAYED late watermark; observed 0 across
      // the sf0.001 engine probe too)
      val aggDrops = q.recentProgress.toSeq.flatMap(_.stateOperators.toSeq)
        .filter(_.operatorName == "stateStoreSave").map(_.numRowsDroppedByWatermark)
      assert(aggDrops.forall(_ == 0L), s"agg late drops: $aggDrops")
    } finally q.stop()
  }

  test("chained OUTER join→agg: null-row emission timing (evict-then-aggregate, never late)") {
    // q_stream_chained_outer's load-bearing timing claims:
    //   1. a never-matched left row null-extends when join eviction passes
    //      its bound (signup_ts + interval) STRICTLY — and the null row
    //      flows into the downstream agg's STATE in that same drain, but
    //      its window does NOT emit until the DELAYED (interval-lagged)
    //      watermark passes the window end;
    //   2. the null row is never counted late at the agg (it can't be:
    //      emission at eviction means it survived the previous eviction,
    //      which lower-bounds its window end above the delayed late
    //      watermark — the oracle's no-arrival-drop-clause argument).
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Streams.Event
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def tm(min: Long) = new java.sql.Timestamp(base + min * 60000L)
    val sg = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event]
    val pu = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event]
    val joined = graft.streaming.Streams.signupToPurchase(
      sg.toDF(), pu.toDF(), within = "60 minutes", joinType = "left_outer")
    val agg = joined
      .groupBy(window(col("signup_ts"), "1 hour"))
      .agg(count(lit(1)).as("n_rows"), count(col("purchase_id")).as("n_conv"))
      .select(col("window.start").as("w_start"), col("n_rows"), col("n_conv"))
    val q = agg.writeStream.format("memory").queryName("outerchainprobe")
      .outputMode("append").start()
    def emitted(): Map[java.sql.Timestamp, (Long, Long)] =
      spark.table("outerchainprobe").collect()
        .map(r => r.getAs[java.sql.Timestamp]("w_start") ->
          ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_conv")))).toMap
    try {
      // b0: signup A at t=0 (user 1) — never matched; its join bound is
      // 0 + 60 = 60. Both sides get a floor row so the watermark is set.
      sg.addData(Event(1, tm(0), 1, "signup", 0.0))
      pu.addData(Event(2, tm(0), 42, "purchase", 0.0))
      q.processAllAvailable()   // wm = -10: A safely in state
      assert(emitted().isEmpty, s"premature emission: ${emitted()}")
      // b1: advance wm to min(80,80)−10 = 70 — STRICTLY past A's bound 60,
      // so the drain null-extends A into the agg. The agg's delayed
      // watermark is 70−60 = 10 < 60 → window [0,60) must be IN STATE but
      // NOT emitted (the naive rule — eviction wm 70 ≥ end 60 — would
      // have emitted it).
      sg.addData(Event(3, tm(80), 2, "signup", 0.0))
      pu.addData(Event(4, tm(80), 2, "purchase", 0.0))
      q.processAllAvailable()
      assert(!emitted().contains(tm(0)),
        s"null row's window emitted before the DELAYED watermark passed: ${emitted()}")
      // b2: advance wm to 130; delayed = 70 ≥ 60 → [0,60) emits now, with
      // the null row counted (n_rows 1) and zero matches (n_conv 0) —
      // proving it reached agg state at eviction time and was never
      // dropped late. The b1 match pair's window [60,120) (end 120 > 70)
      // must still be open.
      sg.addData(Event(5, tm(140), 3, "signup", 0.0))
      pu.addData(Event(6, tm(140), 3, "purchase", 0.0))
      q.processAllAvailable()
      assert(emitted().get(tm(0)).contains((1L, 0L)),
        s"null-extended row missing from its window: ${emitted()}")
      assert(!emitted().contains(tm(60)),
        s"match window emitted before the delayed watermark passed: ${emitted()}")
      val aggDrops = q.recentProgress.toSeq.flatMap(_.stateOperators.toSeq)
        .filter(_.operatorName == "stateStoreSave").map(_.numRowsDroppedByWatermark)
      assert(aggDrops.forall(_ == 0L), s"agg late drops: $aggDrops")
    } finally q.stop()
  }

  test("q_stream_update: last emission per closed window equals the append-mode output") {
    import java.time.ZoneOffset
    def ms(t: java.time.LocalDateTime): Long =
      t.toInstant(ZoneOffset.UTC).toEpochMilli
    val updates = SparkEntry.queries("q_stream_update")(spark, TestSpark.sf)
      .collect()
      .map(r => (r.getAs[Long]("batch_id"),
        ms(r.getAs[java.time.LocalDateTime]("w_start")),
        r.getAs[String]("event_type"), r.getAs[Long]("n"),
        r.getAs[Double]("total")))
    assert(updates.nonEmpty)
    // multi-batch emission must be non-vacuous: some group updates twice
    val perGroup = updates.groupBy(u => (u._2, u._3))
    assert(perGroup.values.exists(_.length > 1),
      "no group was ever re-emitted — update mode degenerated to append")
    // the LAST update per group carries the final running aggregate; for
    // every window the append-mode key emitted (closed windows), the two
    // output modes must agree exactly
    val last = perGroup.view.mapValues(_.maxBy(_._1)).toMap
    val appended = SparkEntry.queries("q_stream_late_drop")(spark, TestSpark.sf)
      .collect()
      .map(r => (ms(r.getAs[java.time.LocalDateTime]("w_start")),
        r.getAs[String]("event_type")) -> ((r.getAs[Long]("n"),
        r.getAs[Double]("total")))).toMap
    assert(appended.nonEmpty)
    appended.foreach { case (k, (n, total)) =>
      val u = last.getOrElse(k, fail(s"closed window $k never updated"))
      assert(u._4 == n && u._5 == total, s"window $k: update $u vs append ($n, $total)")
    }
  }
}
