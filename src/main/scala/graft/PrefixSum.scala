package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed, exact order-statistics over corpus-proportional relations —
  * the scale-safe replacement for the single-reducer `Window.orderBy(...)` /
  * `Window.partitionBy(fewKeys).orderBy(...)` idiom (the round-7 weak class:
  * a global rank or running sum funnels the whole relation through one — or
  * |fewKeys| — reducers).
  *
  * Shape (the classic two-phase parallel prefix sum, re-expressed in the
  * DataFrame API so Catalyst/AQE still own the physical plan):
  *
  *  1. ONE `approx_percentile` pass sketches `buckets` range-boundary values
  *     of the order key (Greenwald–Khanna: fixed per-partition state, only
  *     sketches cross the exchange) → a 1-row broadcast.
  *  2. Every row is assigned its range bucket MAP-SIDE against the broadcast
  *     boundary array (monotone in the order key; ties always share a
  *     bucket, so bucket-local order concatenates to the exact global
  *     order).
  *  3. The only corpus-sized exchange hash-partitions by
  *     (partitionCols, bucket) — `buckets`-way parallel — and a bucket-local
  *     window computes ranks / running sums.
  *  4. Per-bucket totals collapse to a tiny (|partitions| × buckets) relation
  *     whose running offsets are a bounded-domain window (allowlisted by the
  *     PlanSpec bounded-window invariant), broadcast back, and added to the
  *     bucket-local values — the exact global rank / prefix sum, no reducer
  *     ever seeing more than ~1/buckets of any partition's rows.
  *
  * Exactness: bucket boundaries only steer PLACEMENT — any monotone split
  * yields the same rank — so the sketch's error bound is a load-balance
  * concern, never a correctness one. Sums stay exact when the weight column
  * is integral or DECIMAL (offset + local is one addition per row).
  *
  * The input frame is consumed by phases 1/2/4 (sketch, counts, window) —
  * callers pass a materialized (checkpointed) relation when recomputing the
  * lineage is not free, mirroring the q_text_pmi house pattern.
  */
object PrefixSum {

  /** Exact integer division for non-negative longs (Column `/` is a double
    * divide): subtract the remainder first, so the quotient is an exact
    * multiple and the double division is error-free for |a| < 2^53.
    */
  def idiv(a: Column, b: Column): Column =
    ((a - (a % b)) / b).cast(LongType)

  private def bucketOf(v: Column, bounds: Column, buckets: Int, asc: Boolean): Column = {
    // Ties share a bucket by construction (the comparison is a pure function
    // of the value); NULL and NaN rows are pinned to the end Spark's sort
    // order puts them at (NULLS FIRST for asc, NaN greater than +Inf).
    val vd = v.cast(DoubleType)
    val cmp =
      if (buckets <= 1) lit(0L)
      else (1 until buckets).map { j =>
        val b = bounds.getItem(j - 1)
        when(if (asc) vd > b else vd < b, 1L).otherwise(0L)
      }.reduce(_ + _)
    val nullBkt = if (asc) lit(-1L) else lit(buckets.toLong)
    val nanBkt = if (asc) lit(buckets.toLong) else lit(-1L)
    when(v.isNull, nullBkt)
      .when(isnan(vd), nanBkt)
      .otherwise(cmp)
  }

  /** 1-row frame holding the boundary array for [[bucketOf]]. */
  private def boundaries(df: DataFrame, primary: Column, buckets: Int): DataFrame =
    if (buckets <= 1)
      // degenerate single bucket: no boundaries needed (the plain window)
      df.agg(count(lit(1)).as("__cnt"))
        .select(array().cast(ArrayType(DoubleType)).as("__bounds"))
    else {
      val pcts = lit((1 until buckets).map(_.toDouble / buckets).toArray)
      df.agg(percentile_approx(primary.cast(DoubleType), pcts, lit(1000)).as("__bounds"))
    }

  /** The shared kernel: any subset of { exact row_number, exact running
    * sums of several weights } over the SAME total order
    * `Window.partitionBy(partCols).orderBy(primary [asc|desc],
    * tieBreaks...)`, all from ONE bucket assignment, ONE
    * (partCols, bucket) hash exchange and ONE offsets broadcast — a
    * caller needing rank AND cumulative mass (ECDF/coverage tables) pays
    * the corpus pass once instead of per statistic.
    *
    * PRECONDITION — `partCols` must be LOW-CARDINALITY (schema- or
    * calendar-bounded: returnflag, event_type, day): the offsets relation
    * is |partCols groups| × buckets rows and is force-BROADCAST below, and
    * the PlanSpec fleet broadcast invariant green-lights any __bkt-grouped
    * aggregate on that structural evidence alone. A high-cardinality
    * partition key (user_id, doc_id) would make the broadcast
    * corpus-proportional — exactly the class the invariant polices — so
    * such callers need the plain `Window.partitionBy` idiom instead (many
    * keys already parallelize; PrefixSum exists for the FEW-key case).
    * NULL partition-column values are kept as their own partition (the
    * offsets join is null-safe), matching Window.partitionBy. Running
    * sums use the
    * ROWS UNBOUNDED PRECEDING..CURRENT ROW frame under the full tie-broken
    * order; callers wanting RANGE semantics pass a `primary` distinct per
    * partition (the grouped-relation idiom), where the frames coincide.
    */
  def withOrderStats(
      df: DataFrame,
      partCols: Seq[String],
      primary: Column,
      asc: Boolean,
      tieBreaks: Seq[Column],
      rankOut: Option[String],
      cumWeights: Seq[(Column, String)],
      buckets: Int = 32): DataFrame = {
    require(rankOut.nonEmpty || cumWeights.nonEmpty, "nothing to compute")
    val ordered = (if (asc) primary.asc else primary.desc) +: tieBreaks
    val wi = cumWeights.indices
    val b0 = df.crossJoin(broadcast(boundaries(df, primary, buckets)))
      .withColumn("__bkt", bucketOf(primary, col("__bounds"), buckets, asc))
      .drop("__bounds")
    // Weights materialize as columns BEFORE the two consumers, so the
    // per-bucket totals and the bucket-local window sum identical values.
    val b = cumWeights.zip(wi).foldLeft(b0) { case (d, ((w, _), i)) =>
      d.withColumn(s"__w$i", w)
    }
    val perBucketAggs =
      rankOut.map(_ => count(lit(1)).as("__n")).toSeq ++
        wi.map(i => sum(col(s"__w$i")).as(s"__bw$i"))
    val totals = b.groupBy((partCols :+ "__bkt").map(col): _*)
      .agg(perBucketAggs.head, perBucketAggs.tail: _*)
    // Offsets: a running total over the ≤(|partCols-groups| × buckets)-row
    // bucket-totals relation — the bounded-domain window the PlanSpec
    // invariant recognizes structurally (child agg groups by __bkt).
    val offWin = Window.partitionBy(partCols.map(col): _*).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offs0 = rankOut.foldLeft(totals) { (d, _) =>
      d.withColumn("__offn", sum(col("__n")).over(offWin) - col("__n"))
    }
    val offs = wi.foldLeft(offs0) { (d, i) =>
        d.withColumn(s"__off$i", sum(col(s"__bw$i")).over(offWin) - col(s"__bw$i"))
      }
      .drop(rankOut.map(_ => "__n").toSeq ++ wi.map(i => s"__bw$i"): _*)
    // Bucket-local statistics: row_number takes the function's required
    // default frame, the sums take the explicit ROWS frame — same
    // (partition, order) spec, so Catalyst plans ONE WindowExec for all.
    val locWin = Window.partitionBy((partCols :+ "__bkt").map(col): _*)
      .orderBy(ordered: _*)
    val locRows = locWin.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val loc0 = rankOut.foldLeft(b) { (d, _) =>
      d.withColumn("__rn", row_number().over(locWin))
    }
    val loc = wi.foldLeft(loc0) { (d, i) =>
      d.withColumn(s"__cl$i", sum(col(s"__w$i")).over(locRows))
    }
    // Null-SAFE on partCols: Window.partitionBy keeps NULL as a partition
    // value (and groupBy above groups it), so the offsets join must match
    // it too — a plain equi-join would silently drop NULL-keyed rows,
    // diverging from the window idiom this helper replaces.
    val offsR = offs
      .withColumnsRenamed(
        (partCols :+ "__bkt").map(c => c -> s"__o_$c").toMap)
    val joinCond = (partCols.map(c => col(c) <=> col(s"__o_$c")) :+
      (col("__bkt") === col("__o___bkt"))).reduce(_ && _)
    val joined = loc.join(broadcast(offsR), joinCond)
      .drop((partCols :+ "__bkt").map(c => s"__o_$c"): _*)
    val withRankCol = rankOut.foldLeft(joined) { (d, o) =>
      d.withColumn(o, col("__offn") + col("__rn"))
    }
    val withCums = cumWeights.zip(wi).foldLeft(withRankCol) {
      case (d, ((_, o), i)) => d.withColumn(o, col(s"__off$i") + col(s"__cl$i"))
    }
    withCums.drop(
      Seq("__bkt") ++ rankOut.map(_ => "__rn") ++ rankOut.map(_ => "__offn") ++
        wi.flatMap(i => Seq(s"__w$i", s"__cl$i", s"__off$i")): _*)
  }

  /** Adds column `out` = exact `row_number()` over
    * `Window.partitionBy(partCols).orderBy(primary [asc|desc], tieBreaks...)`
    * — same values, but distributed over `buckets` reducers per partition
    * instead of one. `tieBreaks` must complete a total order (the same
    * contract row_number itself has).
    */
  def withRank(
      df: DataFrame,
      partCols: Seq[String],
      primary: Column,
      asc: Boolean,
      tieBreaks: Seq[Column],
      out: String,
      buckets: Int = 32): DataFrame =
    withOrderStats(df, partCols, primary, asc, tieBreaks,
      rankOut = Some(out), cumWeights = Seq.empty, buckets = buckets)

  /** Adds column `out` = exact running `sum(weight)` over
    * `Window.partitionBy(partCols).orderBy(primary asc)` (ROWS UNBOUNDED
    * PRECEDING..CURRENT ROW), distributed the same way. Callers needing
    * RANGE-frame semantics must pass a `primary` that is distinct within
    * each partition (the grouped-relation idiom), where the two frames
    * coincide.
    */
  def withCumSum(
      df: DataFrame,
      partCols: Seq[String],
      primary: Column,
      weight: Column,
      out: String,
      buckets: Int = 32): DataFrame =
    withOrderStats(df, partCols, primary, asc = true, tieBreaks = Seq.empty,
      rankOut = None, cumWeights = Seq(weight -> out), buckets = buckets)

  /** `ntile(k)` derived in closed form from an exact 1-based rank and the
    * partition row count — the SQL-standard split (the first `n mod k` tiles
    * take `ceil(n/k)` rows): positional, tie-agnostic, identical to what
    * `ntile` itself assigns over the same total order.
    */
  def tileOf(rank: Column, n: Column, k: Int): Column = {
    val q = idiv(n, lit(k.toLong))
    val rem = n % lit(k.toLong)
    val cut = rem * (q + lit(1L))
    when(rank <= cut, idiv(rank - 1, q + lit(1L)) + lit(1L))
      .otherwise(rem + idiv(rank - cut - 1, q) + lit(1L))
      .cast(IntegerType)
  }
}
