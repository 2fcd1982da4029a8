package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** Bounded top-k selection as a REAL aggregate (SURVEY.md §2.5 similarity
  * family; the r10 scale rework of the pair-relation tails).
  *
  * The k-NN construction queries all end in the same shape: a large pair
  * relation (N·candidates rows) reduced to each key's top-k neighbors.
  * Spelled as `rank() OVER (PARTITION BY key ORDER BY score, id)` that tail
  * costs one full exchange OF THE PAIR RELATION plus a per-partition sort —
  * WindowGroupLimit prunes to k rows per key per partition, but only AFTER
  * sorting each map partition, and the exchange still moves k rows per
  * (key, map partition). At sf100 the ANN graph's pair relation is ~10⁹
  * rows and this tail measured as the dominant term (BENCH_NOTES r10).
  *
  * As a [[TypedImperativeAggregate]] the same semantics cost ZERO sorts and
  * a shuffle of partial STATES (≤k pairs per key per map partition, merged
  * map-side by ObjectHashAggregate): `groupBy(key).agg(topk_pairs(...))`.
  * This is the "custom Catalyst expression beats window" preference order
  * from the build brief applied to the aggregate position.
  *
  * Semantics (bit-matched to the rank-window spelling it replaces):
  *   - ordering: (score DESC, id ASC), or (score ASC, id ASC) with asc=true
  *     — a TOTAL order per key once ids are distinct, so rank == row_number
  *     and the result is exactly min(k, #distinct ids) pairs.
  *   - duplicate ids DEDUP, keeping the better-ordered score — the
  *     `groupBy(key, id).agg(max(score))` pre-dedup the window spelling
  *     needed (multi-table LSH emits the same pair once per colliding
  *     table) folds into the same aggregate for free.
  *   - doubles compare as primitives (-0.0 == 0.0), matching DuckDB's
  *     comparison semantics; NaN never reaches the buffer from the cosine
  *     kernels (zero vectors yield 0.0 by contract).
  *
  * Returns array<struct<id long, score double>> sorted best-first; callers
  * posexplode and emit rnk = pos + 1.
  *
  * Merge-safety of dedup-keep-best under bounded buffers: an id belongs to
  * the global top-k only if its best score ranks top-k within every subset
  * containing it (k better DISTINCT ids locally would also beat it
  * globally), so per-partition top-k buffers losslessly compose — the
  * standard top-k union argument, extended by per-id dedup since a
  * duplicate's worse copy can never evict its better copy.
  */
final class TopKPairsBuffer(k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size: Int = 0
}

case class TopKPairs(
    score: Expression,
    id: Expression,
    k: Int,
    asc: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKPairsBuffer] {

  require(k > 0, "topk_pairs: k must be positive")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_pairs"

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKPairsBuffer = new TopKPairsBuffer(k)

  /** Strictly-better under (score asc/desc, id asc). */
  @inline private def better(sa: Double, ia: Long, sb: Double, ib: Long): Boolean =
    if (sa != sb) { if (asc) sa < sb else sa > sb } else ia < ib

  private def insert(buf: TopKPairsBuffer, s: Double, i: Long): Unit = {
    // Dedup: an existing entry for the id keeps the better score.
    var j = 0
    while (j < buf.size) {
      if (buf.ids(j) == i) {
        if (better(s, i, buf.scores(j), i)) {
          // Remove the worse copy; fall through to sorted re-insert.
          var m = j
          while (m < buf.size - 1) {
            buf.scores(m) = buf.scores(m + 1); buf.ids(m) = buf.ids(m + 1)
            m += 1
          }
          buf.size -= 1
          j = buf.size // exit scan; insert below
        } else return
      } else j += 1
    }
    var pos = 0
    while (pos < buf.size && !better(s, i, buf.scores(pos), buf.ids(pos))) pos += 1
    if (pos >= k) return
    val last = math.min(buf.size, k - 1)
    var m = last
    while (m > pos) {
      buf.scores(m) = buf.scores(m - 1); buf.ids(m) = buf.ids(m - 1)
      m -= 1
    }
    buf.scores(pos) = s
    buf.ids(pos) = i
    if (buf.size < k) buf.size += 1
  }

  override def update(buf: TopKPairsBuffer, input: InternalRow): TopKPairsBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      insert(buf, s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKPairsBuffer, other: TopKPairsBuffer): TopKPairsBuffer = {
    var j = 0
    while (j < other.size) {
      insert(buf, other.scores(j), other.ids(j))
      j += 1
    }
    buf
  }

  override def eval(buf: TopKPairsBuffer): Any = {
    val out = new Array[Any](buf.size)
    var j = 0
    while (j < buf.size) {
      out(j) = InternalRow(buf.ids(j), buf.scores(j))
      j += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKPairsBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    var j = 0
    while (j < buf.size) {
      bb.putLong(buf.ids(j)); bb.putDouble(buf.scores(j))
      j += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKPairsBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKPairsBuffer(k)
    buf.size = n
    var j = 0
    while (j < n) {
      buf.ids(j) = bb.getLong; buf.scores(j) = bb.getDouble
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKAgg {
  /** `topk_pairs(score, id, k, asc)` as a Column aggregate. Best-first
    * array<struct<id, score>>; `asc = true` for distances (smaller is
    * better), default false for similarities.
    */
  def topkPairs(score: Column, id: Column, k: Int, asc: Boolean = false): Column =
    call_function("topk_pairs", score, id, lit(k), lit(asc))

  private[graft] def build(exprs: Seq[Expression]): Expression =
    TopKPairs(exprs(0), exprs(1),
      exprs(2).eval(InternalRow.empty).asInstanceOf[Int],
      exprs(3).eval(InternalRow.empty).asInstanceOf[Boolean])
      .toAggregateExpression()
}
