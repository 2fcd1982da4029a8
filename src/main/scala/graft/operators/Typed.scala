package graft.operators

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Dataset surface (SURVEY.md §1 data model / §7.2): case-class
  * rows, a custom `Aggregator`, and `cogroup` — the compile-time-checked
  * face of the same engine.
  *
  * [[TopNAgg]] is the single-pass alternative to the window formulation of
  * top-N-per-group: a bounded buffer (size n) per group, combined
  * associatively — O(rows · log n) with NO per-group sort of the full data
  * and map-side partial aggregation, which matters when groups are huge and
  * n is small. Equivalence with the window formulation is asserted in
  * TypedSpec.
  */
object Typed {

  final case class Scored(entity: String, metric: Double)

  /** Keep the top n (metric desc, entity asc — total order, deterministic
    * under metric ties) entries per group. Buffer is a sorted list capped
    * at n; merge is a bounded merge. */
  final class TopNAgg(n: Int) extends Aggregator[Scored, List[Scored], List[Scored]] {
    private def ord: Ordering[Scored] =
      Ordering.by((s: Scored) => (-s.metric, s.entity))

    override def zero: List[Scored] = Nil

    override def reduce(buf: List[Scored], a: Scored): List[Scored] =
      merge(buf, List(a))

    override def merge(b1: List[Scored], b2: List[Scored]): List[Scored] =
      (b1 ++ b2).sorted(ord).take(n)

    override def finish(reduction: List[Scored]): List[Scored] = reduction

    override def bufferEncoder: Encoder[List[Scored]] = Encoders.kryo[List[Scored]]
    override def outputEncoder: Encoder[List[Scored]] = Encoders.kryo[List[Scored]]
  }

  /** Typed top-N per group over (group, entity, metric) rows. */
  def topNTyped(ds: Dataset[(String, String, Double)], n: Int)
      : Dataset[(String, List[Scored])] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .mapValues(r => Scored(r._2, r._3))
      .agg(new TopNAgg(n).toColumn.name("top"))
  }

  final case class OrderRow(o_orderkey: Long, o_totalprice: Double)
  final case class LineRow(l_orderkey: Long, l_quantity: Double)
  final case class Reconciled(orderkey: Long, n_orders: Int, n_lines: Int,
      qty_total: Double)

  /** Typed cogroup: reconcile orders against their lineitems in one pass —
    * both sides grouped by the key, the function sees both iterators (no
    * join row explosion; one shuffle per side on the key). */
  def reconcile(orders: Dataset[OrderRow], lines: Dataset[LineRow])
      : Dataset[Reconciled] = {
    import orders.sparkSession.implicits._
    orders.groupByKey(_.o_orderkey)
      .cogroup(lines.groupByKey(_.l_orderkey)) { (key, os, ls) =>
        var no = 0; var nl = 0; var qty = 0.0
        os.foreach(_ => no += 1)
        ls.foreach { l => nl += 1; qty += l.l_quantity }
        Iterator(Reconciled(key, no, nl, qty))
      }
  }
}
