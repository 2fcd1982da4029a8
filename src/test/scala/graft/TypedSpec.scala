package graft

import graft.operators.{Flagship, Typed}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Typed surface: heap TopNAgg must equal the window formulation; typed
  * cogroup must equal the join-based reconciliation. */
class TypedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("TopNAgg equals the window top-N on the corpus") {
    import spark.implicits._
    val li = Tables(spark, TestSpark.sf, "lineitem")
      .select(col("l_returnflag"), col("l_partkey").cast("string"),
        col("l_quantity"))
      .toDF("_1", "_2", "_3")
      .as[(String, String, Double)]
    // aggregate metric per (group, entity) first so both formulations rank
    // the same relation
    val perEntity = li.groupBy($"_1", $"_2").agg(sum($"_3").as("m"))
      .select($"_1", $"_2", $"m").as[(String, String, Double)]

    val typed = Typed.topNTyped(perEntity, 3).collect()
      .map { case (g, tops) => g -> tops.map(s => (s.entity, s.metric)) }
      .toMap

    val window = Flagship.topNPerGroup(
        perEntity.toDF("g", "e", "m"), Seq("g"), Seq("e"), Q.dec2(col("m")), 3)
      .collect()
      .groupBy(_.getString(0))
      .map { case (g, rows) =>
        g -> rows.sortBy(_.getLong(3)).map(r =>
          (r.getString(1), r.getDouble(2))).toSeq
      }

    assert(typed.keySet == window.keySet)
    typed.foreach { case (g, tops) =>
      assert(tops.map(_._1) == window(g).map(_._1), s"group $g entity order")
      tops.zip(window(g)).foreach { case ((_, m1), (_, m2)) =>
        assert(math.abs(m1 - m2) < 1e-6)
      }
    }
  }

  test("typed cogroup reconciliation equals the join-based computation") {
    import spark.implicits._
    val orders = Tables(spark, TestSpark.sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice")).as[Typed.OrderRow]
    val lines = Tables(spark, TestSpark.sf, "lineitem")
      .select(col("l_orderkey"), col("l_quantity")).as[Typed.LineRow]
    val typed = Typed.reconcile(orders, lines).collect()
      .map(r => r.orderkey -> ((r.n_orders, r.n_lines, math.rint(r.qty_total)))).toMap

    val joined = lines.toDF().groupBy("l_orderkey")
      .agg(count(lit(1)).as("nl"), sum(col("l_quantity")).as("qty"))
      .join(orders.toDF(), col("l_orderkey") === col("o_orderkey"), "full")
      .collect()
      .map { r =>
        val key = if (r.isNullAt(0)) r.getLong(3) else r.getLong(0)
        val nl = if (r.isNullAt(1)) 0 else r.getLong(1).toInt
        val no = if (r.isNullAt(3)) 0 else 1
        val qty = if (r.isNullAt(2)) 0.0 else math.rint(r.getDouble(2))
        key -> ((no, nl, qty))
      }.toMap
    assert(typed == joined)
  }
}
