package graft

import graft.operators.{AsOf, Flagship}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based invariants (SURVEY.md §5.3) over generated inputs:
  * top-N-per-group vs a brute-force reference, and as-of join vs a
  * brute-force scan. Plain ScalaCheck driven from ScalaTest. */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def check(prop: Prop, n: Int = 10): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  private val rowGen = Gen.listOfN(60, for {
    g <- Gen.oneOf("g1", "g2", "g3")
    e <- Gen.oneOf("a", "b", "c", "d", "e")
    m <- Gen.choose(0, 1000)
  } yield (g, e, m.toDouble))

  test("topNPerGroup matches brute force for random inputs") {
    import spark.implicits._
    check(Prop.forAll(rowGen, Gen.choose(1, 4)) { (rows, n) =>
      rows.isEmpty || {
        val df = rows.toDF("g", "e", "m")
        val got = Flagship.topNPerGroup(df, Seq("g"), Seq("e"), Q.dec2(col("m")), n)
          .collect().map(r => (r.getString(0), r.getString(1), r.getLong(3)))
          .toSet
        val expected = rows.groupBy(r => (r._1, r._2))
          .map { case ((g, e), rs) => (g, e, rs.map(_._3).sum) }
          .groupBy(_._1)
          .flatMap { case (_, entities) =>
            // total order (metric desc, entity asc) ⇒ rank == position + 1
            entities.toSeq.sortBy(t => (-t._3, t._2))
              .zipWithIndex
              .map { case ((g, e, _), i) => (g, e, (i + 1).toLong) }
              .filter(_._3 <= n)
          }.toSet
        got == expected
      }
    })
  }

  private val eventsGen = for {
    left <- Gen.listOfN(20, for {
      k <- Gen.choose(1, 4); t <- Gen.choose(0, 50)
    } yield (k.toLong, t.toLong))
    right <- Gen.listOfN(20, for {
      k <- Gen.choose(1, 4); t <- Gen.choose(0, 50); id <- Gen.choose(100, 999)
    } yield (k.toLong, t.toLong, id.toLong))
  } yield (left, right)

  test("as-of join matches brute force for random inputs") {
    import spark.implicits._
    check(Prop.forAll(eventsGen) { case (left, right) =>
      left.isEmpty || {
        val lids = left.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        val ldf = lids.toDF("k", "t", "lid")
        val rdf = right.toDF("k", "rt", "rid")
        val got = AsOf.joinBackward(ldf, rdf, "k", "t", "rt", "rid")
          .select("lid", "rid").collect()
          .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
          .toMap
        lids.forall { case (k, t, lid) =>
          val candidates = right.filter(r => r._1 == k && r._2 <= t)
          val expected =
            if (candidates.isEmpty) None
            else Some(candidates.maxBy(r => (r._2, r._3))._3)
          got(lid) == expected
        }
      }
    })
  }
}
