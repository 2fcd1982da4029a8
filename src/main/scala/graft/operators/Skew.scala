package graft.operators

import graft.{Q, Tables}
import graft.Q._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for the 100 TB path (SURVEY.md §4 notes).
  * AQE's runtime skew-join splitting handles sort-merge joins; these cover
  * the two cases it doesn't: skewed aggregation keys, and broadcast-free
  * joins where one side's hot keys must be spread BEFORE the shuffle.
  *
  * Both are semantics-preserving rewrites (asserted equal to the direct
  * formulation in SkewSpec).
  */
object Skew {

  /** The salted rewrite is oracle-checked against the DIRECT aggregation:
    * decimal partials make the two-phase merge bit-identical to a single
    * GROUP BY, so the skew mitigation is provably semantics-free.
    * l_returnflag (3 hot keys over 600k rows at sf0.1) is exactly the
    * shape where a single-phase agg would bottleneck on 3 reduce tasks.
    */
  val qs: Map[String, Q] = Map(
    "q_skew_salted" -> Q(
      fn = (s, d) =>
        saltedSum(Tables(s, d, "lineitem"), "l_returnflag",
            dec2(col("l_quantity")), 16)
          .select(col("l_returnflag"), dec4(col("total")).as("total"))
          .orderBy("l_returnflag"),
      oracle = Some("""
        SELECT l_returnflag,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")))

  /** Two-phase salted aggregation: spread each group key over `saltBuckets`
    * partial groups (breaking a hot key across tasks), then merge partials.
    * `aggs` must be decomposable aggregates given as (partial, merge)
    * column builders — e.g. sum/sum, count/sum, min/min, max/max.
    */
  def saltedSum(df: DataFrame, key: String, value: Column, saltBuckets: Int): DataFrame = {
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(value).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("total"))
  }

  /** Salted join of a skewed fact against a dimension too large to
    * broadcast whole: the fact side gets a random salt in [0, n), the dim
    * side is replicated n times, and the join key becomes (key, salt) —
    * spreading each hot key over n shuffle partitions.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltBuckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)).cast("int"))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedFact.join(replicatedDim, Seq(key, "__salt")).drop("__salt")
  }
}
