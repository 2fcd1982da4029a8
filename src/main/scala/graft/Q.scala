package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One registered query: the Spark implementation plus (when the semantics
  * are SQL-expressible deterministically) an equivalent DuckDB oracle SQL.
  *
  * Determinism contract (SURVEY.md §7.4): money in DECIMAL, doubles rounded
  * to 4dp, total-order final ORDER BY, explicit NULLS FIRST/LAST on nullable
  * sort keys, event timestamps truncated to millisecond, survivor rows
  * tie-broken by a unique key.
  */
final case class Q(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object Q {
  /** Shared column helpers enforcing the determinism rules. */
  val Dec12: DecimalType = DecimalType(12, 2)
  val Dec18: DecimalType = DecimalType(18, 4)

  /** Exact money value: cast to DECIMAL(12,2) before any arithmetic. */
  def dec2(c: Column): Column = c.cast(Dec12)

  /** Emit an exact decimal aggregate: normalize to scale 4 (keeps every
    * product of two scale-2 decimals exact — no rounding happens), then cast
    * to DOUBLE for the output. The math stays decimal (order-independent,
    * plan-shape-independent); only the EMITTED column is double, because the
    * correctness gate compares the two engines' values through pandas, where
    * a Spark DECIMAL survives as `Decimal('947.0000')` while the DuckDB
    * oracle arrives as float64 `947.0` — a guaranteed mismatch for any value
    * with trailing zeros. decimal→double is correctly rounded on both
    * engines (verified bit-exact for |scaled| ≤ 1e15), so equal decimals
    * always produce byte-identical doubles. */
  def dec4(c: Column): Column = c.cast(Dec18).cast(DoubleType)

  /** Emit a floating-point value: round to 4dp, as double, on both engines. */
  def r4(c: Column): Column = round(c, 4).cast(DoubleType)

  /** lineitem revenue, computed exactly in decimal on both engines. */
  def revenue: Column =
    dec2(col("l_extendedprice")) * (lit(1).cast(Dec12) - dec2(col("l_discount")))

  /** DuckDB-side spelling of [[revenue]] (kept adjacent so they stay in sync). */
  val revenueSql: String =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))"

  /** TOTAL order over lineitem rows. (l_orderkey, l_linenumber) is NOT
    * unique in the corpus (11k+ dup pairs at sf0.01); this 7-column chain is
    * verified unique at sf0.001/0.01/0.1. Every lineitem-granular ORDER BY
    * and every order-sensitive window (row_number/ntile/lag/lead/running
    * frames) must use a suffix of it or results are stable-sort luck.
    */
  val liKeyCols: Seq[String] = Seq(
    "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
    "l_quantity", "l_extendedprice", "l_shipdate")
  def liKey: Seq[Column] = liKeyCols.map(col)
  val liKeySql: String = liKeyCols.mkString(", ")
}
