package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Floating-point-deterministic aggregation helpers.
  *
  * A `sum(double)` is order-dependent, so a Spark result and a DuckDB
  * oracle (the driver's t2 gate) can differ in the last ulps depending
  * on partitioning. We instead cast each addend to DECIMAL(18,6)
  * (exact, order-independent sum) and cast the final sum back to
  * DOUBLE (a single deterministic IEEE rounding). A double is never
  * exactly half-way between two scale>=1 decimals (x.xxxxx5 has a
  * factor 5 in its denominator, unrepresentable in binary), so the
  * HALF_UP-vs-nearest rounding-mode difference between engines can
  * never be observed — both casts produce identical bits.
  *
  * The DuckDB oracle mirror is
  * `CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)`.
  *
  * At 100 TB this stays fully distributed: decimal sums have partial
  * (map-side) aggregation exactly like double sums, just with a 128-bit
  * buffer — no extra shuffle, no precision loss.
  */
object Num {
  val Dec: DecimalType = DecimalType(18, 6)

  /** Exact decimal value of a double column (scale 6). */
  def dec(c: Column): Column = c.cast(Dec)

  /** Order-independent SUM over a double column, returned as double. */
  def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)

  /** Order-independent AVG (decimal sum / count), returned as double. */
  def davg(c: Column): Column = sum(dec(c)).cast(DoubleType) / count(c)

  /** Deterministic sample stddev via decimal moments:
    * sqrt((sum(x^2) - sum(x)^2/n) / (n-1)). Mirrors the same formula
    * in the oracle SQL. (Spark's built-in stddev uses a per-partition
    * merge that is not reproducible bit-for-bit across engines.)
    */
  def dstddev(c: Column): Column = {
    val n  = count(c).cast(DoubleType)
    val s  = sum(dec(c)).cast(DoubleType)
    val s2 = sum(dec(c * c)).cast(DoubleType)
    sqrt((s2 - s * s / n) / (n - lit(1.0)))
  }

  /** SQL fragments for the DuckDB oracle side. */
  def sqlDsum(x: String): String =
    s"CAST(SUM(CAST(($x) AS DECIMAL(18,6))) AS DOUBLE)"
  def sqlDavg(x: String): String =
    s"CAST(SUM(CAST(($x) AS DECIMAL(18,6))) AS DOUBLE)/COUNT($x)"
  def sqlDstddev(x: String): String =
    s"sqrt((CAST(SUM(CAST((($x)*($x)) AS DECIMAL(18,6))) AS DOUBLE)" +
      s" - CAST(SUM(CAST(($x) AS DECIMAL(18,6))) AS DOUBLE)" +
      s" * CAST(SUM(CAST(($x) AS DECIMAL(18,6))) AS DOUBLE)" +
      s" / CAST(COUNT($x) AS DOUBLE)) / (CAST(COUNT($x) AS DOUBLE) - 1.0))"
}
