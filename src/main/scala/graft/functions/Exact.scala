package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Order-independent, cross-engine-exact numeric aggregation.
  *
  * Summing IEEE doubles is order-dependent, and Spark's partial/final
  * aggregation order differs run-to-run and engine-to-engine — a hash
  * compare against a single-threaded oracle (DuckDB) would flake. The fix:
  * cast each element to a fixed-scale decimal *before* the sum. Decimal
  * addition is exact and associative, so any partitioning/merge order gives
  * the same answer, and `double → decimal(28,4)` rounds identically in
  * Spark and DuckDB for the value ranges in play. The final decimal fits in
  * a double exactly (≤ 15 significant digits at bench scale), so we cast
  * back to double for a stable output schema.
  *
  * This also matters at 100 TB: money-typed reductions over 10^11 rows in
  * floating point drift by far more than a cent; fixed-point partials are
  * the correct distributed design, not just an oracle trick.
  *
  * DuckDB oracle equivalents (keep in sync with any SQL in
  * [[graft.SparkEntry.oracleSql]]):
  *   dsum(x)  ==  CAST(SUM(CAST(x AS DECIMAL(28,4))) AS DOUBLE)
  *   davg(x)  ==  CAST(SUM(CAST(x AS DECIMAL(28,4))) AS DOUBLE) / COUNT(x)
  */
object Exact {
  val D: DecimalType = DecimalType(28, 4)

  /** Exact, order-independent sum of a double column. */
  def dsum(c: Column): Column = sum(c.cast(D)).cast(DoubleType)

  /** Deterministic average: exact decimal sum, then one double division. */
  def davg(c: Column): Column = sum(c.cast(D)).cast(DoubleType) / count(c)

  /** Exact sum of a *computed* double expression (e.g. price*(1-disc)).
    *
    * For computed doubles the decimal cast is NOT cross-engine stable:
    * Spark rounds the shortest decimal string of the double (HALF_UP via
    * java BigDecimal) while DuckDB rounds the binary value, and full-
    * precision products hit x.xxxx5 boundaries often enough to drift the
    * sum. Quantizing to integer cents with floor(x*100 + 0.5) uses only
    * IEEE ops (identical bit-for-bit in both engines), sums exactly in
    * int64, and divides back out once.
    */
  def qsum(c: Column): Column =
    (sum(floor(c * lit(100) + lit(0.5)).cast(org.apache.spark.sql.types.LongType))
      .cast(DoubleType) / 100.0)

  /** SQL fragment builders for the DuckDB oracle side. */
  def sqlQsum(expr: String): String =
    s"CAST(SUM(CAST(FLOOR(($expr)*100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0"
  def sqlSum(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(28,4))) AS DOUBLE)"
  def sqlAvg(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(28,4))) AS DOUBLE) / COUNT($expr)"
}
