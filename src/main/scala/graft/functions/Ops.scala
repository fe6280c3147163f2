package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column helpers shared by the query surface.
  *
  * Oracle-determinism note: double summation is order-dependent, and a
  * distributed engine must not promise any particular order. To make
  * aggregate results bit-exact against any other engine (the DuckDB oracle,
  * or a 1000-executor cluster vs local[32]), double sums are routed through
  * a wide decimal: cast each addend to DECIMAL(30,10), sum exactly
  * (order-independent integer arithmetic), and cast the final total back to
  * double. This mirrors how the reference keeps aggregation exact by using
  * "uniform value" longs (indexr-segment/.../Row.java:49-62).
  */
object Ops {
  // Scale 6: money columns carry ≤2 decimal digits, so 3-factor products
  // (price × discount × tax) carry ≤6 — the cast is EXACT (no rounding, no
  // HALF_UP-vs-HALF_EVEN tie divergence across engines), and the summed
  // unscaled value stays below 2^53 at bench scale so the final
  // decimal→double conversion is a single correctly-rounded IEEE division
  // in every engine.
  private val D = DecimalType(30, 6)

  /** Order-independent double sum (exact decimal internally). */
  def dsum(c: Column): Column = sum(c.cast(D)).cast(DoubleType)

  /** Order-independent double average: exact sum / count. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** SQL fragment equivalents for the DuckDB oracle. */
  def dsumSql(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(30,6))) AS DOUBLE)"
  def davgSql(expr: String): String =
    s"(${dsumSql(expr)} / COUNT($expr))"

  /** First 60 bits of md5 as a non-negative long — a deterministic hash
    * that any engine can reproduce (DuckDB: ('0x'||substr(md5(x),1,15))::BIGINT).
    * Used as the permutation-free base hash for MinHash signatures. */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)
  def md5LongSql(expr: String): String =
    s"(('0x' || substr(md5($expr), 1, 15))::BIGINT)"
}
