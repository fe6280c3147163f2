package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed MinHash signature aggregator — the `Aggregator[IN, BUF, OUT]`
  * extension surface (SURVEY.md §7.3 "Minhash/LSH/cosine extensions").
  *
  * Produces exactly the same k-element signature as the SQL formulation in
  * graft.operators.Text q35 (min over shingles of the first 60 bits of
  * md5("s<i>:" ++ shingle)), so either path can feed LSH banding. Buffers
  * are fixed-size long arrays → associative, commutative, and merge-cheap
  * across any partitioning (a 100 TB groupBy does partial aggregation
  * map-side for free).
  */
class MinHashAgg(k: Int) extends Aggregator[String, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], shingle: String): Array[Long] = {
    var i = 0
    while (i < k) {
      val h = MinHashAgg.md5Long60(s"s$i:$shingle")
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object MinHashAgg {
  /** First 60 bits of md5 as a non-negative long — identical to
    * graft.functions.Ops.md5Long / the DuckDB oracle expression. */
  def md5Long60(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    val hex = d.take(8).map(b => f"$b%02x").mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }
}
