package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Table registry: maps the engine's catalog onto parquet directories.
  *
  * Reference parity: IndexR keeps a table catalog on ZooKeeper
  * (indexr-server/src/main/java/io/indexr/server/ZkTableManager.java) where a
  * table = schema JSON + a directory of segment files. Here a table = a parquet
  * file/directory under a scale-factor dir; Spark's catalog (temp views) plays
  * the role of the ZK registry, and Parquet files play the role of segments
  * (indexr-segment/src/main/java/io/indexr/segment/Segment.java:6-15).
  *
  * At 100 TB each table would be a directory of many parquet files
  * (optionally date-partitioned); everything below reads a path, so the layout
  * scales without code changes.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Path of a table inside a scale-factor directory. */
  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  /** Memoized parquet SCHEMA per (session, path) — the catalog's schema
    * registry, reference parity with IndexR's schema JSON on ZooKeeper
    * (ZkTableManager). A bare `spark.read.parquet` re-infers the schema
    * (footer read + resolution) on EVERY call, and the engine builds
    * table frames hundreds of times per bench pass; passing the known
    * schema skips that repeated driver-side work. Keyed on the session
    * so a config that changes inference (nanosAsLong) cannot leak across
    * sessions; this caches metadata only, never rows or results. */
  private val schemaCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), org.apache.spark.sql.types.StructType]

  def df(spark: SparkSession, dir: String, name: String): DataFrame = {
    val p = path(dir, name)
    val sch = schemaCache.getOrElseUpdate((spark, p),
      spark.read.parquet(p).schema)
    spark.read.schema(sch).parquet(p)
  }

  /** Register every table as a temp view so `spark.sql` works over the dir. */
  def register(spark: SparkSession, dir: String): Unit =
    names.foreach(n => df(spark, dir, n).createOrReplaceTempView(n))

  // Typed accessors for the common tables.
  def lineitem(s: SparkSession, d: String): DataFrame = df(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = df(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = df(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = df(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = df(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = df(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = df(s, d, "region")
  /** The events stream table, with `ts` normalized to an epoch-nano long.
    *
    * The generator has produced `ts` both as TIMESTAMP(NANOS) (read as a
    * nano long under spark.sql.legacy.parquet.nanosAsLong) and as plain
    * TIMESTAMP (micros). All event-time operators do exact integer math on
    * epoch nanos, so normalize here: micros × 1000 is lossless and keeps
    * every downstream `ts DIV …` expression and its DuckDB `epoch_ns(ts)`
    * oracle in exact agreement regardless of the physical parquet type.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = df(s, d, "events")
    raw.schema("ts").dataType match {
      case TimestampType | TimestampNTZType =>
        // NTZ → TZ cast is exact under the engine's fixed UTC session zone.
        raw.withColumn("ts",
          (unix_micros(col("ts").cast(TimestampType)) * 1000L).cast(LongType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = df(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = df(s, d, "embeddings")
}
