package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.TableSpec
import graft.storage.Segments

/** CSV bulk load / export — CSVSegmentLoader/CSVSegmentExporter parity
  * (indexr-server/.../tool/CSVSegmentLoader.java:50,68-147, SURVEY.md §2.C).
  *
  * Load: csv columns are mapped onto the table spec's columns (by name, or
  * via an explicit csv-col → table-col mapping like the reference's load
  * spec), cast to the spec's types, nulls filled with the spec defaults,
  * then written as a dim-sorted segmented table with a pruning manifest.
  * Scale: `spark.read.csv` splits large files by range — the load is fully
  * parallel; the only shuffle is the sort-columns range partitioning.
  */
object Csv {

  def load(spark: SparkSession, csvPath: String, spec: TableSpec, tableDir: String,
      mapping: Map[String, String] = Map.empty, header: Boolean = true,
      numSegments: Int = 8): Unit = {
    var df = spark.read
      .option("header", header.toString)
      .option("mode", "PERMISSIVE") // bad rows → nulls → spec defaults
      .csv(csvPath)
    mapping.foreach { case (from, to) => df = df.withColumnRenamed(from, to) }
    val typed = spec.columns.foldLeft(df) { (acc, c) =>
      if (acc.columns.contains(c.name))
        acc.withColumn(c.name, col(c.name).cast(c.dataType))
      else acc.withColumn(c.name, c.defaultLiteral) // missing csv col → default
    }.select(spec.columns.map(c => col(c.name)): _*)
    val filled = spec.applyDefaults(typed)
    Segments.write(filled, tableDir, spec.sortColumns,
      indexedCols = spec.columns.filter(_.index).map(_.name), numSegments)
  }

  /** Export a table (or any DataFrame) to CSV. */
  def exportCsv(df: DataFrame, outPath: String, header: Boolean = true): Unit =
    df.write.mode("overwrite").option("header", header.toString).csv(outPath)

  def exportCsv(spark: SparkSession, tableDir: String, outPath: String): Unit =
    exportCsv(spark.read.parquet(tableDir), outPath)
}
