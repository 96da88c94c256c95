package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** NDJSON→Parquet ingestion — the reference's Glue job
  * (glue_batch_job.py:147-209) re-expressed as a library.
  *
  * Differences from the reference, by design:
  *  - No manifest round-trip through a driver-side JSON fetch: the file
  *    list is just the read path(s); Spark's file source parallelizes the
  *    listing.
  *  - No `df.cache(); df.count()` double-scan to size the output —
  *    callers pass a target partition count (computed from input bytes,
  *    see Analytics.outputSizing) and we `repartition` once.
  *  - Schema can be supplied to skip inference (inference = a full extra
  *    pass over 100 TB; at scale always pass a schema or sample).
  */
object Ingest {

  /** Read NDJSON files and stamp lineage columns
    * (`_source_file`, `_processing_timestamp`) like the reference. */
  def readNdjson(spark: SparkSession, paths: Seq[String],
                 schema: Option[StructType] = None): DataFrame = {
    val reader = spark.read.option("multiLine", "false")
    val df = schema.fold(reader)(reader.schema).json(paths: _*)
    stampLineage(df)
  }

  def stampLineage(df: DataFrame): DataFrame = df
    .withColumn("_source_file", input_file_name())
    .withColumn("_processing_timestamp", current_timestamp())

  /** Cast every column to string — the reference's schema-drift armor
    * (glue_batch_job.py:161-168). Narrow op, stays in codegen. */
  def castAllToString(df: DataFrame): DataFrame =
    df.select(df.columns.map(c => col(c).cast(StringType).as(c)): _*)

  /** Write date-partitioned snappy parquet. `targetPartitions` controls
    * output file count (size-targeted by the caller); `partitionBy` a
    * date column gives the reference's merged-parquet-YYYY-MM-DD layout
    * natively. */
  def writeParquet(df: DataFrame, path: String,
                   targetPartitions: Int,
                   partitionCol: Option[String] = None,
                   mode: SaveMode = SaveMode.Append,
                   compression: String = "snappy"): Unit = {
    val sized = df.repartition(math.max(targetPartitions, 1))
    val w = sized.write.mode(mode).option("compression", compression)
    partitionCol.fold(w)(c => w.partitionBy(c)).parquet(path)
  }
}
