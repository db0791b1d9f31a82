package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface. The reference lands API extracts (YouTube/Spotify
  * JSON) into BigQuery tables (dags/scripts/youtube_elt.py and
  * spotify_elt.py `load_...` + bigquery.Client); the Spark-native
  * equivalents are schema-on-read loaders and partitioned/bucketed
  * writers:
  *
  *  - parquet: primary columnar format (all driver test tables)
  *  - csv / json(lines): the landing formats of API extracts
  *  - partitioned + bucketed writes: the physical layouts that make the
  *    100 TB joins co-located (bucket join avoids the shuffle entirely)
  *
  * Explicit schemas everywhere — schema inference is a full extra pass at
  * scale and non-deterministic under dirty data.
  */
object Sources {

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def csv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("sep", delimiter)
      .option("mode", "PERMISSIVE")
      .csv(path)

  def jsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC — the other columnar interchange format; same pushdown/pruning
    * behavior as parquet under the DataSource V2 scan.
    */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** Hive-style partitioned parquet write — the layout that gives
    * partition pruning on the partition keys for free.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Bucketed + sorted table write (requires a table catalog): both sides
    * of a recurring equi-join bucketed on the key join without any
    * exchange. This is the 100 TB co-location strategy for
    * lineitem⋈orders-shaped joins.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Streaming sink: append stream to partitioned parquet with
    * checkpointing (exactly-once file sink).
    */
  def writeStreamParquet(df: DataFrame, path: String, checkpoint: String) =
    df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
}
