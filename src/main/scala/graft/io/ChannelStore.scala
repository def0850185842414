package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed channel store: persists channel sample tables bucketed AND
  * sorted by `ts`, so equi-joins/aggregations across channel streams
  * (tetrode assembly, common-average reference, cross-channel
  * correlation) are CO-LOCATED — Spark elides the shuffle exchange and
  * the sort when both sides share the bucket spec. At 100 TB this turns
  * the hottest repeated join of the workload into a zip of pre-sorted
  * buckets.
  *
  * (Plain `partitionBy(channel)` parquet — `ExtractChannels.extractTo` —
  * remains the interchange layout; bucketing requires a table catalog.)
  */
object ChannelStore {

  def writeBucketed(
      df: DataFrame,
      tableName: String,
      nBuckets: Int,
      partitionCols: Seq[String] = Seq("channel")
  ): Unit = {
    val w = df.write
      .mode("overwrite")
      .bucketBy(nBuckets, "ts")
      .sortBy("ts")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .format("parquet")
      .saveAsTable(tableName)
  }

  def read(spark: SparkSession, tableName: String): DataFrame = spark.table(tableName)
}
