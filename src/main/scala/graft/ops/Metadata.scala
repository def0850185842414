package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Sidecar-metadata parsing — the "props/meta JSON string column" every
  * web-crawl and event-log table drags along (WARC headers, scorer
  * outputs, ingestion annotations). A training-data pipeline needs the
  * typed values out of that string (to filter on crawl scores, route by
  * source attributes, aggregate telemetry) WITHOUT a pre-processing pass
  * that rewrites the table.
  *
  * Physical shape: `from_json` is a codegen'd Jackson parse — one pass
  * per row, no UDF, no shuffle; the parse happens inside the same
  * WholeStageCodegen span as the downstream filter/projection, so a
  * predicate on an extracted field prunes rows before any exchange. At
  * 100 TB the only cost is the scan itself: parsing is compute-local,
  * the post-parse aggregate collapses map-side, and column pruning still
  * reaches the parquet scan (only the JSON column + group keys are read).
  *
  * Malformed rows: `from_json` yields NULL fields (PERMISSIVE) rather
  * than failing the job — at crawl scale a few broken records must never
  * kill a pass. [[fieldStats]] counts them explicitly so data quality is
  * observable, not silently absorbed.
  */
object Metadata {

  /** Parse `jsonCol` against `schema`, appending one typed column per
    * schema field (dotted into top level). The raw string column is kept
    * — downstream sinks decide whether to drop it. */
  def parseTyped(df: DataFrame, jsonCol: String, schema: StructType): DataFrame = {
    val parsed = df.withColumn("_meta", from_json(col(jsonCol), schema))
    schema.fields.foldLeft(parsed) { (d, f) =>
      d.withColumn(f.name, col(s"_meta.${f.name}"))
    }.drop("_meta")
  }

  /** Per-group stats of one numeric JSON field: row count, non-null
    * parse count, exact integer sum, and 4dp mean. The mean divides the
    * exact long sum as a double (not a streamed float average), so it is
    * order-independent and oracle-exact; an unparseable group gets the
    * −1 sentinel (NULL doubles break value hashing in the compare). */
  def fieldStats(
      df: DataFrame,
      jsonCol: String,
      fieldPath: String,
      groupCols: Seq[String]
  ): DataFrame = {
    val v = get_json_object(col(jsonCol), s"$$.$fieldPath").cast("long")
    df.withColumn("_v", v)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("_v")).as("n_parsed"),
        coalesce(sum(col("_v")), lit(0L)).as("sum_v")
      )
      .withColumn(
        "mean_v",
        when(col("n_parsed") > 0L,
          round(col("sum_v").cast("double") / col("n_parsed").cast("double"), 4))
          .otherwise(lit(-1.0)))
  }
}
