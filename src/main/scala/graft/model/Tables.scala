package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical loaders for the driver's synthetic parquet tables
  * (TESTDATA.md). All timestamp columns are normalized to integral
  * epoch-MICROSECOND longs at load, mirroring the reference's "timestamps
  * are integral sample counters, not wall clock" contract
  * (reference: jagular/utils.py:83, jagular/io.py:103-110).
  *
  * Why microseconds: the driver's parquet stores TIMESTAMP(NANOS); Spark 4
  * reads those as epoch-nano longs under
  * `spark.sql.legacy.parquet.nanosAsLong`, while DuckDB (the correctness
  * oracle) truncates to its native microsecond timestamps. `ts div 1000`
  * here == `epoch_us(ts)` there, exactly.
  */
object Tables {

  /** Confs every graft session needs. Applied defensively at read time too
    * (they are runtime-settable SQL confs). */
  val requiredConfs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true"
  )

  private def withConfs(spark: SparkSession): SparkSession = {
    requiredConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    spark
  }

  private def read(spark: SparkSession, dir: String, name: String): DataFrame =
    withConfs(spark).read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")

  /** Events with `ts_us: Long` (epoch micros) appended. The raw `ts`
    * column is epoch nanos (read as Long, see above) and is dropped to
    * keep downstream schemas oracle-comparable. */
  def events(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "events")
      .withColumn("ts_us", expr("ts div 1000"))
      .drop("ts")
}
