package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Canonical loaders for the driver's synthetic parquet tables
  * (TESTDATA.md). All timestamp columns are normalized to integral
  * epoch-MICROSECOND longs at load, mirroring the reference's "timestamps
  * are integral sample counters, not wall clock" contract
  * (reference: jagular/utils.py:83, jagular/io.py:103-110).
  *
  * Why microseconds: DuckDB (the correctness oracle) works in its native
  * microsecond timestamps, so `epoch_us(ts)` there must equal the long we
  * derive here — for every physical type a driver generation has used:
  * TIMESTAMP(NANOS) (read as epoch-nano longs under
  * `spark.sql.legacy.parquet.nanosAsLong`, `div 1000`) and TIMESTAMP(MICROS)
  * (read as TIMESTAMP_NTZ, wall clock treated as UTC → `unix_micros`).
  * [[events]] branches on the decoded Spark type so a testdata regeneration
  * cannot silently change query semantics.
  */
object Tables {

  /** Confs every graft session needs. Applied defensively at read time too
    * (they are runtime-settable SQL confs). The UTC pin makes the
    * NTZ-wall-clock → epoch-micros normalization exact (DuckDB's
    * `epoch_us` treats naive timestamps as UTC) and keeps every session —
    * driver, bench, tests — deterministic regardless of box timezone. */
  val requiredConfs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC"
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
    * column (physical nanos-as-long or micros-as-NTZ, see above) is
    * dropped to keep downstream schemas oracle-comparable. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = read(spark, dir, "events")
    val tsUs = raw.schema("ts").dataType match {
      case LongType         => expr("ts div 1000") // TIMESTAMP(NANOS) as long
      case TimestampType    => unix_micros(col("ts"))
      // NTZ wall clock == UTC instant under the session-timeZone pin, so
      // the cast is a zero-shift reinterpretation, not zone math.
      case TimestampNTZType => unix_micros(col("ts").cast(TimestampType))
      case other => throw new IllegalStateException(
        s"events.ts: unsupported physical type $other — extend Tables.events")
    }
    raw.withColumn("ts_us", tsUs).drop("ts")
  }
}
