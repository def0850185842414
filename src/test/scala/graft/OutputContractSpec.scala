package graft

import org.apache.spark.sql.types._

/** Output-type contract over EVERY declared oracle query.
  *
  * The driver's correctness gate reads the Spark result parquet via
  * pyarrow but the DuckDB oracle via pandas; any DecimalType output
  * column renders as `Decimal("47.3500")` on one side and float64
  * `47.35` on the other and fails the hash even when the VALUES are
  * bit-identical (the five round-14 red rows: q_trailing_features,
  * q_resample, q_reliability, q_skew_advisor, q_snapshot_diff — judge
  * verified `EXCEPT ALL` empty both ways). FloatType is banned for the
  * adjacent reason: float32 text renderings differ between engines.
  *
  * The convention (q_running_sum since round 8): compute in DECIMAL for
  * exactness, CAST the final output column to DOUBLE (or BIGINT for
  * counts/products). This spec pins it at the schema level — analysis
  * only, no execution — so the class of red row cannot ship again.
  */
class OutputContractSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def offenders(dt: DataType, path: String): Seq[String] = dt match {
    case _: DecimalType => Seq(s"$path: $dt")
    case FloatType => Seq(s"$path: float")
    case s: StructType => s.fields.toSeq.flatMap(f => offenders(f.dataType, s"$path.${f.name}"))
    case a: ArrayType => offenders(a.elementType, s"$path[]")
    case m: MapType =>
      offenders(m.keyType, s"$path.key") ++ offenders(m.valueType, s"$path.value")
    case _ => Nil
  }

  test("no DecimalType or FloatType in any declared query's output schema") {
    val bad = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val schema = SparkEntry.queries(name)(spark, dir).schema
      schema.fields.toSeq.flatMap(f => offenders(f.dataType, s"$name.${f.name}"))
    }
    assert(bad.isEmpty,
      s"decimal/float output columns break the driver's cross-engine hash; " +
        s"cast to double/bigint (q_running_sum convention):\n${bad.mkString("\n")}")
  }
}
