package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Generate an N× copy of an sf dir's `events` + `documents` tables for
  * scale-shape measurements (COVERAGE.md "1× vs N×" table):
  * `runMain graft.tools.ScaleGen <srcSfDir> <outDir> <copies>`.
  *
  * Each copy is statistically IDENTICAL to the source but disjoint from
  * the other copies, so workloads scale by data volume, not by
  * artificially inflated cross-copy similarity:
  *  - events: event_id / user_id / ts shifted per copy (ts by the full
  *    source span + one session gap, so copies never merge into one
  *    session) — sessions, gaps, and per-user signals replicate N×;
  *  - documents: doc_id shifted; copy 0 keeps the original text, other
  *    copies remap each TOKEN through a copy-salted md5 (length
  *    preserved) — token/shingle statistics and within-copy duplicate
  *    structure survive, while cross-copy shingle matches vanish
  *    (verbatim N× duplication would instead explode every LSH bucket
  *    quadratically and measure a different workload);
  *  - embeddings: vec_id shifted; each copy applies a deterministic
  *    per-(copy, dim) SIGN FLIP to every component — within-copy dot
  *    products and norms are bit-identical to the source (so each
  *    copy's neighborhood structure replicates exactly) while
  *    cross-copy cosines decorrelate.
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleGen <srcSfDir> <outDir> <copies>")
    val Array(src, out, copiesStr) = args
    val copies = copiesStr.toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Normalize ts to epoch-micros longs for the shift arithmetic (the
    // same physical-type branch as Tables.events — nanos-as-long or
    // TIMESTAMP(MICROS) testdata generations both work), then write back
    // as timestamp so the scaled dir round-trips through Tables.events.
    val evRaw = spark.read.parquet(s"$src/events.parquet")
    val tsUsCol = evRaw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case org.apache.spark.sql.types.TimestampType => unix_micros(col("ts"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case other => throw new IllegalStateException(s"events.ts: $other")
    }
    val ev = evRaw.withColumn("ts", tsUsCol)
    val (minTs, maxTs, maxEid, maxUid) = {
      val r = ev.agg(min("ts"), max("ts"), max("event_id"), max("user_id")).first()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    // span + 1h (micros): keeps copies temporally disjoint at any gap param
    val tsShift = (maxTs - minTs) + 3600L * 1000000L
    val copyDf = spark.range(copies).select(col("id").as("__copy"))
    ev.crossJoin(copyDf)
      .select(
        (col("event_id") + col("__copy") * (maxEid + 1L)).as("event_id"),
        timestamp_micros(col("ts") + col("__copy") * tsShift).as("ts"),
        (col("user_id") + col("__copy") * (maxUid + 1L)).as("user_id"),
        col("event_type"),
        col("value"),
        col("props")
      )
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/events.parquet")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val maxDid = docs.agg(max("doc_id")).first().getLong(0)
    docs.crossJoin(copyDf)
      .select(
        (col("doc_id") + col("__copy") * (maxDid + 1L)).as("doc_id"),
        // length-EXACT token remap: split with limit -1 keeps empty
        // tokens (runs of spaces / leading / trailing survive the
        // round-trip), empty tokens stay empty, and the md5 is repeated
        // to cover tokens longer than one 32-char digest before being
        // cut to the token's exact length — so n_chars stays truthful
        // for every copy
        when(col("__copy") === 0, col("text")).otherwise(
          concat_ws(
            " ",
            transform(
              split(col("text"), " ", -1),
              t =>
                when(length(t) === 0, t).otherwise(
                  substring(
                    repeat(
                      md5(concat(t, lit("#"), col("__copy").cast("string"))),
                      (ceil(length(t) / lit(32.0))).cast("int")
                    ),
                    lit(1),
                    length(t)
                  )
                )
            )
          )
        ).as("text"),
        col("lang"),
        col("source"),
        col("n_chars")
      )
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val maxVid = emb.agg(max("vec_id")).first().getLong(0)
    emb
      .crossJoin(copyDf)
      .select(
        (col("vec_id") + col("__copy") * (maxVid + 1L)).as("vec_id"),
        transform(
          col("embedding"),
          (x, j) =>
            when(
              col("__copy") === 0 ||
                pmod(xxhash64(col("__copy"), j), lit(2)) === 0,
              x
            ).otherwise(-x)
        ).as("embedding"),
        col("label")
      )
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    println(s"""{"scalegen":"done","copies":$copies,"out":"$out"}""")
    spark.stop()
  }
}
