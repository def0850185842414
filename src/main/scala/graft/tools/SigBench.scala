package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev scratch: compare minhash-signature formulations at sf0.1.
  * `runMain graft.tools.SigBench [sfDir]` */
object SigBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.model.Tables.documents(spark, sfDir)
    docs.count() // warm

    val k = 3
    val numHashes = 16

    def time(name: String)(df: => DataFrame): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.3fs")
      }
    }

    // A: the retired HOF pipeline — exploded shingles + 16-way min-agg
    time("minhash-hof") {
      graft.ops.DedupDocs.wideSignaturesHof(docs, k, numHashes)
    }

    // A': shipped — one-pass native kernel (functions/MinHashSig)
    time("minhash-native") {
      docs.select(
        col("doc_id"),
        graft.functions.MinHashSig.minhashSig(col("text"), k, numHashes).as("ms")
      ).where(col("ms").isNotNull)
    }

    // B: HOF stage anatomy — exploded + 16-way min-agg spelled inline
    time("exploded-agg") {
      val hashed = graft.ops.DedupDocs.shinglesHof(docs, k)
        .withColumn("__md5", md5(col("shingle").cast("binary")))
        .withColumn("h1", conv(substring(col("__md5"), 1, 15), 16, 10).cast("long"))
        .withColumn("h2", conv(substring(col("__md5"), 17, 15), 16, 10).cast("long") % 1000000007L)
      val minCols = (0 until numHashes).map { s =>
        min((col("h1") % 1000000007L + lit(s.toLong) * col("h2")) % 1000000007L).as(s"m$s")
      }
      hashed.groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
    }

    // C: no array_distinct (min over dups == min over distinct)
    time("no-distinct") {
      val toks = split(col("text"), " ")
      val hashed = docs
        .where(size(toks) >= k)
        .select(
          col("doc_id"),
          explode(
            transform(
              sequence(lit(0), size(toks) - k),
              i => concat_ws(" ", slice(toks, i + 1, lit(k)))
            )
          ).as("shingle")
        )
        .withColumn("__md5", md5(col("shingle").cast("binary")))
        .withColumn("h1", conv(substring(col("__md5"), 1, 15), 16, 10).cast("long"))
        .withColumn("h2", conv(substring(col("__md5"), 17, 15), 16, 10).cast("long") % 1000000007L)
      val minCols = (0 until numHashes).map { s =>
        min((col("h1") % 1000000007L + lit(s.toLong) * col("h2")) % 1000000007L).as(s"m$s")
      }
      hashed.groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
    }

    // D: stage isolation — shingle+explode only (HOF vs native kernel)
    time("shingle-count-hof") {
      graft.ops.DedupDocs.shinglesHof(docs, k).groupBy("doc_id").agg(count(lit(1)).as("n"))
    }
    time("shingle-count-native") {
      graft.ops.DedupDocs.shingles(docs, k).groupBy("doc_id").agg(count(lit(1)).as("n"))
    }

    // E: shingle + md5, no conv
    time("md5-count") {
      graft.ops.DedupDocs.shinglesHof(docs, k)
        .withColumn("__md5", md5(col("shingle").cast("binary")))
        .groupBy("doc_id").agg(min("__md5").as("m"))
    }

    // ---- simhash variants ----
    // F: shipped — one-pass native kernel (functions/SimHash64)
    time("simhash-native") {
      graft.ops.DedupDocs.simhash(docs)
    }

    // G: the retired packed-lane aggregate — 16 sum-agg columns, each
    // packing 4 popcount lanes (s_b = 2*c_b - n recovers the signed
    // sum); itself ~30% faster than the 64-when-column formulation.
    time("simhash-packed-hof") {
      val tok = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .withColumn("__md5", md5(col("tok").cast("binary")))
        .withColumn("th_hi", conv(substring(col("__md5"), 1, 8), 16, 10).cast("long"))
        .withColumn("th_lo", conv(substring(col("__md5"), 9, 8), 16, 10).cast("long"))
      val groups = (0 until 16).map { g =>
        val terms = (0 until 4).map { i =>
          val b = g * 4 + i
          val src = if (b < 32) col("th_lo") else col("th_hi")
          val shift = if (b < 32) b else b - 32
          shiftleft(shiftright(src, shift).bitwiseAND(1L), 15 * i)
        }
        sum(terms.reduce(_ + _)).as(s"g$g")
      }
      val agg = tok.groupBy("doc_id").agg(count(lit(1)).as("n"), groups: _*)
      val sim = (0 until 64).map { b =>
        val g = b / 4; val i = b % 4
        val c = shiftright(col(s"g$g"), 15 * i).bitwiseAND(32767L)
        when(c * 2 > col("n"), shiftleft(lit(1L), b)).otherwise(0L)
      }.reduce(_.bitwiseOR(_))
      agg.select(col("doc_id"), sim.as("simhash"))
    }

    // ---- ngram jaccard diagnostics ----
    {
      import graft.ops.DedupDocs
      val base = docs.where(col("source").isNotNull)
      val sh = DedupDocs.shingles(base, 3, carry = Seq("source"))
      val buckets = sh
        .groupBy(col("source"), col("shingle"))
        .agg(sort_array(collect_list(col("doc_id"))).as("docs"))
      println(s"shingle rows: ${sh.count()}")
      println(s"buckets: ${buckets.count()}, multi-doc: ${buckets.where(size(col("docs")) > 1).count()}")
      val pairsRaw = DedupDocs.explodePairs(buckets.where(size(col("docs")) > 1))
      println(s"exploded pair rows: ${pairsRaw.count()}")
      println(s"distinct pairs: ${pairsRaw.distinct().count()}")
    }
    time("ngram-jaccard-current") {
      graft.ops.DedupDocs.ngramJaccardPairs(docs, 3, 0.8, "source")
    }

    // ---- rolling-hash fingerprint: interpreted HOF vs native codegen ----
    // H: the retired formulation — per-char split + interpreted fold
    time("polyhash-hof") {
      docs.select(
        col("doc_id"),
        expr(
          "aggregate(transform(split(text, ''), c -> ascii(c)), 0L, (acc, x) -> (acc * 31L + x) % 1000000007L)"
        ).as("poly_hash")
      )
    }
    // I: shipped — byte-iterating codegen'd expression
    time("polyhash-native") {
      docs.select(
        col("doc_id"),
        graft.functions.PolyHash.polyHash(col("text")).as("poly_hash")
      )
    }

    // ---- spline alignment: external-Row UDF vs native kernel ----
    // q_align's waveform build (patch gather + groupBy) dominates its
    // bench time, so isolate the kernel: synthesize a wide batch of
    // 6-sample × 4-channel waveforms directly and time ONLY the align.
    {
      val wfs = spark.range(200000).select(
        col("id"),
        transform(
          sequence(lit(0), lit(5)),
          s => transform(
            sequence(lit(0), lit(3)),
            c => exp((s.cast("double") - lit(2.6) - c.cast("double") * 0.1)
              * (lit(2.6) + c.cast("double") * 0.1 - s.cast("double")) / 2.0) * 100.0
              + pmod(col("id") * 37 + c.cast("long"), lit(97L)).cast("double") / 10.0
          )
        ).as("waveform")
      ).persist()
      wfs.count()
      time("align-udf") {
        graft.align.Align.alignColumnUdf(wfs, "waveform", 2, 2)
      }
      time("align-native") {
        graft.align.Align.alignColumn(wfs, "waveform", 2, 2)
      }
      wfs.unpersist()
    }
    spark.stop()
  }
}
