package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document deduplication for a training-data pipeline: exact, MinHash/LSH,
  * n-gram Jaccard, SimHash. Exact + Jaccard + MinHash use md5-derived
  * hashes so a SQL oracle reproduces them bit-for-bit; all are
  * shuffle-on-key plans (no global sort, no driver loops).
  */
object DedupDocs {

  /** Exact dedup by content hash (keep-first = min doc_id).
    * One shuffle on the md5 key; at 100 TB this is the classic
    * hash-groupBy dedup with map-side partial aggregation. */
  def exactGroups(documents: DataFrame): DataFrame =
    documents
      .groupBy(md5(col("text").cast("binary")).as("content_md5"))
      .agg(min(col("doc_id")).as("keeper_doc_id"), count(lit(1)).as("n_copies"))

  /** Word k-shingles, distinct per doc. */
  def shingles(documents: DataFrame, k: Int): DataFrame =
    documents
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(
        col("doc_id"),
        explode(
          array_distinct(
            transform(
              sequence(lit(0), size(col("toks")) - k),
              i => concat_ws(" ", slice(col("toks"), i + 1, lit(k)))
            )
          )
        ).as("shingle")
      )

  /** Exact pairwise n-gram Jaccard similarity >= threshold, blocked by a
    * `blockCol` (e.g. source) to bound the candidate space — the standard
    * blocking trick that keeps the pair join linear-ish instead of n².
    * Pairs are emitted once (doc_a < doc_b). */
  def ngramJaccardPairs(
      documents: DataFrame,
      k: Int,
      threshold: Double,
      blockCol: String
  ): DataFrame = {
    val sh = shingles(documents, k)
      .join(documents.select(col("doc_id"), col(blockCol)), "doc_id")
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val inter = sh
      .as("a")
      .join(
        sh.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col(s"a.$blockCol") === col(s"b.$blockCol") &&
          col("a.doc_id") < col("b.doc_id")
      )
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
      .withColumn(
        "jaccard",
        round(
          col("n_inter").cast("double") /
            (col("n_a") + col("n_b") - col("n_inter")).cast("double"),
          4
        )
      )
      .where(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** MinHash signature: for each of `numHashes` seeds, the minimum hash
    * over the doc's shingles. ONE md5 per shingle; the seed family is the
    * Carter-Wegman combination `h_s = h1 + s·(h2 mod 1e9+7)` of the two
    * md5 halves — 16× fewer digests than hashing (seed, shingle) pairs,
    * same independence in practice, and still byte-reproducible by the
    * SQL oracle. The per-(doc, seed) min is computed with `numHashes`
    * min-aggregates over an array column (no row explosion), then
    * unpivoted. */
  def minhashSignatures(documents: DataFrame, k: Int, numHashes: Int): DataFrame = {
    val hashed = shingles(documents, k)
      .withColumn("__md5", md5(col("shingle").cast("binary")))
      .withColumn("h1", conv(substring(col("__md5"), 1, 15), 16, 10).cast("long"))
      .withColumn("h2", conv(substring(col("__md5"), 17, 15), 16, 10).cast("long") % 1000000007L)
    val minCols = (0 until numHashes).map { s =>
      min(col("h1") + lit(s.toLong) * col("h2")).as(s"m$s")
    }
    val agg = hashed.groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
    val stacked = (0 until numHashes)
      .map(s => s"$s, m$s")
      .mkString(", ")
    agg.selectExpr("doc_id", s"stack($numHashes, $stacked) AS (seed, minhash)")
  }

  /** MinHash-LSH candidate pairs: band the signature (`numHashes` rows into
    * bands of `rowsPerBand`), bucket-join on (band, band-hash), emit
    * distinct candidate pairs. The banding join is the scale path: no n²
    * comparison ever materializes. */
  def minhashLshPairs(
      documents: DataFrame,
      k: Int,
      numHashes: Int,
      rowsPerBand: Int
  ): DataFrame = {
    val sig = minhashSignatures(documents, k, numHashes)
      .withColumn("band", (col("seed") / rowsPerBand).cast("int"))
      .groupBy("doc_id", "band")
      // deterministic band key "s0:h0,s1:h1,..." (seed order) — a plain
      // string both engines can reproduce byte-identically
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("seed"), col("minhash")))),
            s => concat_ws(":", s.getField("seed"), s.getField("minhash"))
          ),
          ","
        ).as("band_key")
      )
    sig
      .as("a")
      .join(
        sig.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id")
      )
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** 64-bit SimHash over word tokens: per bit position, sum +1/-1 weighted
    * by token-hash bit, sign → bit. md5-derived token hash (first 16 hex
    * chars as unsigned-ish long via two 8-hex halves). */
  def simhash(documents: DataFrame): DataFrame = {
    val tok = documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("th_hi", conv(substring(md5(col("tok").cast("binary")), 1, 8), 16, 10).cast("long"))
      .withColumn("th_lo", conv(substring(md5(col("tok").cast("binary")), 9, 8), 16, 10).cast("long"))
    val bitCols = (0 until 64).map { b =>
      val src = if (b < 32) col("th_lo") else col("th_hi")
      val shift = if (b < 32) b else b - 32
      sum(when(shiftright(src, shift).bitwiseAND(1L) === 1L, 1L).otherwise(-1L)).as(s"s$b")
    }
    val agg = tok.groupBy("doc_id").agg(bitCols.head, bitCols.tail: _*)
    val sim = (0 until 64)
      .map(b => when(col(s"s$b") > 0, shiftleft(lit(1L), b)).otherwise(0L))
      .reduce(_.bitwiseOR(_))
    agg.select(col("doc_id"), sim.as("simhash"))
  }
}
