package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val k = 3

  private def docs = Seq(
    // benchmark slice: two docs, one shared shingle universe
    (0L, "alpha beta gamma delta", "bench"),
    (1L, "one two three four five", "bench"),
    // corpus: overlaps bench doc 0 on 2 distinct shingles
    (10L, "alpha beta gamma delta epsilon", "web"),
    // corpus: repeats its only overlapping shingle — still counts ONCE
    (11L, "one two three one two three", "web"),
    // corpus: overlaps both bench docs
    (12L, "alpha beta gamma one two three", "web"),
    // corpus: no overlap
    (13L, "zz yy xx ww vv", "web"),
    // corpus: shorter than k tokens — no shingles at all
    (14L, "zz yy", "web")
  ).toDF("doc_id", "text", "source")

  private val isBench = col("source") === "bench"

  test("overlapCounts counts distinct shared shingles; zero-overlap docs omitted") {
    val out = Decontaminate
      .overlapCounts(docs, isBench, k)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    // doc 10: "alpha beta gamma", "beta gamma delta" both in bench
    // doc 11: "one two three" appears twice in the doc, once in bench → 1
    // doc 12: "alpha beta gamma" + "one two three" → 2
    assert(out == Map(10L -> 2L, 11L -> 1L, 12L -> 2L))
  }

  test("bloom pre-filter plan is identical to the broadcast plan") {
    val real = graft.model.Tables.documents(spark, "/root/testdata/sf0.001")
    val isB = col("doc_id") % 7 === 0
    val corpus = real.where(!isB)
    val bench = real.where(isB)
    val exact = Decontaminate.overlapCountsAgainst(corpus, bench, k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val benchShingles = DedupDocs.shingles(bench, k).select("shingle").distinct()
    val viaBloom = Decontaminate
      .overlapCountsBloom(corpus, benchShingles, benchShingles.count(), k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaBloom == exact)
    assert(exact.nonEmpty, "fixture must actually produce overlaps")
    // a tiny bloom (high fpp pressure) must still be exact — false
    // positives only cost work, never wrong rows
    val tiny = Decontaminate
      .overlapCountsBloom(corpus, benchShingles, benchShingles.count(), k, fpp = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tiny == exact)
    // auto-select: an absurdly low broadcast threshold forces the bloom
    // path through the public API and the answer must not change
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
      val forced = Decontaminate.overlapCountsAgainst(corpus, bench, k)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(forced == exact)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    // saturation fallback: when the clamped filter can't reach ~5
    // bits/item the bloom is skipped, and the answer still must not
    // change (the plain shuffled semi-join)
    val maxBits = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val prev = spark.conf.getOption(maxBits)
    try {
      spark.conf.set(maxBits, "64") // 64 bits for thousands of shingles
      val saturated = Decontaminate
        .overlapCountsBloom(corpus, benchShingles, benchShingles.count(), k)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(saturated == exact)
    } finally prev match {
      case Some(v) => spark.conf.set(maxBits, v)
      case None => spark.conf.unset(maxBits)
    }
  }

  test("rowOverlapCount: exact path matches the batch join; bloom path no false negatives") {
    val bench = docs.where(isBench)
    val corpus = docs.where(!isBench)
    val exactCol = Decontaminate.rowOverlapCount(bench, k, col("text"))
    assert(org.apache.spark.sql.graftbridge.Bridge.expression(exactCol).toString.contains("shingle_set_overlap"))
    val exact = corpus.select(col("doc_id"), exactCol.as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // per-row form INCLUDES zero-overlap docs (the batch join omits them)
    assert(exact == Map(10L -> 2L, 11L -> 1L, 12L -> 2L, 13L -> 0L, 14L -> 0L))
    // an absurdly low broadcast threshold forces the bloom kernel
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64")
      val bloomCol = Decontaminate.rowOverlapCount(bench, k, col("text"))
      assert(org.apache.spark.sql.graftbridge.Bridge.expression(bloomCol).toString.contains("shingle_bloom_overlap"))
      val viaBloom = corpus.select(col("doc_id"), bloomCol.as("n")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // the bloom contract: NO false negatives (counts never shrink —
      // contaminated docs can't slip through); ~fpp inflation is allowed
      // (this tiny 48-bit filter does produce one FP shingle here)
      assert(viaBloom.keySet == exact.keySet)
      exact.foreach { case (id, n) =>
        assert(viaBloom(id) >= n, s"doc $id: bloom ${viaBloom(id)} < exact $n")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
  }

  test("rowOverlapCount fails fast past the clamped bloom capacity") {
    val bench = docs.where(isBench)
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val maxBits = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val prev = spark.conf.getOption(maxBits)
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64")
      spark.conf.set(maxBits, "8") // 8 bits for 5 shingles → saturated
      val e = intercept[IllegalArgumentException] {
        Decontaminate.rowOverlapCount(bench, k, col("text"))
      }
      assert(e.getMessage.contains("maxNumBits"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
      prev match {
        case Some(v) => spark.conf.set(maxBits, v)
        case None => spark.conf.unset(maxBits)
      }
    }
  }

  test("fuzzyOverlap flags signature-band collisions, not exact text only") {
    val df = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta", "bench"),
      // identical text → identical signature → all 4 bands collide
      (10L, "alpha beta gamma delta epsilon zeta eta theta", "web"),
      // one token changed → most shingles survive → ≥1 band collides
      // (near-dup: this is the case exact-shingle overlap under-counts)
      (11L, "alpha beta gamma delta epsilon zeta eta iota", "web"),
      // unrelated → no collision
      (12L, "uu vv ww xx yy zz aa bb", "web"),
      // under k tokens → no shingles, no bands, absent
      (13L, "uu vv", "web")
    ).toDF("doc_id", "text", "source")
    val out = Decontaminate
      .fuzzyOverlap(df, col("source") === "bench", k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.getOrElse(10L, 0L) == 4L, s"identical doc must hit all 4 bands: $out")
    assert(out.getOrElse(11L, 0L) >= 1L, s"near-dup doc must hit >= 1 band: $out")
    assert(!out.contains(12L) && !out.contains(13L), s"unrelated/short docs must be absent: $out")
  }

  test("fuzzyOverlapVerified keeps true near-dups and rejects weak collisions") {
    val df = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta", "bench"),
      (10L, "alpha beta gamma delta epsilon zeta eta theta", "web"), // identical
      (11L, "alpha beta gamma delta epsilon zeta eta iota", "web"), // near-dup
      (12L, "uu vv ww xx yy zz aa bb", "web")
    ).toDF("doc_id", "text", "source")
    val out = Decontaminate
      .fuzzyOverlapVerified(df, col("source") === "bench", k = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out.getOrElse(10L, 0) == 16, s"identical doc: all 16 components match: $out")
    out.get(11L).foreach(m => assert(m >= 8 && m < 16, s"near-dup estimate: $out"))
    assert(!out.contains(12L))
    // at minJaccard <= rowsPerBand/numHashes it degenerates to the
    // unverified collision set
    val loose = Decontaminate
      .fuzzyOverlapVerified(df, col("source") === "bench", k = 3, minJaccard = 0.25)
      .collect().map(_.getLong(0)).toSet
    val coll = Decontaminate
      .fuzzyOverlap(df, col("source") === "bench", k = 3)
      .collect().map(_.getLong(0)).toSet
    assert(loose == coll)
  }

  test("overlapFlags applies the minOverlap verdict as int") {
    val out = Decontaminate
      .overlapFlags(docs, isBench, k, minOverlap = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2))))
      .toMap
    assert(out == Map(10L -> ((2L, 1)), 11L -> ((1L, 0)), 12L -> ((2L, 1))))
  }

  test("clean drops benchmark docs and contaminated corpus docs only") {
    val kept = Decontaminate
      .clean(docs, isBench, k, minOverlap = 2)
      .select("doc_id")
      .collect()
      .map(_.getLong(0))
      .sorted
    assert(kept.toSeq == Seq(11L, 13L, 14L))
  }

  test("null-source rows are excluded from both sides") {
    val withNull = docs.union(
      Seq((20L, "alpha beta gamma delta", null.asInstanceOf[String])).toDF("doc_id", "text", "source"))
    val out = Decontaminate.overlapCounts(withNull, isBench, k)
    assert(!out.collect().map(_.getLong(0)).contains(20L))
  }

  test("benchmark shingle set broadcasts (no shuffle of the corpus stream for the match)") {
    val plan = Decontaminate
      .overlapCounts(docs, isBench, k)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"))
  }

  test("an oversized benchmark side degrades to a shuffled semi-join, same result") {
    val expected = Decontaminate.overlapCounts(docs, isBench, k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1") // every side is now "too big" for the gate
      val out = Decontaminate.overlapCounts(docs, isBench, k)
      assert(!out.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
      assert(out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == expected)
    } finally spark.conf.set(key, old)
  }
}
