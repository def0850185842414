package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.CappedLongSet.cappedSet

/** Exact set-similarity self-join — all pairs of records whose token
  * SETS have Jaccard similarity ≥ t, without the all-pairs product.
  * This is the exact counterpart of the probabilistic near-dup family
  * ([[DedupDocs]] MinHash/SimHash): LSH trades false negatives for
  * speed; this operator is EXACT (every qualifying pair, no misses)
  * and gets its scale from the prefix-filtering principle
  * (Chaudhuri et al. 2006 SSJoin; Xiao et al. 2008 PPJoin): order
  * every set by one global total order (document frequency ascending,
  * token bytewise as tie-break — rarest first), and any two sets with
  * |x ∩ y| ≥ α must share a token within their first
  * `m − α + 1` positions. For Jaccard ≥ t, α = ⌈t·max(mₓ, mᵧ)⌉ ≥
  * ⌈t·m⌉ per side, so bucketing on each set's
  * `m − ⌈t·m⌉ + 1`-prefix (its rarest tokens — the SMALLEST buckets)
  * is a complete candidate filter. Candidates are verified with the
  * true intersection; the threshold test is integer cross-multiplied
  * (`den·inter ≥ num·union`), so no float boundary can split engines.
  *
  * '''Hot-bucket shed.''' A prefix bucket's pair cost is quadratic in
  * its member count. Prefix tokens are by construction each set's
  * rarest, so real corpora bucket small — but a degenerate corpus
  * (thousands of identical sets) concentrates, and its OUTPUT is
  * genuinely quadratic. Buckets are therefore bounded with the
  * saturating [[graft.functions.CappedLongSet]] kernel (the
  * [[FuzzyJoin]] / winnow recipe): over-cap buckets saturate map-side
  * and are dropped — exact for every pair sharing at least one in-cap
  * prefix token; [[prefixShed]] counts exactly what was dropped.
  *
  * Plan: token-frequency rollup → one id-key exchange assembling each
  * set's globally-sorted order → stateless prefix explode → ONE
  * capped-bucket exchange → within-bucket sorted pair explode →
  * pair distinct → verify against the two token arrays (two id-key
  * joins). Every exchange is bounded by ids, tokens, or candidate
  * pairs — never by an all-pairs product.
  */
object SetSim {

  /** Default distinct-member cap per prefix bucket (see class doc). */
  val DefaultMaxBucket = 4096

  /** Exact rational form of the threshold: t = num / den with den a
    * power of ten — keeps every comparison integer. */
  private def rational(t: Double): (Long, Long) = {
    require(t > 0.0 && t <= 1.0, s"threshold must be in (0, 1], got $t")
    val bd = BigDecimal(t.toString)
    // bound the denominator: a float-noise threshold (0.7000000000000001)
    // would make den ~10^16 and the integer cross-multiplies
    // (den · |set|, num · union) silently overflow long at corpus scale
    require(bd.scale <= 6,
      s"threshold must have at most 6 decimal places, got $t (scale ${bd.scale})")
    val den = math.pow(10, bd.scale).toLong
    ((bd * den).toLongExact, den)
  }

  /** Normalized (id, toks, m): distinct non-empty tokens, empty sets
    * dropped. The id contract is NUMERIC (CappedLongSet buckets hold
    * longs): a non-castable id — a string key, a null — fails LOUD
    * inside the plan rather than silently becoming a NULL `__id` the
    * candidate buckets would drop (invisible lost coverage). */
  private def prep(df: DataFrame, idCol: String, toksCol: String): DataFrame =
    df.select(
        when(col(idCol).cast("long").isNull, raise_error(concat(
          lit(s"SetSim: id column '$idCol' must cast to BIGINT, got value "),
          coalesce(col(idCol).cast("string"), lit("NULL")))))
          .otherwise(col(idCol).cast("long")).as("__id"),
        array_distinct(filter(col(toksCol), t => t.isNotNull && length(t) > 0)).as("__toks"))
      .where(size(col("__toks")) > 0)
      .withColumn("__m", size(col("__toks")).cast("long"))

  /** Each id with its tokens re-sorted by the global (doc-frequency
    * ASC, token ASC) order, plus the integer prefix length
    * `m − ⌈t·m⌉ + 1`. */
  private def intDiv(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    Bridge.column(IntegralDivide(Bridge.expression(a), Bridge.expression(b)))
  }

  private def orderedPrefix(docs: DataFrame, num: Long, den: Long): DataFrame = {
    val tok = docs.select(col("__id"), explode(col("__toks")).as("__t"))
    val freq = tok.groupBy("__t").agg(count(lit(1)).as("__df"))
    val ceilTm = intDiv(lit(num) * col("__m") + lit(den - 1), lit(den))
    tok
      .join(freq, "__t")
      .groupBy("__id")
      .agg(sort_array(collect_list(struct(col("__df"), col("__t")))).as("__ord"))
      .select(
        col("__id"),
        transform(col("__ord"), x => x.getField("__t")).as("__sorted"))
      .withColumn("__m", size(col("__sorted")).cast("long"))
      .withColumn("__p", (col("__m") - ceilTm + 1).cast("int"))
  }

  /** All pairs `(id_a, id_b, inter, uni)` with `id_a < id_b` and
    * Jaccard(toks_a, toks_b) ≥ `threshold`, over distinct non-empty
    * tokens. `inter`/`uni` are the exact intersection / union sizes
    * (the caller derives the ratio; the operator never compares
    * floats). Prefix buckets over `maxBucket` members are shed (class
    * doc); with the default cap the output is exact on any corpus
    * whose prefix buckets stay in-cap.
    */
  def jaccardSelfJoin(
      df: DataFrame,
      idCol: String,
      toksCol: String,
      threshold: Double,
      maxBucket: Int = DefaultMaxBucket
  ): DataFrame = {
    val (num, den) = rational(threshold)
    // docs is referenced four times (token-frequency rollup, the
    // global-order reassembly, and both verify sides) — cut its
    // lineage once so the caller's upstream pipeline (tokenization of
    // the full corpus) runs exactly ONCE, not per reference (the
    // triangleCounts recipe; 4.5× on the fixture).
    val (docs, docsRdd) = graft.util.LoopFrames.cut(prep(df, idCol, toksCol))
    // materialize the shared cache once and read its MEASURED byte size:
    // an internal-RDD-backed frame has no Catalyst statistics, so the
    // verify joins below would always plan sort-merge. When the
    // normalized corpus fits the broadcast threshold (with the arrays'
    // real bytes, not a per-row allowance), hint it — two SMJ exchanges
    // + sorts become broadcast hash joins. Corpus-sized inputs keep the
    // shuffle lane: the gate reads the actual cached size (r18, guide
    // §3.1/§7.2; q_setsim_join 2.22 → measured below).
    docs.count()
    val docsBytes = docs.sparkSession.sparkContext.getRDDStorageInfo
      .find(_.id == docsRdd.id).map(i => i.memSize + i.diskSize)
      .getOrElse(Long.MaxValue)
    val bThr = docs.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    // driver fast path (the Graph driverEdgeLimit pattern): when the
    // whole normalized corpus fits the broadcast threshold, the 7-stage
    // prefix-filter pipeline (freq rollup → order reassembly → prefix
    // explode → capped buckets → pair explode → distinct → verify
    // joins) is pure stage-scheduling overhead — every step is a
    // deterministic integer computation (the bucket cap saturates on a
    // pure distinct-count threshold), so a flat in-memory replay is
    // EXACTLY output-equal (SetSimSpec A/B-pinned). Corpus-sized inputs
    // keep the distributed lane untouched.
    if (bThr > 0 && docsBytes <= bThr) {
      val rows = docsRdd.collect()
      docsRdd.unpersist(blocking = false)
      return jaccardSelfJoinDriver(docs.sparkSession, rows, docs.schema, num, den, maxBucket)
    }
    val pref = orderedPrefix(docs, num, den)
      .select(col("__id"), explode(slice(col("__sorted"), lit(1), col("__p"))).as("__t"))
    val buckets = pref
      .groupBy("__t")
      .agg(cappedSet(col("__id"), maxBucket).as("__ids"))
      .where(col("__ids").isNotNull && size(col("__ids")) > 1)
    // posexplode+slice pair explode (the shared DedupDocs shape): no
    // per-row O(m²) pair-array materialization at the bucket cap
    val cand = DedupDocs
      .explodePairs(buckets.select(col("__ids").as("docs")))
      .select(col("doc_a").as("id_a"), col("doc_b").as("id_b"))
      .distinct()
    // no broadcast hint here: the driver replay above already returned
    // for every corpus under the broadcast threshold, so this lane only
    // ever sees corpus-sized verify sides (the r18 hinted spelling was
    // dead code — ADVICE r18)
    val sides = docs.select(col("__id"), col("__toks"), col("__m"))
    val out = cand
      .join(sides.toDF("id_a", "__ta", "__ma"), "id_a")
      .join(sides.toDF("id_b", "__tb", "__mb"), "id_b")
      // size pre-filter: J ≥ t needs den·min(m) ≥ num·max(m)
      .where(lit(den) * least(col("__ma"), col("__mb")) >=
        lit(num) * greatest(col("__ma"), col("__mb")))
      .withColumn("inter", size(array_intersect(col("__ta"), col("__tb"))).cast("long"))
      .withColumn("uni", col("__ma") + col("__mb") - col("inter"))
      .where(lit(den) * col("inter") >= lit(num) * col("uni"))
      .select("id_a", "id_b", "inter", "uni")
    // materialize (lineage-cut) before releasing the shared cache
    val (res, _) = graft.util.LoopFrames.cut(out)
    res.count()
    docsRdd.unpersist(blocking = false)
    res
  }

  /** Driver replay of the prefix-filter algorithm for broadcast-sized
    * corpora — the IDENTICAL stages in flat memory: token df → global
    * (df ASC, token bytewise ASC) order per set → `m − ⌈t·m⌉ + 1`
    * prefix → per-prefix-token distinct-member buckets (dropped whole
    * past `maxBucket` — the saturating-cap semantics — or below 2
    * members) → pair distinct → exact intersection verify with the
    * integer cross-multiplied threshold. Tokens compare as UTF8String
    * (binary), matching the distributed sort order. */
  private def jaccardSelfJoinDriver(
      spark: org.apache.spark.sql.SparkSession,
      rows: Array[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType,
      num: Long,
      den: Long,
      maxBucket: Int
  ): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    import org.apache.spark.unsafe.types.UTF8String
    val n = rows.length
    val ids = new Array[Long](n)
    val tokSets = new Array[Array[UTF8String]](n)
    val df = new java.util.HashMap[UTF8String, Long]()
    var i = 0
    while (i < n) {
      val r = rows(i)
      ids(i) = r.getLong(0)
      val arr = r.getArray(1)
      val m = arr.numElements()
      val ts = new Array[UTF8String](m)
      var j = 0
      while (j < m) {
        ts(j) = arr.getUTF8String(j)
        df.put(ts(j), df.getOrDefault(ts(j), 0L) + 1L)
        j += 1
      }
      tokSets(i) = ts
      i += 1
    }
    // buckets over each set's (df ASC, token ASC) prefix
    val buckets = new java.util.HashMap[UTF8String, java.util.TreeSet[java.lang.Long]]()
    i = 0
    while (i < n) {
      val ts = tokSets(i)
      val m = ts.length
      val sorted = ts.sortWith { (a, b) =>
        val da = df.get(a); val dbv = df.get(b)
        if (da != dbv) da < dbv else a.compareTo(b) < 0
      }
      tokSets(i) = sorted
      val ceilTm = (num * m + den - 1) / den
      val p = (m - ceilTm + 1).toInt
      var j = 0
      while (j < p && j < m) {
        buckets.computeIfAbsent(sorted(j), _ => new java.util.TreeSet[java.lang.Long]())
          .add(ids(i))
        j += 1
      }
      i += 1
    }
    // candidate pairs from in-cap buckets with ≥ 2 members
    val idIdx = new java.util.HashMap[java.lang.Long, Integer]()
    i = 0
    while (i < n) { idIdx.put(ids(i), i); i += 1 }
    val cand = new java.util.HashSet[(Long, Long)]()
    buckets.values.forEach { members =>
      if (members.size() >= 2 && members.size() <= maxBucket) {
        val arr = members.toArray(new Array[java.lang.Long](members.size()))
        var a = 0
        while (a < arr.length - 1) {
          var b = a + 1
          while (b < arr.length) { cand.add((arr(a).longValue, arr(b).longValue)); b += 1 }
          a += 1
        }
      }
    }
    // verify candidates with the exact intersection
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    cand.forEach { p =>
      val idA = p._1; val idB = p._2
      val ia = idIdx.get(idA).intValue; val ib = idIdx.get(idB).intValue
      val ta = tokSets(ia); val tb = tokSets(ib)
      val ma = ta.length.toLong; val mb = tb.length.toLong
      if (den * math.min(ma, mb) >= num * math.max(ma, mb)) {
        val (small, big) = if (ma <= mb) (ta, tb) else (tb, ta)
        val bigSet = new java.util.HashSet[UTF8String](big.length * 2)
        big.foreach(bigSet.add)
        var inter = 0L
        small.foreach(t => if (bigSet.contains(t)) inter += 1)
        val uni = ma + mb - inter
        if (den * inter >= num * uni)
          out += new GenericInternalRow(Array[Any](idA, idB, inter, uni))
      }
    }
    val outSchema = StructType(Seq(
      schema.fields(0).copy(name = "id_a"),
      schema.fields(0).copy(name = "id_b"),
      StructField("inter", LongType, nullable = false),
      StructField("uni", LongType, nullable = false)))
    org.apache.spark.sql.graftbridge.Bridge.internalCreateDataFrame(
      spark,
      spark.sparkContext.parallelize(out.toSeq, 1),
      outSchema)
  }

  /** Shed diagnostic for [[jaccardSelfJoin]]: prefix tokens whose
    * bucket exceeded `maxBucket` members, with TRUE member counts —
    * count-only (map-side combinable), safe at any scale; empty ⇒ the
    * capped join was exact. */
  def prefixShed(
      df: DataFrame,
      idCol: String,
      toksCol: String,
      threshold: Double,
      maxBucket: Int = DefaultMaxBucket
  ): DataFrame = {
    val (num, den) = rational(threshold)
    orderedPrefix(prep(df, idCol, toksCol), num, den)
      .select(explode(slice(col("__sorted"), lit(1), col("__p"))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n_members"))
      .where(col("n_members") > maxBucket)
  }
}
