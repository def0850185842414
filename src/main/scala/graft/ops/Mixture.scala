package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-mixture construction: deterministic per-source weighted
  * sampling, and greedy sequence packing of documents into fixed token
  * budgets.
  *
  * Sampling is HASH-derived, not RNG-derived, on purpose: `rand()` is
  * not stable under task retry or repartitioning (a re-run task draws a
  * different stream), so at 100 TB a failed executor would silently
  * change the mixture. A content-keyed hash gives every row a permanent
  * uniform draw — the same doc is kept or dropped on every run, retry,
  * and engine (the SQL oracle reproduces it bit-for-bit) — and changing
  * the salt re-rolls the whole mixture reproducibly. Both operators are
  * narrow (projection/filter; window per group for packing): no shuffle
  * for sampling at any scale.
  */
object Mixture {

  /** Driver-collect bound for [[tokenBudgetTwoPass]]'s per-(source,
    * bucket) sums: 1M entries ≈ low hundreds of MB of driver map — far
    * past any giant-source layout the plan is meant for. */
  private val MaxTwoPassGroups = 1000000L

  /** Deterministic uniform draw in [0, 1): the first 8 md5 hex chars of
    * `salt || id` as a 32-bit integer, scaled. Engine-portable (DuckDB:
    * `('0x' || substr(md5(...), 1, 8))::UBIGINT / 2^32`). */
  def uniformHash(salt: String, id: Column): Column =
    conv(substring(md5(concat(lit(salt), id.cast("string")).cast("binary")), 1, 8), 16, 10)
      .cast("long") / lit(4294967296.0)

  /** Per-source weighted sample: keep a row iff its uniform draw is
    * under the source's weight (sources absent from `weights` get 0 and
    * are dropped — e.g. a benchmark slice). A weight of 1.0 keeps the
    * source whole. */
  def sample(
      documents: DataFrame,
      weights: Map[String, Double],
      salt: String,
      sourceCol: String = "source"
  ): DataFrame = {
    require(weights.values.forall(w => w >= 0.0 && w <= 1.0),
      s"weights must be in [0, 1], got $weights")
    val w = weights.toSeq
      .sortBy(_._1)
      .foldLeft(Option.empty[Column]) {
        case (None, (src, wt)) => Some(when(col(sourceCol) === src, lit(wt)))
        case (Some(c), (src, wt)) => Some(c.when(col(sourceCol) === src, lit(wt)))
      }
      .fold(lit(0.0))(_.otherwise(lit(0.0)))
    documents.where(uniformHash(salt, col("doc_id")) < w)
  }

  /** Temperature-reweighted corpus sampling (the mT5 / GPT-3 mixing
    * rule): target mixture proportions ∝ n_s^α flatten the source
    * distribution for α < 1, realized WITHOUT replacement by keeping
    * each source at rate (n_min / n_s)^(1−α) — the smallest source is
    * kept whole, larger sources are hash-downsampled toward the
    * temperature-flattened share. α = 1 keeps everything; α → 0
    * approaches equal token counts per source.
    *
    * One O(sources) aggregate computes token totals; the rate table is
    * count-gate-broadcast back onto the corpus (same contract as the LM
    * scoring joins), so the corpus itself NEVER shuffles — the filter is
    * a map-side hash compare, retry/repartition-stable like [[sample]].
    * Emits (doc_id, source, rate) for kept docs, rate rounded for the
    * oracle compare. */
  def temperatureSample(
      documents: DataFrame,
      alpha: Double,
      salt: String,
      sourceCol: String = "source"
  ): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    val perSrc = documents
      .groupBy(col(sourceCol))
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
    // n_min and the broadcast-gate count come from ONE job over the
    // per-source aggregate — folding the global min into the plan as a
    // 1-row cross join would cost the same corpus pass but plan a
    // (harmless-looking, PlanShapeSpec-banned) nested-loop join.
    val statsRow = perSrc.agg(count(lit(1)).as("n"), min(col("n_tokens")).as("n_min")).head()
    val nSources = statsRow.getLong(0)
    val nMinTokens = if (nSources == 0L) 0L else statsRow.getLong(1)
    val rates = perSrc
      .select(
        col(sourceCol),
        pow(lit(nMinTokens).cast("double") / col("n_tokens").cast("double"), 1.0 - alpha)
          .as("rate")
      )
    val ratesSide = graft.spikes.Spikes.broadcastIfSmall(rates, nSources)
    documents
      .select(col("doc_id"), col(sourceCol))
      .join(ratesSide, Seq(sourceCol))
      .where(uniformHash(salt, col("doc_id")) < col("rate"))
      .select(col("doc_id"), col(sourceCol), round(col("rate"), 6).as("rate"))
  }

  /** Exact-k-per-source sample (eval-set carving, balanced inspection
    * slices): rank every doc by the SAME deterministic uniform draw as
    * [[sample]] and keep the k smallest per source — so the selection is
    * retry/repartition-stable, stable under corpus GROWTH for the
    * already-chosen docs' relative order, and reproducible from the salt
    * alone. Ties (a 2⁻³² hash collision) break by doc_id. One window
    * sort per source partition — embarrassingly parallel across sources,
    * the 100 TB axis; for k ≪ partition size a TakeOrderedAndProject-
    * style per-partition pre-truncation would cut the sort, which AQE
    * does not do for windows — the documented upgrade if eval carving
    * ever dominates a pipeline. */
  def stratifiedSample(
      documents: DataFrame,
      k: Int,
      salt: String,
      sourceCol: String = "source"
  ): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = Window
      .partitionBy(col(sourceCol))
      .orderBy(uniformHash(salt, col("doc_id")).asc, col("doc_id").asc)
    documents
      .select(col("doc_id"), col(sourceCol))
      .withColumn("draw_rank", row_number().over(w))
      .where(col("draw_rank") <= k)
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis 2006,
    * algorithm A-ES): every row draws the deterministic uniform
    * u = [[uniformHash]](salt, id) and gets key = u^(1/w); the k
    * LARGEST keys are exactly a weight-proportional sample without
    * replacement. This is the one sampling shape the hash-filter
    * family above cannot express: per-ROW weights (sample documents ∝
    * token count, quality score, dedup-cluster mass) with an exact-k
    * guarantee, no replacement, and no accept/reject loop.
    *
    * Same determinism contract as [[sample]]/[[stratifiedSample]]:
    * retry/repartition-stable, reproducible from the salt, and the
    * draw survives corpus growth (a new row displaces at most the
    * current rank-k row, never reshuffles the selection).
    *
    * Plan shape: `strataCol = None` (global top-k) sorts nothing
    * globally — `orderBy().limit(k)` plans TakeOrderedAndProject,
    * per-partition heap top-k + driver merge of k·partitions rows,
    * the 100 TB-safe spelling. `Some(col)` ranks per stratum with one
    * window (parallel across strata — the same shape as
    * [[stratifiedSample]]). Rows with weight ≤ 0 or NULL cannot be
    * drawn and are dropped. Output: (id, strata?, weight, draw_key
    * rounded 6dp, draw_rank); ties (identical keys) break by id. */
  def prioritySample(
      documents: DataFrame,
      k: Int,
      weightCol: String,
      salt: String,
      idCol: String = "doc_id",
      strataCol: Option[String] = None
  ): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = col(weightCol).cast("double")
    val key = pow(uniformHash(salt, col(idCol)), lit(1.0) / w)
    val outCols =
      (col(idCol) +: strataCol.map(col).toSeq) ++
        Seq(col(weightCol), round(col("__key"), 6).as("draw_key"), col("draw_rank"))
    val base = documents
      .where(w.isNotNull && w > 0.0)
      .select((col(idCol) +: strataCol.map(col).toSeq :+ col(weightCol)): _*)
      .withColumn("__key", key)
    val ranked = strataCol match {
      case Some(sc) =>
        val win = Window.partitionBy(col(sc)).orderBy(col("__key").desc, col(idCol).asc)
        base.withColumn("draw_rank", row_number().over(win)).where(col("draw_rank") <= k)
      case None =>
        // TakeOrderedAndProject (no global sort); the rank window then
        // runs over k already-selected rows — a single trivial task
        val topK = base.orderBy(col("__key").desc, col(idCol).asc).limit(k)
        val win = Window.orderBy(col("__key").desc, col(idCol).asc)
        topK.withColumn("draw_rank", row_number().over(win))
    }
    ranked.select(outCols: _*)
  }

  /** Token-balanced shard assignment (the output-file layout step: N
    * training shards with near-equal token totals, so no reader strag-
    * gles): docs are globally ranked by token count DESC (doc_id
    * tiebreak) and dealt SERPENTINE — round r assigns positions left-to-
    * right, round r+1 right-to-left — the streaming form of LPT
    * scheduling; on a descending sequence the imbalance is bounded by a
    * single document, not by systematic drift (plain round-robin gives
    * shard 0 the largest doc of EVERY round).
    *
    * The global rank uses the repo's two-pass range-partition shape
    * ([[graft.ts.Sessionize.withSegmentIdGlobal]]): range-partition +
    * local sort, O(partitions) count summary to the driver, then a
    * rank-offset map per partition — no keyless window, no single-task
    * sort. Returns (doc_id, n_tokens, shard); the frame is backed by
    * the pass-1 cache (the range partitioner must not resample between
    * passes). */
  def shardAssign(
      documents: DataFrame,
      nShards: Int,
      numPartitions: Int = 0
  ): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.storage.StorageLevel
    val spark = documents.sparkSession
    val n =
      if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val base = documents.select(
      col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val docIdType = base.schema.fields(0).dataType
    val sorted = Bridge
      .toInternalRdd(
        base
          .repartitionByRange(n, col("n_tokens").desc, col("doc_id").asc)
          .sortWithinPartitions(col("n_tokens").desc, col("doc_id").asc))
      .mapPartitions(_.map(_.copy()), preservesPartitioning = true)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val counts = sorted
      .mapPartitionsWithIndex { (pid, it) =>
        var c = 0L; while (it.hasNext) { it.next(); c += 1 }
        Iterator.single(pid -> c)
      }
      .collect()
      .toMap
    val offsets = new Array[Long](n)
    var acc = 0L
    (0 until n).foreach { pid => offsets(pid) = acc; acc += counts.getOrElse(pid, 0L) }
    val out = sorted.mapPartitionsWithIndex { (pid, it) =>
      var r = offsets(pid)
      it.map { row =>
        val round = r / nShards
        val pos = (r % nShards).toInt
        val shard = if (round % 2 == 0L) pos else nShards - 1 - pos
        r += 1
        new GenericInternalRow(Array[Any](
          InternalRow.copyValue(row.get(0, docIdType)), row.getLong(1), shard)): InternalRow
      }
    }
    Bridge.internalCreateDataFrame(
      spark,
      out,
      org.apache.spark.sql.types.StructType(Seq(
        base.schema.fields(0),
        org.apache.spark.sql.types.StructField("n_tokens", org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("shard", org.apache.spark.sql.types.IntegerType, nullable = false)
      ))
    )
  }

  /** Per-source epoch replication (data echoing): repeat each source's
    * docs `factor` times — how a mixture actually realizes >1 epochs
    * over small high-quality sources (Wikipedia 3×, books 2×, crawl 1×)
    * inside one training pass. Replication is a generator (`explode` of
    * a literal range per row): no shuffle, no join, output partitioned
    * like the input; each copy carries its 0-based `epoch` so
    * downstream shuffling ([[deterministicShuffle]] salted with the
    * epoch) decorrelates copies. Sources absent from `factors` default
    * to 1 epoch; factor 0 drops the source. */
  def epochReplicate(
      documents: DataFrame,
      factors: Map[String, Int],
      sourceCol: String = "source"
  ): DataFrame = {
    require(factors.values.forall(_ >= 0), s"factors must be >= 0, got $factors")
    val f = coalesce(
      element_at(typedLit(factors), col(sourceCol)),
      lit(1))
    // Spark's sequence(0, -1) steps BACKWARD ([0, -1]) rather than being
    // empty — factor 0 must produce an empty array explicitly
    val epochs = when(f > 0, sequence(lit(0), f - 1)).otherwise(array().cast("array<int>"))
    documents.withColumn("epoch", explode(epochs))
  }

  /** Materialize the corpus as `nShards` token-balanced training shards
    * under `outDir` — the output-layout sink closing the curation loop:
    * `partitionBy("shard")` parquet, exactly ONE file per shard
    * directory (each shard hash-lands in one task; the partitioned
    * writer then splits by value), so a training job maps readers to
    * shards 1:1 and no reader straggles.
    *
    * Cost, stated honestly: [[shardAssign]]'s slim (doc_id, n_tokens)
    * two-pass rank, a corpus join back on doc_id, and the writer's
    * repartition — exact global balance costs one full-row exchange;
    * the cheap alternative (hash sharding, no balance) is a plain
    * `partitionBy(pmod(hash(doc_id), n))` write. A shard filter on
    * read-back partition-prunes (verified in MixtureSpec). */
  def writeShards(documents: DataFrame, outDir: String, nShards: Int): Unit = {
    val assign = shardAssign(documents, nShards).select(col("doc_id"), col("shard"))
    documents
      .join(assign, "doc_id")
      .repartition(nShards, col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
  }

  /** Greedy sequence packing (the standard pretraining concat-and-chunk):
    * documents are concatenated per group in `orderCol` order and the
    * token stream is cut into `budget`-token sequences; each doc reports
    * the sequence it STARTS in and its offset there. Window per group —
    * embarrassingly parallel across groups (the 100 TB axis: source /
    * shard); a single giant group degrades to one sort, for which the
    * two-pass running-sum shape (W1 / q_running_sum machinery) is the
    * escape hatch.
    *
    * Output is the NARROW assignment (`orderCol`, groupCols, `n_tokens`,
    * `start_off`, `seq_id`, `seq_off`) on purpose: the window's exchange
    * sorts its whole input, and a measured A/B at 100× showed carrying
    * the text payload through that sort costs 2× the entire chain
    * (8.3 s vs 4.1 s in q_curate) — more than even re-executing the
    * upstream plan for a join-back. Callers who want payloads beside
    * the assignment should join ONCE at write time (a hash exchange,
    * not a sort). */
  def packSequences(
      documents: DataFrame,
      budget: Int,
      groupCols: Seq[String],
      orderCol: String = "doc_id"
  ): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    documents
      .select(
        (col(orderCol) +: groupCols.map(col) :+
          size(split(col("text"), " ")).cast("long").as("n_tokens")): _*
      )
      .withColumn("start_off", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("seq_id", expr(s"start_off div $budget"))
      .withColumn("seq_off", col("start_off") % budget)
  }

  /** Deterministic train/val/test assignment: the SAME uniform draw as
    * [[sample]] against cumulative fraction thresholds — stateless, no
    * shuffle, retry/repartition-stable, and a row keeps its split
    * forever as the corpus grows (the property random splits lose).
    * Cumulative bounds are computed with BigDecimal so clean inputs
    * (0.8/0.1/0.1) give the clean literals the SQL oracle spells.
    * Appends a `split` column; fractions must sum to 1. */
  def splitAssign(
      documents: DataFrame,
      fractions: Seq[(String, Double)],
      salt: String,
      idCol: String = "doc_id"
  ): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 >= 0.0), s"bad fractions $fractions")
    val cums = fractions
      .scanLeft(BigDecimal(0)) { case (acc, (_, f)) => acc + BigDecimal(f) }
      .tail
    require((cums.last - BigDecimal(1)).abs < BigDecimal("1e-9"),
      s"fractions must sum to 1, got ${cums.last}")
    val u = uniformHash(salt, col(idCol))
    // last label is the <= 1 catch-all: u < 1 always, so every row lands
    val chain = fractions.init.zip(cums.init).foldLeft(Option.empty[Column]) {
      case (None, ((label, _), c)) => Some(when(u < lit(c.toDouble), lit(label)))
      case (Some(w), ((label, _), c)) => Some(w.when(u < lit(c.toDouble), lit(label)))
    }
    documents.withColumn(
      "split",
      chain.fold(lit(fractions.last._1))(_.otherwise(lit(fractions.last._1))))
  }

  /** Split-leakage check: groups (entities, domains, near-dup
    * clusters) whose members landed in MORE THAN ONE split — the
    * evaluation-integrity bug a row-wise split silently commits (the
    * correct split keys on the GROUP; see [[splitAssign]] with the
    * group id as `idCol`). Returns one row per leaking group:
    * `n_splits`, total `n_rows`, and the member count in its dominant
    * split (`n_majority` — what a repair pass would keep). Empty
    * result ⇒ the split is group-clean.
    *
    * Two map-side-combinable rollups, bounded by groups × splits —
    * never a self-join over rows. */
  def splitLeakCheck(df: DataFrame, groupCol: String, splitCol: String): DataFrame = {
    val per = df
      .select(col(groupCol).as("group"), col(splitCol).as("__s"))
      .where(col("group").isNotNull && col("__s").isNotNull)
      .groupBy("group", "__s")
      .agg(count(lit(1)).as("__n"))
    per
      .groupBy("group")
      .agg(
        count(lit(1)).as("n_splits"),
        sum(col("__n")).as("n_rows"),
        max(col("__n")).as("n_majority"))
      .where(col("n_splits") > 1)
  }

  /** Proportional-fair budget allocation (water-filling): given one
    * row per key with its demand (`sizeCol` — URLs a host wants
    * crawled, tokens a source offers), split a shared `budget` so no
    * key is starved by the heavy tail: every key receives
    * `min(size, τ)` where τ is the LARGEST integer level with
    * `Σ min(sizeᵢ, τ) ≤ budget` — small keys get everything they
    * asked for, big keys are capped at the common level. The
    * `< #capped keys` floor remainder is reported, not silently
    * assigned (deterministic output; callers wanting it spent can
    * bump τ's beneficiaries by any rule they like).
    *
    * Shape: ONE map-side-combinable size-histogram rollup, collected
    * driver-side (bounded by DISTINCT demand values, not keys — a
    * billion hosts share far fewer distinct sizes; a hard cap fails
    * loud rather than OOMing the driver), τ solved exactly in integer
    * arithmetic on the histogram, allocation a stateless projection.
    */
  def waterFill(
      sizes: DataFrame,
      keyCol: String,
      sizeCol: String,
      budget: Long,
      maxDistinctSizes: Int = 1000000
  ): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val hist = sizes
      .where(col(sizeCol).isNotNull && col(sizeCol) > 0)
      .groupBy(col(sizeCol).cast("long").as("__v"))
      .agg(count(lit(1)).as("__c"))
      .orderBy("__v")
      .limit(maxDistinctSizes + 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    require(hist.length <= maxDistinctSizes,
      s"waterFill: more than $maxDistinctSizes distinct demand values — " +
        "bucket the demands first or raise maxDistinctSizes")
    // exact integer τ: walk the sorted histogram; below each segment
    // boundary f(t) = fundedMass + t·keysAbove is linear in t
    val totalKeys = hist.map(_._2).sum
    var fundedMass = 0L // Σ size over keys with size <= current level
    var keysBelow = 0L
    var tau = 0L
    var done = false
    for ((v, c) <- hist if !done) {
      val above = totalKeys - keysBelow // keys with size >= v
      // candidate: cap everyone remaining at some t < v
      val capped = if (above > 0) (budget - fundedMass) / above else Long.MaxValue
      if (capped < v) { tau = math.max(0L, capped); done = true }
      else { fundedMass += v * c; keysBelow += c; tau = v }
    }
    if (!done && totalKeys > 0 && fundedMass <= budget) {
      // whole demand fits: everyone fully funded
      tau = hist.last._1
    }
    val t = lit(tau)
    sizes.withColumn(
      "alloc",
      when(col(sizeCol).isNull || col(sizeCol) <= 0, lit(0L))
        .otherwise(least(col(sizeCol).cast("long"), t)))
  }

  /** Deterministic global training-order shuffle: a dense 0-based rank
    * in `(uniformHash(salt, id), id)` order — the same reproducible
    * permutation on any partitioning, parallelism, or retry. NOT a
    * global single-partition window: the scalable two-pass shape
    * (O(buckets) driver count summary → bucket offset + local rank, the
    * recipe [[graft.ts.Sessionize.withSegmentIdGlobal]] documents), with
    * the bucket a PURE FUNCTION of the row — `floor(hash · n)`, monotone
    * in the hash, so bucket-local ranks plus bucket offsets ARE the
    * global rank. Hash uniformity keeps the buckets balanced. Pure
    * bucketing is what makes the two passes agree with no persist (the
    * earlier range-partition form had to pin the corpus in cache because
    * its sampled boundaries differ across jobs — a session-lifetime
    * cache of the full dataset, untenable at the 100 TB scale this op
    * exists for): both passes recompute the same bucket on any retry,
    * at the price of scanning the source twice. Output: input columns +
    * `shuffle_rank`. */
  def deterministicShuffle(
      documents: DataFrame,
      salt: String,
      idCol: String = "doc_id"
  ): DataFrame = {
    val spark = documents.sparkSession
    val n = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val u = uniformHash(salt, col(idCol))
    val bucket = least(floor(u * lit(n)).cast("int"), lit(n - 1))
    val withB = documents.withColumn("__h", u).withColumn("__b", bucket)
    val counts = withB
      .groupBy(col("__b")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until n).scanLeft(0L)((acc, p) => acc + counts.getOrElse(p, 0L))
    val offsetMap = map(
      (0 until n).flatMap(p => Seq(lit(p), lit(offsets(p)))): _*)
    val w = Window.partitionBy(col("__b")).orderBy(col("__h"), col(idCol))
    withB
      .withColumn(
        "shuffle_rank",
        element_at(offsetMap, col("__b")) + row_number().over(w) - 1)
      .drop("__h", "__b")
  }

  /** Curriculum / annealing order — the phase-major training layout
    * modern pretraining runs use (a broad "main" phase, then a
    * high-quality "anneal"/decay phase re-sampling gated data; a doc
    * may appear in several phases). Docs are ranked phase-major, and
    * WITHIN a phase by the same deterministic [[uniformHash]] draw as
    * [[deterministicShuffle]] (phase name folded into the hash, so each
    * phase is an independent reshuffle; salt re-rolls everything;
    * retry/repartition-stable, no `rand()`).
    *
    * Scale shape: the global rank is the [[deterministicShuffle]]
    * two-pass recipe over the phase union with a (phase, hash-bucket)
    * composite key — one bounded count collect (phases × buckets) plus
    * per-bucket windows; no single-task global sort. Output:
    * (phase, doc_id, curriculum_rank) with ranks 0-based and contiguous
    * across phases in declaration order. */
  def curriculumOrder(
      phases: Seq[(String, DataFrame)],
      salt: String,
      idCol: String = "doc_id"
  ): DataFrame = {
    require(phases.nonEmpty, "need at least one phase")
    require(phases.map(_._1).distinct.size == phases.size,
      s"phase names must be distinct, got ${phases.map(_._1)}")
    val spark = phases.head._2.sparkSession
    val n = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val tagged = phases.zipWithIndex.map { case ((name, df), i) =>
      df.select(lit(name).as("phase"), lit(i).as("__p"), col(idCol))
    }.reduce(_ unionByName _)
    val u = uniformHash(salt, concat(col("phase"), lit(":"), col(idCol).cast("string")))
    val bucket = least(floor(u * lit(n)).cast("int"), lit(n - 1))
    // Slim (phase, id, hash, bucket) frame CACHED between the counts
    // pass and the final rank pass — without it every phase INPUT
    // subtree (e.g. a quality-gate pipeline feeding the anneal phase)
    // re-executes for each pass (the shardAssign pass-1-cache
    // precedent; measured as most of q_curriculum's first bench row).
    // The cache must outlive this call (the returned lazy plan reads
    // it), so it is registered with [[graft.util.CacheRegistry]] —
    // long-lived sessions call `CacheRegistry.releaseAll()` between
    // pipelines; dropping it early only costs recompute, not
    // correctness (__h/__cb are pure functions of the row).
    val withB = graft.util.CacheRegistry.track(
      tagged
        .withColumn("__h", u)
        .withColumn("__cb", col("__p") * n + bucket)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val counts = withB
      .groupBy(col("__cb")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val keys = (0 until phases.size * n)
    val offsets = keys.scanLeft(0L)((acc, c) => acc + counts.getOrElse(c, 0L))
    val offsetMap = map(keys.flatMap(c => Seq(lit(c), lit(offsets(c)))): _*)
    val w = Window.partitionBy(col("__cb")).orderBy(col("__h"), col(idCol))
    withB
      .withColumn(
        "curriculum_rank",
        element_at(offsetMap, col("__cb")) + row_number().over(w) - 1)
      .select(col("phase"), col(idCol), col("curriculum_rank"))
  }

  /** Per-source TOKEN-budget sampling: cap every source's contribution
    * at `budgetTokens` tokens (how mixture targets are actually stated
    * for pretraining corpora — token counts, not doc counts or keep
    * fractions, and over-represented sources get truncated while small
    * ones survive whole). Docs are taken in the deterministic
    * [[uniformHash]] order (an unbiased per-source sample, the same
    * draw the other mixture ops use — retry/repartition-stable, salt
    * re-rolls) and a doc is kept iff the tokens BEFORE it in that order
    * are under the budget, so the kept set is a pure prefix: at least
    * one doc per non-empty source, the last one may straddle the line.
    *
    * Two physical plans, auto-selected, IDENTICAL output (spec-pinned):
    *  - **windowed** (the default): one window per source (single
    *    shuffle on the source key), embarrassingly parallel across
    *    sources — but every doc of a source lands in ONE task, and a
    *    pretraining corpus routinely has one dominant source (a web
    *    crawl at 80 %+), which turns that task into the job.
    *  - **two-pass** (chosen when the largest source exceeds
    *    `giantSourceRows`): the [[deterministicShuffle]] recipe applied
    *    per source — the hash-derived order key `u` is cut into
    *    `spark.sql.shuffle.partitions` monotone buckets (a PURE
    *    function of the row, so both passes agree on any retry with
    *    nothing persisted); pass 1 aggregates per-(source, bucket)
    *    token sums (map-side combinable, driver-tiny collect), pass 2
    *    windows WITHIN (source, bucket) and adds the broadcast bucket
    *    offset. The dominant source now sorts as ~n_partitions
    *    independent tasks instead of one. Prefix sums are exact long
    *    arithmetic, so the two forms agree bit-for-bit.
    *
    * The two plans COMPOSE per source: only sources whose row count
    * exceeds `giantSourceRows` route through the two-pass form; every
    * other source keeps the windowed plan. The split matters at both
    * ends — a domain-keyed mixture can have 10⁶+ sources (whose
    * per-(source, bucket) sums would bloat the two-pass driver collect
    * for no benefit) AND one crawl source with 10⁸⁺ docs (which the
    * windowed plan would single-task-sort); the hybrid bounds the
    * collect by O(giant sources × buckets) while each source gets the
    * plan its size needs. Sources partition the rows, and both plans
    * are parity-proven per source, so the union is exactly the
    * windowed answer.
    *
    * The auto-gate costs one map-side-combinable count aggregate whose
    * collect is bounded by the number of GIANT sources; pass
    * `giantSourceRows = Long.MaxValue` to skip it (always windowed) or
    * `0` to force the two-pass form everywhere. Output: (doc_id,
    * source, n_tokens) of kept docs. */
  def tokenBudgetPerSource(
      documents: DataFrame,
      budgetTokens: Long,
      salt: String,
      sourceCol: String = "source",
      giantSourceRows: Long = 50L * 1000 * 1000
  ): DataFrame = {
    require(budgetTokens > 0, s"budget must be positive, got $budgetTokens")
    if (giantSourceRows == Long.MaxValue)
      return tokenBudgetWindowed(documents, budgetTokens, salt, sourceCol)
    val giants = documents
      .groupBy(col(sourceCol)).count()
      .where(col("count") > giantSourceRows)
      .select(sourceCol)
      .collect()
      .map(_.get(0))
    if (giants.isEmpty)
      tokenBudgetWindowed(documents, budgetTokens, salt, sourceCol)
    else {
      val hasNullGiant = giants.contains(null)
      val nonNull = giants.filter(_ != null)
      val inSet =
        if (nonNull.isEmpty) lit(false)
        else col(sourceCol).isin(nonNull.toIndexedSeq: _*)
      val isGiant =
        when(col(sourceCol).isNull, lit(hasNullGiant))
          .otherwise(coalesce(inSet, lit(false)))
      val small = documents.where(!isGiant)
      val giant = documents.where(isGiant)
      tokenBudgetWindowed(small, budgetTokens, salt, sourceCol)
        .unionByName(tokenBudgetTwoPass(giant, budgetTokens, salt, sourceCol))
    }
  }

  /** The one-window-per-source plan (see [[tokenBudgetPerSource]]). */
  private[graft] def tokenBudgetWindowed(
      documents: DataFrame,
      budgetTokens: Long,
      salt: String,
      sourceCol: String = "source"
  ): DataFrame = {
    val u = uniformHash(salt, col("doc_id"))
    val w = Window
      .partitionBy(col(sourceCol))
      .orderBy(col("__u"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    documents
      .select(
        col("doc_id"),
        col(sourceCol),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        u.as("__u"))
      .withColumn("__before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .where(col("__before") < budgetTokens)
      .select(col("doc_id"), col(sourceCol), col("n_tokens"))
  }

  /** The giant-source plan: per-(source, hash-bucket) prefix sums +
    * broadcast bucket offsets (see [[tokenBudgetPerSource]]). */
  private[graft] def tokenBudgetTwoPass(
      documents: DataFrame,
      budgetTokens: Long,
      salt: String,
      sourceCol: String = "source"
  ): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val n = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val u = uniformHash(salt, col("doc_id"))
    // monotone in u ⇒ bucket-local (u, doc_id) order + bucket offsets
    // reproduce the source-global order exactly
    val bucket = least(floor(col("__u") * lit(n)).cast("int"), lit(n - 1))
    val base = documents
      .select(
        col("doc_id"),
        col(sourceCol),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        u.as("__u"))
      .withColumn("__b", bucket)
    // pass 1: per-(source, bucket) token sums — map-side combinable,
    // ≤ nSources·n rows on the driver
    // source values are handled as opaque Any (the windowed form is
    // type-generic; so is this one), and a NULL source is one more
    // group — the windowed partitionBy treats it that way too
    val grouped = base
      .groupBy(col(sourceCol), col("__b"))
      .agg(sum(col("n_tokens")).as("__t"))
    // driver-safety cap: under the hybrid gate nSources is the handful
    // of giant sources, but a forced call (giantSourceRows = 0) on a
    // high-cardinality source column would make this collect O(nSources
    // × buckets) with no bound. ONE limit-probed collect enforces the
    // cap — a count-then-collect spelling would execute the corpus
    // aggregation twice (the repeated-subtree rule; see
    // Text.percentileGate).
    val groupRows = grouped.limit(MaxTwoPassGroups.toInt + 1).collect()
    require(
      groupRows.length <= MaxTwoPassGroups,
      s"tokenBudgetTwoPass: over ${MaxTwoPassGroups} (source, bucket) groups " +
        "exceed the driver-collect cap — the source column is too " +
        "high-cardinality for the two-pass plan; use tokenBudgetPerSource's " +
        "hybrid gate (windowed plan) for many-small-source layouts")
    val sums = groupRows
      .map(r => (r.get(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    val offsets = sums.keysIterator.map(_._1).toSeq.distinct.flatMap { src =>
      (0 until n).scanLeft((src, 0, 0L)) { case ((_, _, acc), b) =>
        (src, b + 1, acc + sums.getOrElse((src, b), 0L))
      }.init
    }
    val offSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(
        sourceCol + "__o", base.schema(sourceCol).dataType),
      org.apache.spark.sql.types.StructField(
        "__b__o", org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField(
        "__off", org.apache.spark.sql.types.LongType, nullable = false)))
    val offDf = broadcast(
      spark.createDataFrame(
        java.util.Arrays.asList(offsets.map { case (s, b, o) =>
          org.apache.spark.sql.Row(s, b, o)
        }: _*),
        offSchema))
    // pass 2: window WITHIN (source, bucket) — the dominant source is
    // now ~n independent sorts — then add the bucket's global offset
    val w = Window
      .partitionBy(col(sourceCol), col("__b"))
      .orderBy(col("__u"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("__local", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .join(
        offDf,
        col(sourceCol) <=> col(sourceCol + "__o") && col("__b") === col("__b__o"))
      .where(col("__local") + col("__off") < budgetTokens)
      .select(col("doc_id"), col(sourceCol), col("n_tokens"))
  }
}
