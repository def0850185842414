package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** One-pass data-quality profiling — the validation gate a training
  * pipeline runs on every ingest batch before the data is allowed to
  * flow (the Deequ/TFDV job): per-column completeness, distinct
  * cardinality, range, and mean, computed for ALL columns in ONE
  * map-side-combinable aggregate over the table. At 100 TB this is
  * the difference between one scan and |columns| scans; nothing here
  * shuffles more than the single combined aggregation row.
  *
  * Distinct counts ride the [[graft.functions.KMinValues]] sketch over
  * the repo's deterministic 60-bit md5 hash — O(k) state per column,
  * EXACT below k distinct values, and (unlike HLL) replayable by an
  * independent engine, so the whole profile is hash-checkable.
  *
  * Determinism contract: the caller projects columns to types with an
  * engine-stable string form before profiling (decimals, integers,
  * dates, strings — NOT raw doubles, whose string rendering differs
  * across engines in the exponent-notation corners); numeric stats are
  * exact DECIMAL sums divided once at the end.
  */
object Profile {

  /** Profile `numericCols` (stats over the value) and `stringCols`
    * (stats over `length(value)`; distinct over the value itself) in
    * one aggregate pass.
    *
    * @return one row per column:
    *         (column, n_rows, n_null, n_distinct, min, max, mean) —
    *         n_distinct is the KMV estimate (exact below k), min/max/
    *         mean as doubles (mean = exact decimal sum / count,
    *         rounded 6dp, null for an all-null column)
    */
  def profile(
      df: DataFrame,
      numericCols: Seq[String],
      stringCols: Seq[String] = Nil,
      k: Int = 64
  ): DataFrame = {
    val cols = checkCols(numericCols, stringCols, k)
    val agg = hashCols(df, cols).agg(count(lit(1)).as("__n"), aggExprs(cols, k): _*)
    agg.select(explode(rowStructs(cols, k)).as("__p")).select(col("__p.*"))
  }

  /** Pre-projects each profiled column's KMV item hash as
    * `__<name>__h`, so the hash runs in the whole-stage-codegen'd
    * projection and the imperative KMV aggregate's child is a bare
    * column reference (TypedImperativeAggregate evaluates its child
    * interpreted, per row). Shared by the batch pass and the streaming
    * twin so the hash chain stays identical. */
  private[graft] def hashCols(df: DataFrame, cols: Seq[(String, Boolean)]): DataFrame =
    cols.foldLeft(df) { case (d, (name, _)) =>
      d.withColumn(s"__${name}__h", Cardinality.itemHash(col(name).cast("string")))
    }

  private[graft] def checkCols(
      numericCols: Seq[String],
      stringCols: Seq[String],
      k: Int
  ): Seq[(String, Boolean)] = {
    require(numericCols.nonEmpty || stringCols.nonEmpty, "no columns to profile")
    require(k >= 2, s"k must be >= 2 for the (k-1) estimator, got $k")
    numericCols.map((_, false)) ++ stringCols.map((_, true))
  }

  /** Snapshot-drift gate: [[profile]] both frames, join per column,
    * and flag columns whose null rate moved more than `nullRateTol`
    * (absolute) or whose mean moved more than `meanRelTol` (relative
    * to the before-mean) — the batch-over-batch validation the
    * profile exists to feed ("yesterday's ingest vs today's").
    * All deltas derive from the profiles' ALREADY-ROUNDED fields, so
    * the gate is exactly as engine-replayable as the profile itself.
    * A null mean on either side never flags mean drift (the null-rate
    * arm is the signal for a column going dark).
    *
    * @return (column, n_rows_a, n_rows_b, null_rate_a, null_rate_b,
    *         mean_a, mean_b, mean_rel_delta, drift_flag)
    */
  def drift(
      before: DataFrame,
      after: DataFrame,
      numericCols: Seq[String],
      stringCols: Seq[String] = Nil,
      k: Int = 64,
      nullRateTol: Double = 0.01,
      meanRelTol: Double = 0.05
  ): DataFrame = {
    require(nullRateTol >= 0 && meanRelTol >= 0, "tolerances must be >= 0")
    def side(df: DataFrame, suf: String): DataFrame =
      profile(df, numericCols, stringCols, k).select(
        col("column"),
        col("n_rows").as(s"n_rows_$suf"),
        round(col("n_null").cast("double") /
          greatest(col("n_rows"), lit(1L)).cast("double"), 6).as(s"null_rate_$suf"),
        col("mean").as(s"mean_$suf"))
    val relDelta = when(
      col("mean_a").isNotNull && col("mean_b").isNotNull && col("mean_a") =!= 0.0,
      round(abs(col("mean_b") - col("mean_a")) / abs(col("mean_a")), 6))
    side(before, "a")
      .join(side(after, "b"), Seq("column"))
      .withColumn("mean_rel_delta", relDelta)
      .withColumn(
        "drift_flag",
        (abs(col("null_rate_b") - col("null_rate_a")) > nullRateTol ||
          coalesce(col("mean_rel_delta") > meanRelTol, lit(false))).cast("int"))
      .select(
        "column", "n_rows_a", "n_rows_b", "null_rate_a", "null_rate_b",
        "mean_a", "mean_b", "mean_rel_delta", "drift_flag")
  }

  /** The per-column aggregate battery — shared verbatim by the batch
    * pass and the windowed streaming twin
    * ([[graft.streaming.Streaming.profileStream]]), so both walk the
    * identical count/KMV/min/max/decimal-sum chain. */
  private[graft] def aggExprs(cols: Seq[(String, Boolean)], k: Int): Seq[Column] =
    cols.flatMap { case (name, isString) =>
      val v = if (isString) length(col(name)) else col(name)
      Seq(
        count(col(name)).as(s"__${name}__nn"),
        graft.functions.KMinValues
          .kMinValues(col(s"__${name}__h"), k)
          .as(s"__${name}__kmv"),
        min(v.cast("double")).as(s"__${name}__mn"),
        max(v.cast("double")).as(s"__${name}__mx"),
        sum(v.cast("decimal(38,6)")).as(s"__${name}__sm"))
    }

  private def intDiv(a: Column, b: Column): Column =
    Bridge.column(IntegralDivide(Bridge.expression(a), Bridge.expression(b)))

  /** Histogram quantiles for many columns at once — the profile's
    * percentile arm, WITHOUT a per-column sort: pass 1 is one tiny
    * min/max aggregate; pass 2 buckets every value into an equi-width
    * histogram and row-explodes to (column, bucket), so the exchange
    * carries at most `columns × buckets` combined rows no matter the
    * corpus size; the quantile is then the LOWER EDGE of the first
    * bucket whose cumulative count reaches ⌈p·n⌉. Error is bounded by
    * one bucket width ((max−min)/buckets) by construction —
    * `approx_percentile` is tighter per byte, but this estimator is
    * deterministic and exactly replayable by an independent engine
    * (floor/width arithmetic on identical doubles), which the profile
    * family's oracle contract requires.
    *
    * @return (column, prob, q_est) per column × prob; null q_est for
    *         an all-null column
    */
  def histQuantiles(
      df: DataFrame,
      numericCols: Seq[String],
      probs: Seq[Double],
      buckets: Int = 1024
  ): DataFrame = {
    require(numericCols.nonEmpty, "no columns")
    require(probs.nonEmpty && probs.forall(p => p > 0 && p <= 1), s"bad probs $probs")
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val spark = df.sparkSession
    val mm = df.agg(
      count(lit(1)),
      numericCols.flatMap(c => Seq(
        min(col(c).cast("double")).as(s"mn_$c"),
        max(col(c).cast("double")).as(s"mx_$c"),
        count(col(c)).as(s"nn_$c"))): _*).head()
    val bounds = numericCols.zipWithIndex.map { case (c, i) =>
      c -> ((mm.get(1 + 3 * i), mm.get(2 + 3 * i), mm.getLong(3 + 3 * i)))
    }.toMap
    import org.apache.spark.sql.expressions.Window
    val perCol = numericCols.map { c =>
      val (mnA, mxA, nn) = bounds(c)
      if (nn == 0L) lit(null).cast("int").as(s"__b_$c")
      else {
        val mn = mnA.asInstanceOf[Double]; val mx = mxA.asInstanceOf[Double]
        val width = if (mx > mn) (mx - mn) / buckets else 1.0
        least(
          floor((col(c).cast("double") - lit(mn)) / lit(width)).cast("int"),
          lit(buckets - 1)).as(s"__b_$c")
      }
    }
    val counts = df.select(perCol: _*)
      .select(explode(array(numericCols.map(c =>
        struct(lit(c).as("column"), col(s"__b_$c").as("bucket"))): _*)).as("cb"))
      .where(col("cb.bucket").isNotNull)
      .groupBy(col("cb.column").as("column"), col("cb.bucket").as("bucket"))
      .agg(count(lit(1)).as("n"))
    val wCum = Window.partitionBy("column").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts.withColumn("cum", sum(col("n")).over(wCum))
    import spark.implicits._
    // tiny literal (column × prob) target frame — built locally, no
    // cross join in the plan
    val targets = (for {
      p <- probs
      c <- numericCols
    } yield (c, p, bounds(c)._3)).toDF("column", "prob", "nn")
    // per (column, prob): first bucket whose cum >= ceil(p * nn)
    val picked = targets
      .join(cum, Seq("column"), "left")
      .where(col("cum") >= ceil(col("prob") * col("nn")))
      .groupBy("column", "prob")
      .agg(min(col("bucket")).as("qb"), max(col("nn")).as("__nn"))
    picked.select(
      col("column"), col("prob"),
      numericCols.foldLeft(lit(null).cast("double")) { (acc, c) =>
        val (mnA, mxA, nn) = bounds(c)
        if (nn == 0L) acc
        else {
          val mn = mnA.asInstanceOf[Double]; val mx = mxA.asInstanceOf[Double]
          val width = if (mx > mn) (mx - mn) / buckets else 1.0
          when(col("column") === c, lit(mn) + col("qb").cast("double") * lit(width))
            .otherwise(acc)
        }
      }.as("q_est"))
  }

  /** The aggregate row → per-column report structs (the [[aggExprs]]
    * counterpart; explode the result to get the long-format rows).
    *
    * The 6dp mean is INTEGER-EXACT (the [[Text.readability]] recipe):
    * a double `round(sum/n, 6)` lands on rounding-boundary quotients
    * often enough to split engines by one ulp (it did, at sf0.1), so
    * the micro-scaled mean is computed by sign-aware half-up integral
    * division — `(2·U + n) div (2·n)` over U = sum·10^6 — and only
    * THEN widened to double, where both engines cast the same integer
    * and divide by the same literal. */
  private[graft] def rowStructs(cols: Seq[(String, Boolean)], k: Int): Column =
    array(cols.map { case (name, _) =>
      val (_, est) = Cardinality.estimate(col(s"__${name}__kmv"), k)
      val nn = col(s"__${name}__nn")
      val u = (col(s"__${name}__sm") * lit(1000000)).cast("decimal(38,0)")
      val meanMicro = when(u >= 0, intDiv(u * 2 + nn, nn * 2))
        .otherwise(-intDiv((-u) * 2 + nn, nn * 2))
      struct(
        lit(name).as("column"),
        col("__n").as("n_rows"),
        (col("__n") - nn).as("n_null"),
        est.as("n_distinct"),
        col(s"__${name}__mn").as("min"),
        col(s"__${name}__mx").as("max"),
        when(nn > 0, meanMicro.cast("double") / lit(1000000.0)).as("mean"))
    }: _*)

  /** Referential-integrity audit: rows of `child` whose `childKey`
    * has no match in `parent.parentKey` — the orphan check every
    * star-schema ingest gate runs (fact rows pointing at deleted or
    * never-loaded dimension rows silently vanish from inner joins
    * downstream; count them HERE, loudly, instead).
    *
    * ONE left equi-join of the child's key column against the
    * parent's DISTINCT keys carrying a hit marker (distinct keeps the
    * join multiplicity 1; Spark broadcasts it when small, shuffles at
    * dimension scale — never a nested loop), then ONE singleton
    * rollup classifying each row as matched / orphan / NULL-key —
    * no second pass, no singleton-to-singleton join (whose literal
    * keys constant-fold into the banned BNLJ). NULL child keys are
    * counted separately, not as orphans (a NULL FK is a modeling
    * choice; a dangling one is corruption).
    *
    * Returns ONE row:
    * `(n_child, n_null_keys, n_orphan_rows, n_orphan_keys,
    *   orphan_rate)` — rate = orphan rows / non-null-key rows, 6dp
    * half-up of the exact rational (0 when the child has no non-null
    * keys).
    */
  def fkOrphans(
      child: DataFrame,
      childKey: String,
      parent: DataFrame,
      parentKey: String
  ): DataFrame = {
    val pk = parent.select(col(parentKey).as("__fk"))
      .where(col("__fk").isNotNull)
      .distinct()
      .withColumn("__hit", lit(1))
    val orphan = col("__fk").isNotNull && col("__hit").isNull
    val rateMicro = {
      val u = col("__orows").cast("decimal(38,0)") * lit(1000000L)
      intDiv(u * 2 + col("__nn"), col("__nn") * 2)
    }
    child.select(col(childKey).as("__fk"))
      .join(pk, Seq("__fk"), "left")
      .groupBy()
      .agg(
        count(lit(1)).as("__n"),
        count(col("__fk")).as("__nn"),
        coalesce(sum(orphan.cast("long")), lit(0L)).as("__orows"),
        count_distinct(when(orphan, col("__fk"))).as("__okeys"))
      .select(
        col("__n").as("n_child"),
        (col("__n") - col("__nn")).as("n_null_keys"),
        col("__orows").as("n_orphan_rows"),
        col("__okeys").as("n_orphan_keys"),
        when(col("__nn") > 0, rateMicro.cast("double") / lit(1000000.0))
          .otherwise(lit(0.0)).as("orphan_rate"))
  }

  /** Embedding-table quality audit — the ingest gate for a vector
    * corpus before it feeds ANN / dedup / clustering: NULL or
    * wrong-width vectors, non-finite components, zero vectors (cosine
    * against them is undefined), and the L2-norm profile. One
    * map-side-combinable pass.
    *
    * Determinism: each vector's squared norm is the `aggregate` HOF
    * fold in INDEX order (float components widen to double exactly,
    * so both engines walk the same double chain), the norm one
    * correctly-rounded sqrt + 6dp round; the corpus mean norm routes
    * those 6dp values through micro-integers (an exact decimal sum —
    * order-independent). NULL vectors are counted, not scored.
    *
    * Returns ONE row: `(n, n_null, n_wrong_dim, n_nonfinite, n_zero,
    * norm_min, norm_max, norm_mean)` — norm stats over clean vectors
    * only (NULL when none).
    */
  def embeddingAudit(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val v = col(vecCol)
    val sq = aggregate(v, lit(0.0d), (acc, x) => acc + x.cast("double") * x.cast("double"))
    // x.isNull: a NULL component is non-finite (without it, exists()
    // returns NULL and the row would land in NO bucket — neither clean
    // nor n_nonfinite — so the counts wouldn't sum to n; the DuckDB
    // oracle mirrors the same classification)
    val hasNonfinite = exists(v,
      x => x.isNull || isnan(x) || abs(x.cast("double")) > lit(Double.MaxValue))
    val clean = v.isNotNull && size(v) === dim && !hasNonfinite
    val norm = round(sqrt(sq), 6)
    // the 6dp-rounded double is within an ulp of its micro integer —
    // round again after scaling (a bare cast would truncate x.999…)
    val normMicro = when(clean, round(norm * 1000000L, 0).cast("long"))
    df
      .groupBy()
      .agg(
        count(lit(1)).as("n"),
        coalesce(sum(v.isNull.cast("long")), lit(0L)).as("n_null"),
        coalesce(sum((v.isNotNull && size(v) =!= dim).cast("long")), lit(0L))
          .as("n_wrong_dim"),
        coalesce(sum((v.isNotNull && hasNonfinite).cast("long")), lit(0L))
          .as("n_nonfinite"),
        coalesce(sum((clean && sq === 0.0d).cast("long")), lit(0L)).as("n_zero"),
        min(when(clean, norm)).as("norm_min"),
        max(when(clean, norm)).as("norm_max"),
        sum(normMicro).as("__nsum"),
        coalesce(sum(clean.cast("long")), lit(0L)).as("__nclean"))
      .select(
        col("n"), col("n_null"), col("n_wrong_dim"), col("n_nonfinite"), col("n_zero"),
        col("norm_min"), col("norm_max"),
        when(col("__nclean") > 0,
          (when(col("__nsum") >= 0,
            intDiv(col("__nsum") * 2 + col("__nclean"), col("__nclean") * 2))
            .otherwise(lit(0L)))
            .cast("double") / lit(1000000.0)).as("norm_mean"))
  }
}
