package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel conversion and cohort retention — the two event-
  * analytics rollups every product/events warehouse runs, and (in a
  * training-data pipeline) the acceptance analytics over ingest events
  * (fetched → parsed → kept, per crawl shard). The reference engine has
  * no event surface; these extend the events-table family
  * (SURVEY §2 additions) alongside [[Anomaly]] and sessionization.
  *
  * Both operators are ONE exchange on the entity key: the funnel's
  * chained "earliest step k after step k−1" scan is k window passes
  * over the SAME user partitioning (Catalyst plans one Exchange and
  * reuses it — the [[Anomaly.cusumFlags]] shape), and the per-user
  * rollup that follows is partitioning-compatible, so no second
  * shuffle. The final step-count frame is O(steps) rows.
  *
  * Funnel semantics (the deterministic "anchor at first entry" form):
  * t₁ = the user's earliest step-1 event; tₖ = the earliest step-k
  * event STRICTLY after tₖ₋₁ and within `maxSpan` of t₁. A user
  * reaches step k iff tₖ exists. Greedy-earliest is the standard
  * warehouse funnel (not the NP-ish "best anchor" variant): it is
  * order-deterministic and each step needs only the previous step's
  * timestamp, which is what makes the closed form window-expressible.
  */
object Funnel {

  /** Per-step funnel rollup: (step_idx 1-based, step_name, n_users,
    * conv_rate = n_users(step)/n_users(step 1) rounded 4dp; 0.0 when
    * nobody enters). `tsCol` must be an integral epoch column (µs);
    * `maxSpanUs` bounds tₖ − t₁ for every k ≥ 2. */
  def conversion(
      events: DataFrame,
      tsCol: String,
      userCol: String,
      typeCol: String,
      steps: Seq[String],
      maxSpanUs: Long
  ): DataFrame = {
    require(steps.size >= 2, s"a funnel needs >= 2 steps, got ${steps.size}")
    require(steps.distinct.size == steps.size, s"duplicate step names: $steps")
    require(maxSpanUs > 0, s"maxSpanUs must be positive, got $maxSpanUs")
    val w = Window.partitionBy(col(userCol))
    val ts = col(tsCol)
    // pass 1: the anchor; pass k: earliest step-k event after t(k-1)
    // and within the span of the anchor — each pass only reads the
    // PREVIOUS pass's materialized column, so the chain stays inside
    // one user-hash Exchange (unbounded frames: no sort either)
    val anchored = events.select(
      col(userCol),
      ts,
      col(typeCol),
      min(when(col(typeCol) === steps.head, ts)).over(w).as("__t1"))
    val chained = steps.zipWithIndex.tail.foldLeft(anchored) {
      case (df, (step, i)) =>
        df.withColumn(
          s"__t${i + 1}",
          min(when(
            col(typeCol) === step &&
              ts > col(s"__t$i") &&
              ts <= col("__t1") + lit(maxSpanUs),
            ts)).over(w))
    }
    // per-user row (the __t columns are partition constants, so max()
    // over the existing user partitioning adds no exchange), then the
    // O(steps) global count — non-null tK implies non-null t(K-1), so
    // the step counts are monotone by construction
    val perUser = chained
      .groupBy(col(userCol))
      .agg(max(col("__t1")).as("__t1"),
        steps.indices.tail.map(i => max(col(s"__t${i + 1}")).as(s"__t${i + 1}")): _*)
    val counts = perUser.agg(
      count(col("__t1")).as("__n1"),
      steps.indices.tail.map(i => count(col(s"__t${i + 1}")).as(s"__n${i + 1}")): _*)
    val stepRows = steps.zipWithIndex.map { case (step, i) =>
      struct(
        lit(i + 1).as("step_idx"),
        lit(step).as("step_name"),
        col(s"__n${i + 1}").as("n_users"))
    }
    counts
      .select(explode(array(stepRows: _*)).as("__s"), col("__n1"))
      .select(
        col("__s.step_idx"),
        col("__s.step_name"),
        col("__s.n_users"),
        when(col("__n1") === 0L, lit(0.0))
          .otherwise(round(col("__s.n_users").cast("double") / col("__n1").cast("double"), 4))
          .as("conv_rate"))
  }

  /** Cohort retention over fixed-width periods: group users by the
    * period of their FIRST event (`cohort_period` = epoch-µs ts div
    * `periodUs`), then count the distinct users of each cohort active
    * in each later period. Output: (cohort_period, period_offset,
    * n_active, retention = n_active / cohort size rounded 4dp).
    * Offset 0 always holds the full cohort (a user's first event is in
    * their own cohort period), which is what makes the retention
    * denominator a window over the result instead of a second scan.
    *
    * Plan: one user-hash exchange (first-event window), a stateless
    * period projection, then a distinct + count whose exchange is
    * bounded by |cohorts × offsets × users-active| — the classic
    * retention-matrix cardinality, far below the event count. The
    * period arithmetic is subtract-mod (`ts − ts % p`) before the
    * divide so the quotient is exact in DOUBLE for any epoch-µs value
    * (the multiple of p is < 2⁵³; a raw ts/p divide could land a hair
    * under an integer boundary and floor off by one). */
  def retention(
      events: DataFrame,
      tsCol: String,
      userCol: String,
      periodUs: Long
  ): DataFrame = {
    require(periodUs > 0, s"periodUs must be positive, got $periodUs")
    val ts = col(tsCol)
    val p = lit(periodUs)
    def periodOf(c: Column): Column = ((c - c % p) / p).cast("long")
    val w = Window.partitionBy(col(userCol))
    val withCohort = events
      .select(col(userCol), ts)
      .withColumn("__first", min(ts).over(w))
      .select(
        col(userCol),
        periodOf(col("__first")).as("cohort_period"),
        (periodOf(ts) - periodOf(col("__first"))).as("period_offset"))
    val active = withCohort
      .groupBy("cohort_period", "period_offset")
      .agg(countDistinct(col(userCol)).as("n_active"))
    val wc = Window.partitionBy(col("cohort_period"))
    active
      .withColumn("__size", max(when(col("period_offset") === 0L, col("n_active"))).over(wc))
      .select(
        col("cohort_period"),
        col("period_offset"),
        col("n_active"),
        round(col("n_active").cast("double") / col("__size").cast("double"), 4)
          .as("retention"))
  }

  /** Growth accounting per period — the OTHER canonical activity
    * readout next to [[retention]]'s cohort matrix: for each period,
    * how many active users are NEW (first period ever), RETAINED
    * (also active the immediately previous period), or RESURRECTED
    * (returning after a gap) — and how many CHURNED out of the
    * previous period (active at t−1, absent at t:
    * n_churned = n_active(t−1) − n_retained(t), zero-attributed when
    * t−1 had no row). `churn_rate` = churned / previous active, 6dp
    * sign-safe half-up, NULL when there is no previous period.
    *
    * Plan: ONE distinct (user, period) exchange (the same
    * subtract-mod exact period arithmetic as [[retention]]), a
    * per-user ordered window classifying each presence against its
    * lag, one period rollup, then a lag on the tiny period frame.
    * Nothing after the distinct scales with event volume.
    *
    * EMPTY-PERIOD CAVEAT: rows exist only for periods with ≥ 1 active
    * user. A transition where EVERY user churns (period t has no
    * activity at all after an active t−1) therefore produces no row,
    * and that transition's churn is reported nowhere — summing
    * n_churned across the output UNDERSTATES true churn by exactly
    * those all-churn transitions (as does the zero-attribution across
    * multi-period gaps, documented above). Callers tracking total
    * churn over sparse calendars should use [[growthAccountingDense]],
    * which densifies the period spine before differencing.
    */
  def growthAccounting(
      events: DataFrame,
      tsCol: String,
      userCol: String,
      periodUs: Long
  ): DataFrame = {
    val perPeriod = growthPerPeriod(events, tsCol, userCol, periodUs)
    val byP = Window.orderBy(col("period").asc)
    val prevActive = when(
      lag(col("period"), 1).over(byP) === col("period") - 1L,
      lag(col("n_active"), 1).over(byP)).otherwise(lit(0L))
    perPeriod
      .withColumn("__pa", prevActive)
      .withColumn("n_churned", col("__pa") - col("n_retained"))
      .withColumn("churn_rate",
        when(col("__pa") > 0,
          (intDivF(col("n_churned") * 2000000L + col("__pa"), col("__pa") * 2L))
            .cast("double") / lit(1000000.0)))
      .drop("__pa")
  }

  /** The shared new/retained/resurrected per-period rollup behind
    * [[growthAccounting]] and [[growthAccountingDense]]: ONE distinct
    * (user, period) exchange, a per-user ordered classification
    * window, one period rollup. */
  private def growthPerPeriod(
      events: DataFrame,
      tsCol: String,
      userCol: String,
      periodUs: Long
  ): DataFrame = {
    require(periodUs > 0, s"periodUs must be positive, got $periodUs")
    val ts = col(tsCol)
    val p = lit(periodUs)
    def periodOf(c: Column): Column = ((c - c % p) / p).cast("long")
    val present = events
      .select(col(userCol).as("__u"), periodOf(ts).as("period"))
      .distinct()
    val byU = Window.partitionBy("__u").orderBy(col("period").asc)
    val classified = present
      .withColumn("__prev", lag(col("period"), 1).over(byU))
      .withColumn("__cls",
        when(col("__prev").isNull, lit("new"))
          .when(col("__prev") === col("period") - 1L, lit("retained"))
          .otherwise(lit("resurrected")))
    classified
      .groupBy("period")
      .agg(
        count(lit(1)).as("n_active"),
        sum(when(col("__cls") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("__cls") === "retained", 1L).otherwise(0L)).as("n_retained"),
        sum(when(col("__cls") === "resurrected", 1L).otherwise(0L)).as("n_resurrected"))
  }

  /** [[growthAccounting]] over a DENSIFIED period spine — the fix for
    * the all-churn caveat documented there: rows exist for EVERY
    * period between the first and last active one (`sequence(min,
    * max)` on the tiny per-period frame, exploded and left-joined, all
    * counts zero-filled), so a period with no activity at all still
    * carries its transition's churn (`n_churned = n_active(t−1)`,
    * `churn_rate = 1`) and `sum(n_churned)` over the output equals
    * total true churn. The lag needs no adjacency guard — the spine is
    * contiguous by construction. The spine is bounded loudly at 10M
    * periods (a wrong `periodUs` against µs timestamps would otherwise
    * explode the sequence): nothing downstream of the distinct scales
    * with event volume, exactly as in the sparse form. */
  def growthAccountingDense(
      events: DataFrame,
      tsCol: String,
      userCol: String,
      periodUs: Long
  ): DataFrame = {
    val perPeriod = growthPerPeriod(events, tsCol, userCol, periodUs)
    val spine = perPeriod
      .agg(min(col("period")).as("__lo"), max(col("period")).as("__hi"))
      .select(explode(sequence(
        col("__lo"),
        when(col("__hi") - col("__lo") < 10000000L, col("__hi"))
          .otherwise(raise_error(lit(
            "growthAccountingDense: period spine exceeds 10M rows — wrong periodUs?")))))
        .as("period"))
    val dense = spine
      .join(perPeriod, Seq("period"), "left")
      .select(
        col("period"),
        coalesce(col("n_active"), lit(0L)).as("n_active"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"))
    val byP = Window.orderBy(col("period").asc)
    dense
      .withColumn("__pa", coalesce(lag(col("n_active"), 1).over(byP), lit(0L)))
      .withColumn("n_churned", col("__pa") - col("n_retained"))
      .withColumn("churn_rate",
        when(col("__pa") > 0,
          (intDivF(col("n_churned") * 2000000L + col("__pa"), col("__pa") * 2L))
            .cast("double") / lit(1000000.0)))
      .drop("__pa")
  }

  /** `a div b` (IntegralDivide) — churned ≥ 0 always (retained ⊆
    * previous active), so the half-up needs no sign branch. */
  private def intDivF(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    Bridge.column(IntegralDivide(Bridge.expression(a), Bridge.expression(b)))
  }

  /** Step-to-step conversion timing — the "how long from signup to
    * first purchase" readout behind every funnel: per user, the delta
    * from the FIRST `fromStep` event to the FIRST `toStep` event at
    * or after it; then exact type-1 quantiles of those deltas (the
    * [[graft.ops.Stats.groupQuantiles]] integer-pick rule — smallest
    * delta whose cumulative count reaches ⌈p·n⌉, cross-multiplied, no
    * sketch, no float boundary).
    *
    * ONE user-keyed rollup computes both firsts (min and conditional
    * min are partial-mergeable — no window, no join), the bounded
    * per-distinct-delta frame carries the quantile fold. Users who
    * never reach `fromStep`, or whose `toStep` never follows it,
    * simply don't convert (counted in `n_from` vs `n_converted`).
    *
    * Returns ONE row:
    * `(n_from, n_converted, p50_us, p90_us, p99_us)` — deltas in the
    * ts column's own unit, NULL quantiles when nobody converts.
    */
  def stepTiming(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      stepCol: String,
      fromStep: String,
      toStep: String
  ): DataFrame = {
    val perUser = events
      .where(col(stepCol) === fromStep || col(stepCol) === toStep)
      .groupBy(col(userCol).as("__u"))
      .agg(min(when(col(stepCol) === fromStep, col(tsCol))).as("__f"))
    val firstTo = events
      .where(col(stepCol) === toStep)
      .groupBy(col(userCol).as("__u"))
      .agg(collect_list(col(tsCol)).as("__ts"))
    // first `to` AT OR AFTER the first `from`: array_min of the
    // filtered list — per-user lists are activity-bounded
    val joined = perUser
      .where(col("__f").isNotNull)
      .join(firstTo, Seq("__u"), "left")
      .withColumn("__t",
        array_min(filter(col("__ts"), t => t >= col("__f"))))
      .withColumn("__d", col("__t") - col("__f"))
    val byD = Window.orderBy(col("__d").asc).rowsBetween(Long.MinValue, 0)
    val whole = Window.partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    val nFromW = Window.partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    val deltas = joined
      .groupBy(col("__d"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__isconv", col("__d").isNotNull)
      .withColumn("__cum",
        sum(when(col("__isconv"), col("__c")).otherwise(0L)).over(byD))
      .withColumn("__nconv",
        sum(when(col("__isconv"), col("__c")).otherwise(0L)).over(whole))
      .withColumn("__nfrom", sum(col("__c")).over(nFromW))
    def pick(num: Long, den: Long) =
      min(when(col("__isconv") && col("__cum") * den >= col("__nconv") * num, col("__d")))
    deltas
      .groupBy("__nfrom", "__nconv")
      .agg(
        pick(1L, 2L).as("p50_us"),
        pick(9L, 10L).as("p90_us"),
        pick(99L, 100L).as("p99_us"))
      .select(
        col("__nfrom").as("n_from"),
        col("__nconv").as("n_converted"),
        col("p50_us"), col("p90_us"), col("p99_us"))
  }

  /** DAU/WAU engagement: per active period (day), the distinct-user
    * count for that day (`dau`), the rolling `windowDays`-day
    * distinct-user count ending that day (`wau`), and the stickiness
    * ratio dau/wau (6dp half-up of the exact rational) — the standard
    * "how often do actives come back" readout.
    *
    * Rolling DISTINCT does not decompose as a window sum (a user
    * active twice in the window must count once), so each distinct
    * (user, day) presence is EXPLODED to the `windowDays` window-end
    * days it covers and the count re-distincts per end day — work
    * bounded by windowDays × |user-days| (user-days ≪ events; the
    * explode factor is the window length, a literal). Only days with
    * their own activity emit (a dead day has dau 0 — join the dau
    * frame to taste).
    */
  def activeUsers(
      events: DataFrame,
      tsCol: String,
      userCol: String,
      periodUs: Long,
      windowDays: Int = 7
  ): DataFrame = {
    require(periodUs > 0, s"periodUs must be positive, got $periodUs")
    require(windowDays >= 1 && windowDays <= 92,
      s"windowDays must be in [1,92], got $windowDays")
    val ts = col(tsCol)
    val p = lit(periodUs)
    def periodOf(c: Column): Column = ((c - c % p) / p).cast("long")
    val present = events
      .select(col(userCol).as("__u"), periodOf(ts).as("day"))
      .distinct()
    val dau = present.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = present
      .select(col("__u"),
        explode(sequence(col("day"), col("day") + (windowDays - 1).toLong)).as("day"))
      .distinct()
      .groupBy("day")
      .agg(count(lit(1)).as("wau"))
    dau
      .join(wau, Seq("day"))
      .select(
        col("day"),
        col("dau"),
        col("wau"),
        (intDivF(col("dau") * 2000000L + col("wau"), col("wau") * 2L)
          .cast("double") / lit(1000000.0)).as("stickiness"))
  }
}
