package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-risk audits over quasi-identifier columns — the
  * re-identification gate a pipeline runs before releasing or training
  * on record-level data (Sweeney 2002 k-anonymity; Machanavajjhala et
  * al. 2007 l-diversity). Neither op transforms the data; they REPORT
  * the equivalence classes so the caller can suppress/generalize and
  * re-audit — the audit loop's measurement half.
  *
  * Both are ONE map-side-combinable rollup keyed by the
  * quasi-identifier tuple (l-diversity's distinct count is the
  * standard two-phase partial-distinct aggregate): shuffled rows are
  * bounded by the class count, never the corpus, at any scale.
  */
object Privacy {

  /** k-anonymity audit: every quasi-identifier equivalence class with
    * its row count and a violation flag (`n < k` — fewer than k rows
    * share the identifying combination, so any of them is
    * re-identifiable to better than 1-in-k).
    *
    * @return quasiCols + (n, k_violation 0/1)
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymity needs at least one quasi-identifier column")
    require(k >= 1, s"k must be >= 1, got $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("k_violation", (col("n") < k).cast("int"))
  }

  /** Distinct l-diversity audit: per quasi-identifier class, the
    * number of DISTINCT sensitive values (NULLs excluded — an absent
    * sensitive value discloses nothing) and a violation flag
    * (`n_sensitive < l` — the class's sensitive attribute is
    * inferable to within fewer than l candidates even when k-anonymity
    * holds; the classic homogeneity attack).
    *
    * @return quasiCols + (n, n_sensitive, l_violation 0/1)
    */
  def lDiversity(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String,
      l: Long
  ): DataFrame = {
    require(quasiCols.nonEmpty, "lDiversity needs at least one quasi-identifier column")
    require(l >= 1, s"l must be >= 1, got $l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        count_distinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("l_violation", (col("n_sensitive") < l).cast("int"))
  }

  /** t-closeness audit for an ORDERED sensitive attribute (Li, Li &
    * Venkatasubramanian 2007) — the third rung after [[kAnonymity]]
    * and [[lDiversity]]: per quasi-identifier class, the earth-mover
    * distance between the class's sensitive-value distribution and the
    * GLOBAL one (ordered-EMD = mean absolute cumulative-probability
    * gap over the m global values), flagged when it exceeds `t`.
    *
    * Exactness: the EMD is the exact rational
    * `D / (n_class · N · (m−1))` with
    * `D = Σ_i |cum_class(i)·N − cum_global(i)·n_class|` — all integer
    * arithmetic; the shipped `emd` is one 6dp double division and the
    * violation flag is an integer cross-multiply against `tMicro`
    * (t in micro-units), so no float boundary exists anywhere.
    *
    * Shape at scale: one (class, value) rollup over the corpus; the
    * m distinct sensitive values are collected driver-side (guarded —
    * an ordered sensitive attribute is a banded/categorical column by
    * construction) and EXPLODED onto the bounded class frame, so the
    * densified grid is classes × m rows with no cross join; the global
    * distribution broadcasts onto it by value.
    *
    * @return quasiCols + (n, emd 6dp, t_violation 0/1); NULL sensitive
    *         values are rejected loudly (they would silently shrink
    *         every distribution). Classes × single-value corpora
    *         (m = 1) report emd 0. */
  def tCloseness(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String,
      tMicro: Long,
      maxValues: Int = 10000
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(quasiCols.nonEmpty, "tCloseness needs at least one quasi-identifier column")
    require(tMicro >= 0, s"tMicro must be >= 0, got $tMicro")
    val guarded = df.where(
      when(col(sensitiveCol).isNull,
        raise_error(lit(s"Privacy: NULL in $sensitiveCol — filter or impute first")))
        .otherwise(lit(true)))
    val cv = guarded
      .groupBy(quasiCols.map(col) :+ col(sensitiveCol).as("__v"): _*)
      .agg(count(lit(1)).as("__c"))
    // global ordered distribution — bounded by the sensitive-value
    // vocabulary; collected under a loud cap (banded attribute contract)
    val gRows = cv.groupBy("__v").agg(sum(col("__c")).as("__g"))
      .orderBy(col("__v").asc).limit(maxValues + 1).collect()
    require(gRows.length <= maxValues,
      s"tCloseness: > $maxValues distinct $sensitiveCol values — band the attribute first")
    val m = gRows.length
    val nTotal = gRows.iterator.map(_.getLong(1)).sum
    val values = gRows.map(_.get(0))
    val spark = df.sparkSession
    import scala.jdk.CollectionConverters._
    val gSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__v", cv.schema("__v").dataType),
      org.apache.spark.sql.types.StructField("__cum_g",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val gCum = values.zip(gRows.scanLeft(0L)(_ + _.getLong(1)).tail)
    val gDf = broadcast(spark.createDataFrame(
      gCum.map { case (v, c) => org.apache.spark.sql.Row(v, c) }.toSeq.asJava, gSchema))
    // densify: every class gets every global value via a literal-array
    // explode (no cross join), then left-join its own counts
    val classes = cv.groupBy(quasiCols.map(col): _*).agg(sum(col("__c")).as("n"))
    val grid = classes
      .withColumn("__v", explode(array(values.toSeq.map(v => lit(v)): _*)))
      .join(cv, quasiCols :+ "__v", "left")
      .withColumn("__c", coalesce(col("__c"), lit(0L)))
    val byClass = Window.partitionBy(quasiCols.map(col): _*).orderBy(col("__v").asc)
    val terms = grid
      .withColumn("__cum_c", sum(col("__c")).over(byClass.rowsBetween(Long.MinValue, 0)))
      .join(gDf, Seq("__v"))
      // the last value's cumulative gap is 0 by construction; keeping
      // it in the sum is harmless and keeps the frame dense. DECIMAL
      // products: cum·N reaches N² — past long range at corpus scale
      .withColumn("__d", abs(
        col("__cum_c").cast("decimal(38,0)") * nTotal -
          col("__cum_g").cast("decimal(38,0)") * col("n")))
    val denomD = if (m > 1) (m - 1).toLong else 1L
    terms
      .groupBy(quasiCols.map(col) :+ col("n"): _*)
      .agg(sum(col("__d")).as("__D"))
      .select(
        quasiCols.map(col) :+ col("n") :+
          round(col("__D").cast("double") /
            (col("n").cast("decimal(38,0)") * nTotal * denomD).cast("double"), 6).as("emd") :+
          // integer cross-multiply: D·10⁶ > tMicro·(n·N·(m−1))
          (col("__D") * 1000000L >
            (col("n").cast("decimal(38,0)") * nTotal * denomD) * tMicro)
            .cast("int").as("t_violation"): _*)
  }
}
