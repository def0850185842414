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
}
