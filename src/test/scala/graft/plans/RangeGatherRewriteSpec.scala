package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeGatherRewriteSpec extends SparkSpec {

  private def withRule[A](f: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RangeGatherRewrite
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == RangeGatherRewrite)
  }

  import spark.implicits._

  private lazy val samples =
    (0L until 200L).map(i => (i, math.sin(i.toDouble))).toDF("idx", "value")
  private lazy val peaks = Seq(10L, 50L, 199L).toDF("peak")

  test("range gather join rewrites to an equi-join with identical results") {
    val cond = col("idx") >= col("peak") - 3 && col("idx") < col("peak") + 3
    val plain = samples.join(peaks, cond).select("peak", "idx", "value")
    val expected = plain.collect().map(_.toSeq).toSet

    withRule {
      val rewritten = samples.join(peaks, cond).select("peak", "idx", "value")
      val phys = rewritten.queryExecution.executedPlan.toString
      assert(!phys.contains("BroadcastNestedLoopJoin"), phys)
      assert(phys.contains("HashJoin") || phys.contains("SortMergeJoin"), phys)
      assert(rewritten.collect().map(_.toSeq).toSet == expected)
      // edge peak 199: range [196, 202) ∩ existing idx = {196..199} — the
      // inner join drops the 2 offsets beyond the stream edge
      assert(rewritten.where(col("peak") === 199).count() == 4)
    }
  }

  test("operand order and strict/non-strict bound variants all rewrite") {
    val conds = Seq(
      col("idx") >= col("peak") - 2 && col("idx") <= col("peak") + 2,
      col("peak") - 2 <= col("idx") && col("peak") + 2 >= col("idx"),
      col("idx") > col("peak") - 3 && col("idx") < col("peak") + 3
    )
    withRule {
      conds.foreach { cond =>
        val df = samples.join(peaks, cond)
        val phys = df.queryExecution.executedPlan.toString
        assert(!phys.contains("BroadcastNestedLoopJoin"), phys)
        assert(df.count() == 3 * 5 - 2) // peak 199 truncated to [197, 201]∩[0,199] = 3 rows
      }
    }
  }

  test("IntegerType keys rewrite too") {
    val si = (0 until 100).map(i => (i, i * 1.5)).toDF("idx", "value")
    val pi = Seq(10, 50).toDF("peak")
    val cond = col("idx") >= col("peak") - 2 && col("idx") < col("peak") + 2
    val want = si.join(pi, cond).collect().map(_.toSeq).toSet
    withRule {
      val got = si.join(pi, cond)
      val phys = got.queryExecution.executedPlan.toString
      assert(!phys.contains("BroadcastNestedLoopJoin"), phys)
      assert(got.collect().map(_.toSeq).toSet == want)
    }
  }

  test("zero-offset lower bound (s >= p && s < p + B) rewrites") {
    val cond = col("idx") >= col("peak") && col("idx") < col("peak") + 4
    val expected = samples.join(peaks, cond).collect().map(_.toSeq).toSet
    withRule {
      val df = samples.join(peaks, cond)
      val phys = df.queryExecution.executedPlan.toString
      assert(!phys.contains("BroadcastNestedLoopJoin"), phys)
      assert(df.collect().map(_.toSeq).toSet == expected)
    }
  }

  test("zero-offset upper bound (s > p - A && s <= p) rewrites") {
    val cond = col("idx") > col("peak") - 3 && col("idx") <= col("peak")
    val expected = samples.join(peaks, cond).collect().map(_.toSeq).toSet
    withRule {
      val df = samples.join(peaks, cond)
      val phys = df.queryExecution.executedPlan.toString
      assert(!phys.contains("BroadcastNestedLoopJoin"), phys)
      assert(df.collect().map(_.toSeq).toSet == expected)
    }
  }

  test("does not fire on equi-joins or unbounded ranges") {
    withRule {
      // an equi-join must stay untouched (no offset column in output)
      val eq = samples.join(peaks, col("idx") === col("peak"))
      assert(eq.count() == 3)
      assert(!eq.columns.contains("__graft_gather_offset"))
      // one-sided range: no rewrite, still BNLJ (correctly so)
      val oneSided = samples.join(peaks, col("idx") >= col("peak") - 1)
      assert(oneSided.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    }
  }

  test("residual conjuncts survive as filters") {
    val cond = col("idx") >= col("peak") - 3 && col("idx") < col("peak") + 3 &&
      col("value") > 0.0
    val expected = samples.join(peaks, cond).collect().map(_.toSeq).toSet
    withRule {
      val df = samples.join(peaks, cond)
      assert(!df.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
      assert(df.collect().map(_.toSeq).toSet == expected)
    }
  }
}
