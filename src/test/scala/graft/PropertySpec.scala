package graft

import graft.spikes.Spikes
import graft.ts.{GapFill, Sessionize}

/** Property tests (FIXTURES.md §5 / SURVEY.md §5): structural invariants
  * of the core operators under randomized inputs (seeded — reproducible). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def trials(n: Int)(body: scala.util.Random => Unit): Unit =
    (1 to n).foreach(i => body(new scala.util.Random(i * 7919)))

  test("property: sessionize recovers segments concatenated with gaps >= threshold") {
    trials(8) { rnd =>
      val gap = 5L
      val segs = List.fill(1 + rnd.nextInt(15))((1 + rnd.nextInt(20), 5 + rnd.nextInt(45)))
      var t = 0L
      val tss = segs.flatMap { case (len, g) =>
        val run = (0 until len).map(i => t + i)
        t += len - 1 + math.max(g, gap.toInt)
        run
      }
      val df = tss.map(_.toLong).toDF("ts")
      val n = Sessionize
        .segments(Sessionize.withSegmentIdGlobal(df, "ts", gap, numPartitions = 3), "ts", 1L)
        .count()
      assert(n == segs.length.toLong, s"segs=$segs")
    }
  }

  test("property: censor output spacing >= width and is idempotent") {
    trials(8) { rnd =>
      val events = List.fill(1 + rnd.nextInt(60))(rnd.nextLong(500).abs).distinct.sorted
      val width = 1L + rnd.nextInt(60)
      val df = events.toDF("idx")
      val kept = Spikes.censor(df, "idx", width, Nil)
        .orderBy("idx").collect().map(_.getLong(0)).toSeq
      kept.sliding(2).foreach {
        case Seq(a, b) => assert(b - a >= width, s"events=$events width=$width kept=$kept")
        case _ =>
      }
      assert(kept.head == events.min)
      val again = Spikes.censor(kept.toDF("idx"), "idx", width, Nil)
        .orderBy("idx").collect().map(_.getLong(0)).toSeq
      assert(again == kept)
    }
  }

  test("property: gap fill preserves originals exactly and fills within brackets") {
    trials(8) { rnd =>
      val n = 3 + rnd.nextInt(10)
      var t = 0L
      val rows = List.fill(n) {
        val r = (t, rnd.nextDouble() * 200 - 100)
        t += 1 + rnd.nextInt(4)
        r
      }
      val df = rows.toDF("ts", "v")
      val out = GapFill.linear(df, "ts", "v", step = 1L, maxGapSize = 10L)
        .orderBy("ts").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
      val orig = out.filter(_._3 == 0).map(r => (r._1, r._2))
      assert(orig.toSeq == rows.map(r => (r._1, r._2)))
      assert(out.map(_._1).toSeq == (rows.head._1 to rows.last._1).toSeq)
      out.filter(_._3 == 1).foreach { case (ts, v, _) =>
        val before = rows.takeWhile(_._1 < ts).last
        val after = rows.dropWhile(_._1 <= ts).head
        val lo = math.min(before._2, after._2) - 1e-9
        val hi = math.max(before._2, after._2) + 1e-9
        assert(v >= lo && v <= hi, s"ts=$ts v=$v not in [$lo,$hi]")
      }
    }
  }

  test("property: OrderedStream neighbors == keyless window lag/lead") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    trials(6) { rnd =>
      val n = 20 + rnd.nextInt(300)
      val rows = scala.util.Random.shuffle((0 until n).toList).map(i => (i.toLong, rnd.nextDouble()))
      val df = rows.toDF("t", "v")
      val got = graft.ts.OrderedStream
        .withNeighbors(df, "t", Seq("v"), numPartitions = 1 + rnd.nextInt(7))
        .select(col("t"), col("__prev_t"), col("__next_t"), col("__prev_v"), col("__next_v"))
        .collect()
        .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), Option(r.get(4))))
        .sortBy(_._1)
      val w = Window.orderBy("t")
      val want = df
        .select(
          col("t"),
          lag(col("t"), 1).over(w), lead(col("t"), 1).over(w),
          lag(col("v"), 1).over(w), lead(col("v"), 1).over(w)
        )
        .collect()
        .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), Option(r.get(4))))
        .sortBy(_._1)
      assert(got.toSeq == want.toSeq)
    }
  }

  test("property: global sessionize == keyless-window formulation") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    trials(6) { rnd =>
      val gap = 1L + rnd.nextInt(10)
      var t = 0L
      val tss = (0 until 50 + rnd.nextInt(400)).map { _ =>
        t += 1 + rnd.nextInt(15); t
      }
      val df = tss.toDF("ts")
      val got = Sessionize
        .withSegmentIdGlobal(df, "ts", gap, numPartitions = 1 + rnd.nextInt(7))
        .select("ts", "segment_id")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .sortBy(_._1)
      val w = Window.orderBy("ts")
      val want = df
        .withColumn("brk", when(col("ts") - lag(col("ts"), 1).over(w) >= gap, 1L).otherwise(0L))
        .withColumn("segment_id", sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("ts", "segment_id")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .sortBy(_._1)
      assert(got.toSeq == want.toSeq)
    }
  }

  test("property: RangeGatherRewrite preserves join semantics on random bounds") {
    import org.apache.spark.sql.functions._
    val samples = (0L until 150L).map(i => (i, i * 2.0)).toDF("idx", "v")
    trials(6) { rnd =>
      val a = rnd.nextInt(6).toLong
      val b = 1L + rnd.nextInt(6)
      val peaks = List.fill(1 + rnd.nextInt(8))(rnd.nextLong(160).abs).distinct.toDF("peak")
      val cond = col("idx") >= col("peak") - a && col("idx") < col("peak") + b
      val want = samples.join(peaks, cond).collect().map(_.toSeq).toSet
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.RangeGatherRewrite
      try {
        val got = samples.join(peaks, cond)
        assert(!got.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
        assert(got.collect().map(_.toSeq).toSet == want, s"a=$a b=$b")
      } finally spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == graft.plans.RangeGatherRewrite)
    }
  }

  test("property: FIR zero-phase is linear and shift-invariant in the interior") {
    import org.apache.spark.sql.functions._
    val h = graft.dsp.Fir.lowpassCoeffs(9, 0.3)
    trials(4) { rnd =>
      val n = 64
      val x = Array.fill(n)(rnd.nextDouble() * 10 - 5)
      def run(sig: Array[Double]): Map[Long, Double] = {
        val df = sig.zipWithIndex.toSeq.map { case (v, i) => (1, i.toLong, v) }.toDF("k", "t", "v")
        graft.dsp.Fir
          .zeroPhase(df, h, Seq("k"), "t", "v")
          .collect()
          .map(r => r.getLong(1) -> r.getDouble(2))
          .toMap
      }
      val y = run(x)
      // linearity: filter(2x) == 2*filter(x)
      val y2 = run(x.map(_ * 2))
      (0 until n).foreach(i => assert(math.abs(y2(i.toLong) - 2 * y(i.toLong)) < 1e-9))
      // shift-invariance in the interior: shifting input by 1 shifts output
      val xs = 0.0 +: x.dropRight(1)
      val ys = run(xs.toArray)
      (6 until n - 6).foreach { i =>
        assert(math.abs(ys(i.toLong) - y((i - 1).toLong)) < 1e-9, s"i=$i")
      }
    }
  }

  test("property: filtfilt preserves length and is linear") {
    val sos = graft.dsp.FilterDesign.butter(3, Seq(0.3), graft.dsp.FilterDesign.Lowpass)
    trials(8) { rnd =>
      val n = 30 + rnd.nextInt(170)
      val x = Array.fill(n)(rnd.nextGaussian())
      val y = Array.fill(n)(rnd.nextGaussian())
      val fx = graft.dsp.SosFiltFilt.filtfilt(sos, x)
      val fy = graft.dsp.SosFiltFilt.filtfilt(sos, y)
      val fxy = graft.dsp.SosFiltFilt.filtfilt(sos, x.zip(y).map { case (a, b) => 2 * a + 3 * b })
      assert(fx.length == n)
      fxy.zip(fx.zip(fy)).foreach { case (c, (a, b)) =>
        assert(math.abs(c - (2 * a + 3 * b)) < 1e-8)
      }
    }
  }
}
