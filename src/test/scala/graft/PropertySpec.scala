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

  test("property: gap fill with step > 1 fills exactly the on-grid interior points") {
    trials(8) { rnd =>
      val step = 2L + rnd.nextInt(4)
      val maxGap = 4L
      var t = rnd.nextLong(50).abs
      val rows = List.fill(3 + rnd.nextInt(10)) {
        val r = (t, rnd.nextDouble() * 100)
        t += step + rnd.nextLong(4 * step).abs // arbitrary (often off-grid) gaps
        r
      }
      val df = rows.toDF("ts", "v")
      val out = GapFill.linear(df, "ts", "v", step = step, maxGapSize = maxGap)
        .collect().map(r => (r.getLong(0), r.getInt(2))).toSet
      // reference model: for each bracketing pair, every ts0 + j*step
      // strictly inside a fillable gap must appear exactly once
      val expectedFills = rows.map(_._1).sliding(2).flatMap {
        case Seq(a, b) if b - a > step && b - a <= maxGap * step + step =>
          Iterator.from(1).map(j => a + j * step).takeWhile(_ < b)
        case _ => Iterator.empty
      }.toSet
      assert(out.filter(_._2 == 1).map(_._1) == expectedFills, s"rows=$rows step=$step")
    }
  }

  test("property: star pairs and all pairs give identical connected components") {
    import graft.ops.DedupDocs
    import org.apache.spark.sql.functions._
    trials(5) { rnd =>
      // random buckets over a small doc universe (overlapping membership
      // chains components together)
      val nDocs = 12 + rnd.nextInt(10)
      val buckets = List.fill(4 + rnd.nextInt(6)) {
        val m = 2 + rnd.nextInt(5)
        List.fill(m)(rnd.nextInt(nDocs).toLong).distinct.sorted
      }.filter(_.size > 1)
      whenever(buckets.nonEmpty) {
        val bdf = buckets.map(b => Tuple1(b)).toDF("docs")
        val docs = (0L until nDocs.toLong).toDF("doc_id")
        // limit=0 forces the distributed loop; default takes the
        // driver union-find fast path — all four must agree
        def cc(pairs: org.apache.spark.sql.DataFrame, limit: Long): Map[Long, Long] =
          DedupDocs.connectedComponents(docs, pairs, driverEdgeLimit = limit)
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val allPairs = DedupDocs.explodePairs(bdf)
        val starPairs = DedupDocs.explodeStarPairs(bdf)
        val reference = cc(allPairs, limit = 4000000L)
        assert(cc(starPairs, limit = 4000000L) == reference, s"buckets=$buckets")
        assert(cc(allPairs, limit = 0L) == reference, s"buckets=$buckets (distributed)")
        assert(cc(starPairs, limit = 0L) == reference, s"buckets=$buckets (distributed star)")
      }
    }
  }

  test("property: packed-lane simhash == naive 64-column signed-sum simhash") {
    import org.apache.spark.sql.functions._
    trials(4) { rnd =>
      val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh", "ij", "kl")
      val docs = (0L until (5 + rnd.nextInt(8)).toLong).map { id =>
        (id, List.fill(1 + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }.toDF("doc_id", "text")
      val packed = graft.ops.DedupDocs.simhash(docs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // naive reference: 64 separate signed sums
      val tok = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .withColumn("__md5", md5(col("tok").cast("binary")))
        .withColumn("th_hi", conv(substring(col("__md5"), 1, 8), 16, 10).cast("long"))
        .withColumn("th_lo", conv(substring(col("__md5"), 9, 8), 16, 10).cast("long"))
      val bitCols = (0 until 64).map { b =>
        val src = if (b < 32) col("th_lo") else col("th_hi")
        val shift = if (b < 32) b else b - 32
        sum(when(shiftright(src, shift).bitwiseAND(1L) === 1L, 1L).otherwise(-1L)).as(s"s$b")
      }
      val naiveSim = (0 until 64)
        .map(b => when(col(s"s$b") > 0, shiftleft(lit(1L), b)).otherwise(0L))
        .reduce(_.bitwiseOR(_))
      val naive = tok.groupBy("doc_id").agg(bitCols.head, bitCols.tail: _*)
        .select(col("doc_id"), naiveSim.as("simhash"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(packed == naive)
    }
  }

  private def whenever(cond: Boolean)(body: => Unit): Unit = if (cond) body

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

  test("property: chiSquared is non-negative, dof consistent, n preserved") {
    trials(6) { rnd =>
      val rows = List.fill(30 + rnd.nextInt(120))(
        (s"a${rnd.nextInt(4)}", rnd.nextInt(3)))
      val r = graft.ops.Stats.chiSquared(rows.toDF("a", "b"), "a", "b", 1L).head()
      assert(r.getDouble(4) >= 0.0, s"chi2 negative: $r")
      assert(r.getLong(3) == (r.getLong(1) - 1) * (r.getLong(2) - 1))
      assert(r.getLong(0) == rows.length.toLong)
    }
  }

  test("property: concentration gini in [0,1), hhi in [1/n,1], shares consistent") {
    trials(6) { rnd =>
      val keys = List.fill(20 + rnd.nextInt(200))(s"k${rnd.nextInt(1 + rnd.nextInt(30))}")
      val r = graft.ops.Stats.concentration(keys.toDF("k"), "k", topK = 5).head()
      val nk = r.getLong(0); val gini = r.getDouble(2); val hhi = r.getDouble(3)
      assert(gini >= 0.0 && gini < 1.0, s"gini=$gini")
      assert(hhi >= 1.0 / nk - 1e-6 && hhi <= 1.0 + 1e-9, s"hhi=$hhi nk=$nk")
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
      assert(r.getLong(1) == keys.length.toLong)
    }
  }

  test("property: groupQuantiles picks are monotone in p and are attained values") {
    trials(6) { rnd =>
      val vals = List.fill(10 + rnd.nextInt(100))(
        ("g", math.rint(rnd.nextDouble() * 1000) / 100.0))
      val r = graft.ops.Stats.groupQuantiles(vals.toDF("k", "v"), "k", "v").head()
      val (p50, p90, p99) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(p50 <= p90 && p90 <= p99, s"$r")
      val set = vals.map(_._2).toSet
      assert(set(p50) && set(p90) && set(p99), s"picks not attained: $r")
    }
  }

  test("property: EWMA lies within the running window's [min,max]; alarm iff |dev| over threshold") {
    trials(6) { rnd =>
      val vals = List.fill(5 + rnd.nextInt(50))(math.rint(rnd.nextDouble() * 10000) / 100.0)
      val df = vals.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }.toDF("k", "ts", "v")
      val rows = graft.ts.Ewma
        .controlChart(df, Seq("k"), "ts", "ts", "v", taps = 4,
          alphaNum = 1, alphaDen = 3, thresholdMicro = 5000000L)
        .orderBy("ts").collect()
      rows.zipWithIndex.foreach { case (r, i) =>
        val window = vals.slice(math.max(0, i - 3), i + 1)
        val e = r.getAs[Double]("ewma")
        assert(e >= window.min - 1e-6 && e <= window.max + 1e-6,
          s"i=$i ewma=$e window=$window")
        if (i > 0) {
          val dev = r.getAs[Double]("dev")
          assert((math.abs(dev) > 5.0 + 1e-12) == (r.getAs[Int]("alarm") == 1))
        }
      }
    }
  }

  test("property: growthAccounting identities — active = new+retained+resurrected, churn conserves") {
    trials(6) { rnd =>
      val rows = List.fill(30 + rnd.nextInt(150))(
        (rnd.nextInt(12).toLong, (1 + rnd.nextInt(8)).toLong * 10 + rnd.nextInt(10)))
      val df = rows.toDF("u", "t")
      val got = graft.ops.Funnel.growthAccounting(df, "t", "u", 10L)
        .orderBy("period").collect()
      var prevActive = 0L; var prevPeriod = Long.MinValue
      got.foreach { r =>
        val (p, act, nw, ret, res, ch) =
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
        assert(act == nw + ret + res, r.toString)
        val expectedPrev = if (p == prevPeriod + 1) prevActive else 0L
        assert(ch == expectedPrev - ret, r.toString)
        prevActive = act; prevPeriod = p
      }
    }
  }
}
