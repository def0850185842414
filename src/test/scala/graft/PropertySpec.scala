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
