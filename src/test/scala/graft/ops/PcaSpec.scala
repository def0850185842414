package graft.ops

import graft.SparkSpec

/** PCA: hand-computed 2-D fixture (known direction, exact projections),
  * partition invariance of the moments aggregate, malformed-row
  * skipping, and component orthonormality on a wider fixture. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  // points t·(3,4), t ∈ −2..2 → mean 0, first component (0.6, 0.8)
  // (sign fixed: largest-|v| coord positive), p1 = 5t exactly
  private val lineDf = Seq(-2f, -1f, 0f, 1f, 2f)
    .zipWithIndex
    .map { case (t, i) => (i.toLong, Seq(3f * t, 4f * t)) }
    .toDF("vec_id", "embedding")

  test("fit: exact direction, sign convention, variance share") {
    val m = Pca.fit(lineDf, dim = 2, k = 2)
    assert(math.abs(m.components(0)(0) - 0.6) < 1e-9)
    assert(math.abs(m.components(0)(1) - 0.8) < 1e-9)
    // all variance on the line
    assert(math.abs(m.varExplained(0) - 1.0) < 1e-9)
    assert(math.abs(m.varExplained(1)) < 1e-9)
    // second component: orthogonal, sign-fixed → (0.8, −0.6)
    assert(math.abs(m.components(1)(0) - 0.8) < 1e-9)
    assert(math.abs(m.components(1)(1) + 0.6) < 1e-9)
    assert(m.mean.forall(x => math.abs(x) < 1e-12))
  }

  test("project: exact hand values") {
    val m = Pca.fit(lineDf, dim = 2, k = 1)
    val p = Pca.project(lineDf, m).orderBy("vec_id").collect()
    val expect = Seq(-10.0, -5.0, 0.0, 5.0, 10.0)
    p.zip(expect).foreach { case (r, e) =>
      assert(math.abs(r.getDouble(1) - e) < 1e-9)
    }
  }

  test("fit: partition-invariant (mergeable moments, bit-identical model)") {
    val a = Pca.fit(lineDf.repartition(1), dim = 2, k = 2)
    val b = Pca.fit(lineDf.repartition(7), dim = 2, k = 2)
    assert(a.mean.toSeq == b.mean.toSeq)
    assert(a.components.map(_.toSeq).toSeq == b.components.map(_.toSeq).toSeq)
  }

  test("fit: wrong-width and null rows are skipped, not zero-filled") {
    val dirty = lineDf.union(
      Seq((90L, Seq(1f, 2f, 3f)), (91L, null.asInstanceOf[Seq[Float]]))
        .toDF("vec_id", "embedding"))
    val m = Pca.fit(dirty, dim = 2, k = 1)
    assert(math.abs(m.components(0)(0) - 0.6) < 1e-9)
    assert(math.abs(m.components(0)(1) - 0.8) < 1e-9)
  }

  test("fit: components orthonormal on a non-degenerate 5-D fixture") {
    val rng = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      (i.toLong, Seq.fill(5)((rng.nextGaussian() * (1 + i % 3)).toFloat))
    }
    val m = Pca.fit(rows.toDF("vec_id", "embedding"), dim = 5, k = 5)
    for (i <- 0 until 5; j <- i until 5) {
      val dot = (0 until 5).map(r => m.components(i)(r) * m.components(j)(r)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-8,
        s"components $i,$j dot=$dot")
    }
    // eigenvalue shares ordered descending and summing to 1 over full k
    assert(m.varExplained.sameElements(m.varExplained.sorted.reverse))
    assert(math.abs(m.varExplained.sum - 1.0) < 1e-9)
  }
}
