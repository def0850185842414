package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Principal-component projection for embedding pipelines — the standard
  * dimensionality-reduction step in front of ANN / clustering (reduce a
  * high-dim embedding to k components, then hand the result to
  * [[Ivf]] / [[SemDedup]] with a k-times-smaller distance kernel).
  *
  * Physical plan (the 100 TB shape): `fit` is ONE corpus aggregate —
  * [[graft.functions.MomentsAccum]] accumulates count / coordinate sums
  * / the Σ x xᵀ upper triangle into a single mergeable O(d²) buffer
  * (map-side combinable: the exchange carries one ~d²/2-double buffer
  * per partition, independent of row count), and the eigensolve runs
  * driver-side on the d×d covariance (Jacobi rotations — d is an
  * embedding width, ≤ a few thousand; cost is O(d³), data-free).
  * `project` is a zero-shuffle narrow projection whose k dot products
  * are spelled as explicit left-to-right double term sums, so the
  * generated SQL oracle ([[projectSql]]) reproduces them bit-for-bit.
  *
  * Covariance is population-normalized (1/n); components are unit-norm
  * eigenvectors ordered by eigenvalue descending (ties by first
  * coordinate index), each sign-fixed so its largest-|v| coordinate
  * (lowest index on ties) is positive — full determinism, independent
  * of partitioning, for the recorded-model oracle.
  */
object Pca {

  /** mean: d; components: k unit eigenvectors (rows); varExplained:
    * eigenvalue_i / trace, k entries. */
  final case class Model(
      mean: Array[Double],
      components: Array[Array[Double]],
      varExplained: Array[Double]
  )

  /** One-pass moments → driver Jacobi eigensolve. `embCol` must be
    * `array<float>` of width `dim` (rows of any other shape are
    * skipped by the accumulator). */
  def fit(embeddings: DataFrame, dim: Int, k: Int, embCol: String = "embedding"): Model = {
    require(k >= 1 && k <= dim, s"k must be in [1, $dim], got $k")
    val m = embeddings
      .agg(graft.functions.MomentsAccum.moments(col(embCol), dim).as("m"))
      .head().getSeq[Double](0).toArray
    val n = m(0)
    require(n >= 2.0, s"PCA needs >= 2 rows, got ${n.toLong}")
    val mean = Array.tabulate(dim)(i => m(1 + i) / n)
    // population covariance from raw moments: E[xixj] - mean_i mean_j
    val cov = Array.ofDim[Double](dim, dim)
    var t = 1 + dim
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = m(t) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        t += 1; j += 1
      }
      i += 1
    }
    val (evals, evecs) = jacobiEigen(cov)
    // order by eigenvalue desc, ties by index asc (Jacobi preserves
    // initial axis order under permutation sort — deterministic)
    val order = (0 until dim).sortBy(ix => (-evals(ix), ix)).take(k)
    val trace = evals.sum
    val comps = order.map { ix =>
      val v = Array.tabulate(dim)(r => evecs(r)(ix))
      // sign convention: largest-|v| coordinate (lowest index on ties)
      // made positive
      var best = 0
      var r = 1
      while (r < dim) { if (math.abs(v(r)) > math.abs(v(best))) best = r; r += 1 }
      if (v(best) < 0) { r = 0; while (r < dim) { v(r) = -v(r); r += 1 } }
      v
    }.toArray
    Model(mean, comps, order.map(ix => evals(ix) / trace).toArray)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix (public
    * textbook method — Golub & Van Loan §8.5): returns (eigenvalues,
    * eigenvector columns). Deterministic: fixed sweep order, fixed
    * iteration cap, convergence on off-diagonal Frobenius norm. */
  private[ops] def jacobiEigen(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = Array.tabulate(d, d)((i, j) => a0(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offNorm(a)
    val tol = 1e-12 * math.max(1.0, frobNorm(a))
    while (off > tol && sweep < 64) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val tt = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(tt * tt + 1.0)
            val s = tt * c
            var r = 0
            while (r < d) {
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = c * arp - s * arq
              a(r)(q) = s * arp + c * arq
              r += 1
            }
            r = 0
            while (r < d) {
              val apr = a(p)(r); val aqr = a(q)(r)
              a(p)(r) = c * apr - s * aqr
              a(q)(r) = s * apr + c * aqr
              r += 1
            }
            r = 0
            while (r < d) {
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = c * vrp - s * vrq
              v(r)(q) = s * vrp + c * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offNorm(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offNorm(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = 0
      while (j < a.length) { if (i != j) s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }

  private def frobNorm(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = 0
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }

  /** Projection column for component `j`: an explicit left-to-right
    * term sum `Σ_i e[i]·v_j[i] − ⟨mean, v_j⟩`, each product
    * double(float)·double — the exact evaluation the generated SQL
    * spells, so results hash-match without tolerance. */
  private def projCol(model: Model, j: Int, embCol: String): Column = {
    val v = model.components(j)
    val c = v.indices.map(i => v(i) * model.mean(i)).sum
    val terms = v.indices.map(i =>
      element_at(col(embCol), i + 1).cast("double") * lit(v(i)))
    terms.reduceLeft(_ + _) - lit(c)
  }

  /** (vec_id, p1..pk) rounded to 4dp — the reduced-dimension table. */
  def project(
      embeddings: DataFrame,
      model: Model,
      idCol: String = "vec_id",
      embCol: String = "embedding"
  ): DataFrame = {
    val cols = model.components.indices.map(j =>
      round(projCol(model, j, embCol), 4).as(s"p${j + 1}"))
    embeddings.select(col(idCol) +: cols: _*)
  }

  /** Generated DuckDB oracle for [[project]] — same term order, same
    * constants (Double.toString round-trips exactly). */
  def projectSql(
      model: Model,
      table: String = "embeddings",
      idCol: String = "vec_id",
      embCol: String = "embedding"
  ): String = {
    def dbl(x: Double) = s"CAST($x AS DOUBLE)"
    val cols = model.components.indices.map { j =>
      val v = model.components(j)
      val c = v.indices.map(i => v(i) * model.mean(i)).sum
      val sum = v.indices
        .map(i => s"$embCol[${i + 1}] * ${dbl(v(i))}")
        .mkString("(", " + ", s") - ${dbl(c)}")
      s"round($sum, 4) AS p${j + 1}"
    }
    s"SELECT $idCol, ${cols.mkString(", ")} FROM $table"
  }
}
