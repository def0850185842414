package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search over the `embeddings` table
  * (`embedding: Array[Float]`). Dot products / norms run through the
  * native codegen'd [[graft.functions.DotF32]] expression in double
  * precision, left-to-right — deterministic, no UDF. (Spark's
  * higher-order functions are interpreted, not codegen'd — that is WHY
  * DotF32 exists; only the cold-path lshBucket projection still uses
  * them.)
  *
  * Scale notes: brute-force top-k broadcasts the (small) query set and
  * scans the corpus once — the right baseline plan. The LSH variant maps
  * each vector to sign-hash buckets of random hyperplanes so candidate
  * generation is a bucket equi-join (shuffle on bucket key), which is the
  * 100 TB path: no n² pair set, no global sort.
  */
object Similarity {

  /** Sequential-order dot product of two float arrays, in double.
    * Native codegen'd expression (graft.functions.DotF32) — same
    * left-to-right accumulation as the HOF formulation
    * `aggregate(zip_with(...))`, minus the per-row intermediate array. */
  def dot(a: Column, b: Column): Column = graft.functions.DotF32.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: for each query vector (`queries` must be
    * small — it is broadcast), the k nearest corpus vectors.
    * Cosine is rounded to 6dp BEFORE ranking, and ties break on vec_id,
    * so the result is engine-independent and oracle-exact. */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int
  ): DataFrame = {
    // per-row norms BEFORE the pair join: 1 array traversal per pair
    // (the dot product) instead of 3. sqrt(dot(x,x)) is the same
    // expression either way — bit-identical cosines.
    val q = queries.select(
      col("vec_id").as("query_id"),
      col("embedding").as("qe"),
      norm(col("embedding")).as("qn")
    )
    val scored = corpus
      .withColumn("cn", norm(col("embedding")))
      .crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("vec_id"),
        round(dot(col("embedding"), col("qe")) / (col("cn") * col("qn")), 6).as("cos_sim")
      )
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "vec_id", "cos_sim", "rank")
  }

  /** Deterministic pseudo-random hyperplane component: md5("p:j") →
    * uniform in [-1, 1). Computed ONCE on the driver (a pure function of
    * (p, j)) — the previous in-expression form re-ran dim × numPlanes
    * md5 digests per corpus ROW, since a lambda variable blocks constant
    * folding. Same construction, same doubles, reproducible in SQL. */
  private def planeComponent(p: Int, j: Int): Double = {
    val digest = java.security.MessageDigest
      .getInstance("MD5")
      .digest(s"$p:$j".getBytes("UTF-8"))
    val hex = digest.take(4).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16).toDouble / 2147483648.0 - 1.0
  }

  /** The (numPlanes × dim) hyperplane matrix — pure function of the
    * indices, computed once on the driver. */
  def planeMatrix(dim: Int, numPlanes: Int): Seq[Seq[Double]] =
    (0 until numPlanes).map(p => (0 until dim).map(j => planeComponent(p, j)))

  /** Sign-LSH bucket key: `numPlanes` sign bits of hyperplane dot
    * products. Native codegen'd expression
    * ([[graft.functions.SignLshBucket]]) — one fused loop over the
    * embedding with the plane matrix as a reference object; same
    * left-to-right double accumulation (and NULL/length edge semantics)
    * as the `numPlanes` interpreted `aggregate(zip_with(...))` chains it
    * replaced, so bucket keys — and the oracle SQL generated from the
    * same constants ([[lshBucketSql]]) — are unchanged. */
  def lshBucket(embedding: Column, dim: Int, numPlanes: Int): Column =
    graft.functions.SignLshBucket.bucket(embedding, planeMatrix(dim, numPlanes))

  /** DuckDB SQL for the [[lshBucket]] key, GENERATED from the same
    * [[planeComponent]] constants so oracle and engine cannot drift.
    * Per plane: a left-to-right literal sum (matching the HOF fold order
    * bit-for-bit — the sign decision at proj ≈ 0 depends on it), every
    * literal CAST AS DOUBLE (bare numeric literals default to DECIMAL in
    * DuckDB and would silently change the arithmetic). */
  def lshBucketSql(embCol: String, dim: Int, numPlanes: Int): String =
    (0 until numPlanes).map { p =>
      val terms = (0 until dim)
        .map(j => s"CAST($embCol[${j + 1}] AS DOUBLE) * CAST(${planeComponent(p, j)} AS DOUBLE)")
        .mkString(" + ")
      s"(CASE WHEN CAST(0 AS DOUBLE) + $terms >= 0 THEN ${1 << p} ELSE 0 END)"
    }.mkString(" + ")

  /** LSH-bucketed near-duplicate pairs: same bucket → candidate → exact
    * cosine filter. Approximate recall, exact precision. */
  def lshNearDupPairs(
      corpus: DataFrame,
      dim: Int,
      numPlanes: Int,
      minCosine: Double
  ): DataFrame = {
    val b = corpus.select(
      col("vec_id"),
      col("embedding"),
      lshBucket(col("embedding"), dim, numPlanes).as("bucket")
    )
    b.as("a")
      .join(
        b.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id")
      )
      .select(
        col("a.vec_id").as("vec_a"),
        col("b.vec_id").as("vec_b"),
        round(cosine(col("a.embedding"), col("b.embedding")), 6).as("cos_sim")
      )
      .where(col("cos_sim") >= minCosine)
  }

  /** Exact near-duplicate pairs above a cosine threshold, blocked by a
    * column (e.g. label) to bound the candidate set. Oracle-exact. */
  def blockedNearDupPairs(corpus: DataFrame, blockCol: String, minCosine: Double): DataFrame = {
    // norms precomputed per row (2n traversals), not per pair (2·pairs)
    val c = corpus.withColumn("__nrm", norm(col("embedding")))
    c.as("a")
      .join(
        c.as("b"),
        col(s"a.$blockCol") === col(s"b.$blockCol") && col("a.vec_id") < col("b.vec_id")
      )
      .select(
        col("a.vec_id").as("vec_a"),
        col("b.vec_id").as("vec_b"),
        round(
          dot(col("a.embedding"), col("b.embedding")) / (col("a.__nrm") * col("b.__nrm")),
          6
        ).as("cos_sim")
      )
      .where(col("cos_sim") >= minCosine)
  }

  /** Hard-negative mining for contrastive training: for each query
    * vector, the k most similar corpus vectors with a DIFFERENT label —
    * the near-miss negatives that carry the gradient signal (easy
    * random negatives are near-orthogonal and teach nothing). Same
    * broadcast-query brute-force baseline plan as [[bruteForceTopK]]
    * with the label-inequality predicate fused into the pair filter;
    * at corpus scale the candidate step swaps to the IVF/LSH bucket
    * paths ([[graft.ops.Ivf]]), negatives filtered per bucket. */
  def hardNegatives(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int
  ): DataFrame = {
    val q = queries.select(
      col("vec_id").as("query_id"),
      col("label").as("query_label"),
      col("embedding").as("qe"),
      norm(col("embedding")).as("qn")
    )
    val scored = corpus
      .withColumn("cn", norm(col("embedding")))
      .crossJoin(broadcast(q))
      .where(col("label") =!= col("query_label"))
      .select(
        col("query_id"),
        col("vec_id"),
        col("label"),
        // + 0.0 folds IEEE -0.0 (a near-orthogonal negative cosine
        // rounded to zero — exactly the easy-negative case) into +0.0;
        // DuckDB's round() can emit -0.0 there and the compare (and
        // the rank order at the boundary) would diverge
        (round(dot(col("embedding"), col("qe")) / (col("cn") * col("qn")), 6) + lit(0.0))
          .as("cos_sim")
      )
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "vec_id", "label", "cos_sim", "rank")
  }

  /** Per-label centroid-distance outlier flags — the embedding-space
    * quality screen (CLIP-score-style filtering, mislabeled-cluster
    * detection) a multimodal curation pipeline runs before training:
    * a vector far from its label's centroid is a labeling or encoding
    * suspect.
    *
    * Determinism contract: the centroid's cross-row per-dim sums go
    * through DECIMAL(20,10) (exact, associative — double sums across
    * Spark partials and a single-threaded oracle would drift), spelled
    * `CAST(CAST(v AS DOUBLE) AS DECIMAL)` so both engines round the
    * float identically. Distances round to 6dp BEFORE the z-score
    * stats, which then use exact DECIMAL(18,6) sums — the
    * [[Anomaly]] recipe.
    *
    * Plan: one posexplode aggregate whose exchange is labels × dims
    * (not corpus-sized), centroids broadcast back as a local relation,
    * distance is a per-row HOF fold in array order, and the z-stats
    * aggregate is labels-sized. The corpus itself never shuffles. */
  def centroidOutliers(embeddings: DataFrame, zThreshold: Double = 2.0): DataFrame = {
    val spark = embeddings.sparkSession
    val ex = embeddings.select(
      col("label"),
      posexplode(col("embedding")).as(Seq("d", "v")))
    val cent = ex
      .groupBy("label", "d")
      .agg((sum(col("v").cast("double").cast("decimal(20,10)")).cast("double") /
        count(lit(1))).as("c"))
      .groupBy("label")
      .agg(expr("transform(array_sort(collect_list(struct(d, c))), x -> x.c)").as("cent"))
    // labels × dims — tiny in any sane labeling; the shared limit-probe
    // recipe ([[graft.util.DriverSide]]) bounds the driver collect
    // against a pathological high-cardinality label column, with a
    // CacheRegistry-tracked persisted fallback past the cap
    val centSide = graft.util.DriverSide.smallSideOrTracked(cent)
    val dist = embeddings
      .join(centSide, "label")
      .select(
        col("vec_id"), col("label"),
        round(
          sqrt(aggregate(
            zip_with(col("embedding"), col("cent"),
              (a, b) => (a.cast("double") - b) * (a.cast("double") - b)),
            lit(0.0), (acc, x) => acc + x)),
          6).as("dist"))
    val decD = col("dist").cast("decimal(18,6)")
    val st = dist
      .groupBy("label")
      .agg(
        count(lit(1)).as("__n"),
        sum(decD).cast("double").as("__s"),
        sum(decD * decD).cast("double").as("__sq"))
      .withColumn("__mean", col("__s") / col("__n"))
      .withColumn("__std",
        sqrt(greatest(col("__sq") / col("__n") - col("__mean") * col("__mean"), lit(0.0))))
      .select("label", "__mean", "__std")
    dist
      .join(broadcast(st), "label")
      .where(col("__std") > 0.0)
      .select(
        col("vec_id"), col("label"), col("dist"),
        // + 0.0 folds IEEE -0.0 (a tiny negative rounded to zero) into
        // +0.0 — DuckDB emits +0.0 for the same value
        (round((col("dist") - col("__mean")) / col("__std"), 4) + lit(0.0)).as("z"),
        (abs(col("dist") - col("__mean")) > lit(zThreshold) * col("__std")).cast("int")
          .as("is_outlier"))
  }

  /** Mutual-kNN graph over a node frame: the symmetric edge set
    * {a, b} where b is in a's cosine top-k AND a is in b's — the
    * standard graph for semantic clustering / manifold steps (mutual
    * edges filter the hub effect a one-directional kNN graph
    * suffers). Exact by construction: it reuses [[bruteForceTopK]]'s
    * 6dp-rounded, vec_id-tie-broken ranking, so the result is
    * engine-independent.
    *
    * Contract: `nodes` must be bounded (both directions of the
    * brute-force pair scan broadcast it — the same contract as every
    * brute-force baseline here). The 100 TB route is candidate
    * generation through the IVF cell join or [[lshNearDupPairs]]
    * buckets, with this exact form as the per-bucket verifier.
    *
    * Output: (a, b) with a < b, `cos_sim`, `rank_ab` (b's rank in
    * a's list), `rank_ba`. */
  def mutualKnn(nodes: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val topk = bruteForceTopK(nodes, nodes, k)
    val fwd = topk.select(
      col("query_id").as("a"), col("vec_id").as("b"),
      col("cos_sim"), col("rank").as("rank_ab"))
    val rev = topk.select(
      col("vec_id").as("a"), col("query_id").as("b"),
      col("rank").as("rank_ba"))
    fwd
      // rev is |nodes|·k narrow rows — strictly within the operator's
      // bounded-nodes contract (the pair scan above already broadcasts
      // the node frame WITH its embeddings, a wider relation); the
      // un-hinted spelling planned a sort-merge join of two stats-less
      // window subtrees (r18 plan audit)
      .join(broadcast(rev), Seq("a", "b"))
      .where(col("a") < col("b"))
      .select("a", "b", "cos_sim", "rank_ab", "rank_ba")
  }
}
