package graft.ops

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest-neighbor search: partition the
  * corpus into `nLists` Voronoi cells (k-means centroids), store each
  * vector under its cell, and at query time scan only the `nProbe`
  * closest cells. This is the classic scale path for ANN over billions of
  * vectors: candidate generation is a bucket equi-join on cell id
  * (shuffle on a small key), and the expensive exact scoring touches only
  * `nProbe/nLists` of the corpus.
  *
  * With `nProbe == nLists` results are exactly the brute-force top-k —
  * which is how the oracle checks this operator.
  */
object Ivf {

  /** Train centroids (seeded, deterministic input order) and return the
    * corpus with a `cell` column. */
  def assignCells(corpus: DataFrame, nLists: Int, seed: Long = 42L): (DataFrame, DataFrame) = {
    val spark = corpus.sparkSession
    val toVec = udf((a: Seq[Float]) => Vectors.dense(a.map(_.toDouble).toArray))
    val withFeat = corpus.withColumn("features", toVec(col("embedding")))
    val km = new KMeans().setK(nLists).setSeed(seed).setMaxIter(5)
    val model = km.fit(withFeat)
    val assigned = model.transform(withFeat).withColumnRenamed("prediction", "cell")
    val centroids = spark.createDataFrame(
      model.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray) }.toSeq
    ).toDF("cell", "centroid")
    (assigned.drop("features"), centroids)
  }

  /** Top-k per query via IVF probing. `queries` small (broadcast). */
  def topK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nLists: Int,
      nProbe: Int,
      seed: Long = 42L
  ): DataFrame = {
    val (assigned, centroids) = assignCells(corpus, nLists, seed)
    // rank cells per query by centroid distance, keep nProbe
    val qc = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      .crossJoin(broadcast(centroids))
      .withColumn(
        "cdist",
        aggregate(
          zip_with(col("qe"), col("centroid"), (a, b) => (a.cast("double") - b) * (a.cast("double") - b)),
          lit(0.0),
          (acc, v) => acc + v
        )
      )
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("cdist").asc, col("cell").asc)
    val probed = qc
      .withColumn("crank", row_number().over(w))
      .where(col("crank") <= nProbe)
      .select("query_id", "qe", "cell")
    // candidate join on cell, exact cosine, top-k
    val scored = assigned
      .join(probed, "cell")
      .where(col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("vec_id"),
        round(Similarity.cosine(col("embedding"), col("qe")), 6).as("cos_sim")
      )
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(wr))
      .where(col("rank") <= k)
      .select("query_id", "vec_id", "cos_sim", "rank")
  }
}
