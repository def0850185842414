package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Convergence + wall-time measurement for the DISTRIBUTED
  * [[graft.ops.DedupDocs.connectedComponents]] fallback (the
  * > `driverEdgeLimit` path) at real edge counts — the round-10 verdict's
  * unproven scale row:
  * `runMain graft.tools.CcBench [nEdges]`
  *
  * Three adversarial graph shapes, each ≥ `nEdges` edges, generated
  * distributedly (never on the driver):
  *  - `cliques`  — forests of 4-cliques (the realistic near-dup shape:
  *    many tiny components, diameter 1);
  *  - `star`     — ONE hub with nEdges leaves (max skew: every leaf's
  *    neighbor-min aggregates into a single groupBy key);
  *  - `chain`    — paths of length 10 000 (diameter adversary: plain
  *    min-propagation needs 10^4 rounds; the pointer-jumping loop must
  *    close it in ~log2 rounds).
  *
  * Emits one line per shape: edges, components found vs expected,
  * convergence rounds, wall seconds. `driverEdgeLimit = 0` forces the
  * distributed loop; correctness is checked by exact distinct-component
  * count (labels are component minima by construction, so the count is a
  * complete verdict for these known topologies).
  */
object CcBench {
  def main(args: Array[String]): Unit = {
    val nEdges = if (args.length > 0) args(0).toLong else 2000000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // each case: (name, docs, pairs, expectedComponents)
    def cliques(): (DataFrame, DataFrame, Long) = {
      // 4-cliques: 6 edges each → nEdges/6 cliques, 4 docs each
      val k = nEdges / 6
      val docs = spark.range(k * 4).select(col("id").as("doc_id"))
      val base = spark.range(k)
      // all 6 unordered pairs within {4c, 4c+1, 4c+2, 4c+3}
      val offs = Seq((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))
      val pairs = base.select(
        explode(array(offs.map { case (a, b) =>
          struct((col("id") * 4 + a).as("doc_a"), (col("id") * 4 + b).as("doc_b"))
        }: _*)).as("p")).select("p.doc_a", "p.doc_b")
      (docs, pairs, k)
    }

    def star(): (DataFrame, DataFrame, Long) = {
      val docs = spark.range(nEdges + 1).select(col("id").as("doc_id"))
      val pairs = spark.range(1, nEdges + 1)
        .select(lit(0L).as("doc_a"), col("id").as("doc_b"))
      (docs, pairs, 1L)
    }

    def chain(): (DataFrame, DataFrame, Long) = {
      val len = 10000L
      val nChains = (nEdges + len - 2) / (len - 1)
      val n = nChains * len
      val docs = spark.range(n).select(col("id").as("doc_id"))
      // edge (i, i+1) unless i is the last node of its chain
      val pairs = spark.range(n)
        .where(pmod(col("id"), lit(len)) =!= (len - 1))
        .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
      (docs, pairs, nChains)
    }

    Seq(("cliques", cliques _), ("star", star _), ("chain", chain _)).foreach {
      case (name, gen) =>
        val (docs, pairs, expected) = gen()
        val e = pairs.count()
        var rounds = 0
        val t0 = System.nanoTime()
        val cc = graft.ops.DedupDocs.connectedComponents(
          docs, pairs, maxIters = 40, driverEdgeLimit = 0L,
          progress = (r, _) => rounds = r)
        val found = cc.agg(countDistinct(col("cluster_id"))).as[Long].head()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"CCBENCH shape=$name%-8s edges=$e%9d components=$found%9d " +
          f"expected=$expected%9d rounds=$rounds%2d ok=${found == expected} sec=$sec%.2f")
    }
    spark.stop()
  }
}
