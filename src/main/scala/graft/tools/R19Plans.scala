package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-19 plan dumps: write `explain("formatted")` for the named
  * queries (default: the round's optimization targets) under
  * `plans/r19/<query>_<suffix>.txt`, at BENCH conditions (sf0.1,
  * 32 shuffle partitions) so Exchange counts / join strategies match
  * what the measured loop runs.
  *
  * Unlike R18Plans, a query that fails to BUILD is skipped per
  * iteration (the r18 spelling's `return` exited main, silently
  * dropping every remaining dump and the spark.stop() — ADVICE r18).
  *
  *   runMain graft.tools.R19Plans <suffix> [queryName ...]
  */
object R19Plans {
  def main(args: Array[String]): Unit = {
    val suffix = if (args.nonEmpty) args(0) else "before"
    val names = if (args.length > 1) args.drop(1).toSeq else Seq(
      "q_rules", "q_item_pairs", "q_semdedup", "q_tetrode", "q_knn_graph",
      "q_curate", "q_lm_bigram", "q_lm_trigram", "q_phrase_search",
      "q_ccnet_buckets", "q_modularity", "q_hybrid_rrf")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    new java.io.File("plans/r19").mkdirs()
    names.foreach { n =>
      // loop operators run driver actions while BUILDING the frame;
      // the returned frame's plan is still the one the bench executes
      val dfOpt =
        try Some(graft.SparkEntry.queries(n)(spark, dir))
        catch {
          case e: Throwable =>
            System.err.println(s"[plans] $n failed to build: ${e.getMessage}")
            None
        }
      dfOpt.foreach { df =>
        val cap = new java.io.ByteArrayOutputStream()
        Console.withOut(new java.io.PrintStream(cap, true, "UTF-8")) {
          df.explain("formatted")
        }
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"plans/r19/${n}_$suffix.txt"), cap.toByteArray)
        println(s"[plans] wrote plans/r19/${n}_$suffix.txt")
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
      graft.util.CacheRegistry.releaseAll()
    }
    spark.stop()
  }
}
