package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-18 plan dumps: write `explain("formatted")` for the named
  * queries (default: the round's optimization targets) under
  * `plans/r18/<query>_<suffix>.txt`, at BENCH conditions (sf0.1,
  * 32 shuffle partitions) so Exchange counts / join strategies match
  * what the measured loop runs.
  *
  *   runMain graft.tools.R18Plans <suffix> [queryName ...]
  */
object R18Plans {
  def main(args: Array[String]): Unit = {
    val suffix = if (args.nonEmpty) args(0) else "before"
    val names = if (args.length > 1) args.drop(1).toSeq else Seq(
      "q_profile", "q_setsim_join", "q_pagerank", "q_rules", "q_modularity",
      "q_bfs_hops", "q_item_pairs", "q_ewma", "q_curate", "q_hybrid_rrf",
      "q_bloom_screen", "q_keywords", "q_phrase_search", "q_lm_trigram",
      "q_ccnet_buckets", "q_kcore", "q_lm_bigram", "q_label_prop",
      "q_dialog_dedup", "q_benford")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    new java.io.File("plans/r18").mkdirs()
    names.foreach { n =>
      // loop operators run driver actions while BUILDING the frame;
      // the returned frame's plan is still the one the bench executes
      val df =
        try graft.SparkEntry.queries(n)(spark, dir)
        catch {
          case e: Throwable =>
            System.err.println(s"[plans] $n failed to build: ${e.getMessage}")
            graft.util.CacheRegistry.releaseAll()
            return
        }
      val cap = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(cap, true, "UTF-8")) {
        df.explain("formatted")
      }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"plans/r18/${n}_$suffix.txt"), cap.toByteArray)
      println(s"[plans] wrote plans/r18/${n}_$suffix.txt")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
      graft.util.CacheRegistry.releaseAll()
    }
    spark.stop()
  }
}
