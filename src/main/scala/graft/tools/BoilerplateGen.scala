package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Inject web-corpus-style boilerplate into a documents table —
  * `runMain graft.tools.BoilerplateGen <srcDir> <outDir> [fraction] [nTemplates]`.
  *
  * The copy-salted ScaleGen corpus replicates the 1× shingle doc-freq
  * distribution (max df ≤ 50 at 100×), so `maxDocFreq` has nothing to do
  * there. Real web corpora are different: license headers, navigation
  * text, and templated footers put the SAME n-grams in thousands of
  * documents, and those shingles are exactly the quadratic-pair,
  * zero-signal fan-out the cap exists to drop. This tool recreates that
  * shape deterministically: `fraction` of docs (md5-selected) get one of
  * `nTemplates` fixed 12-token sentences appended. With the defaults on
  * the 100× corpus each (source, template)-shingle lands in ~250 docs —
  * ~50M extra pair rows uncapped, all of them dropped at maxDocFreq=50.
  * Only documents.parquet is written; NgramCapBench points at the dir.
  */
object BoilerplateGen {

  /** The injection itself, shared with [[ScreenBench]]: `fraction` of
    * docs (md5-selected) get one of `nTemplates` fixed 12-token
    * boilerplate sentences appended. */
  def inject(docs: org.apache.spark.sql.DataFrame, fraction: Double, nTemplates: Int)
      : org.apache.spark.sql.DataFrame = {
    val template = concat_ws(" ",
      (0 until 12).map(i => concat(lit(s"bp${i}x"), col("__tpl"))): _*)
    val sel = abs(hash(col("doc_id"), lit(20260813))) % 1000000
    docs
      .withColumn("__tpl",
        when(sel < (fraction * 1000000).toLong,
          (abs(hash(col("doc_id"), lit(7))) % nTemplates).cast("string")))
      .withColumn("text",
        when(col("__tpl").isNotNull, concat_ws(" ", col("text"), template))
          .otherwise(col("text")))
      .drop("__tpl")
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BoilerplateGen <srcDir> <outDir> [fraction] [nTemplates]")
    val src = args(0)
    val out = args(1)
    val fraction = if (args.length > 2) args(2).toDouble else 0.08
    val nTemplates = if (args.length > 3) args(3).toInt else 8
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 12-token templates built from a template id — token identity only
    // matters within the corpus, so synthetic words are fine
    inject(spark.read.parquet(s"$src/documents.parquet"), fraction, nTemplates)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    spark.stop()
  }
}
