package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-bisect diagnostic for SetSim.jaccardSelfJoin (dev-only). */
object ProfSetSim {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val c = col("doc_id") % 97
    val toks = transform(
      sequence(lit(0L), lit(11L)),
      j => concat(lit("s"),
        when(j === col("doc_id") % 12, c * 100 + 50 + j)
          .otherwise(c * 100 + j).cast("string")))
    val dfRaw = graft.model.Tables.documents(spark, dir).select(col("doc_id"), toks.as("toks"))
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    dfRaw.write.format("noop").mode("overwrite").save() // warm scan
    time("full UNCACHED noop")(
      graft.ops.SetSim.jaccardSelfJoin(dfRaw, "doc_id", "toks", 0.7)
        .write.format("noop").mode("overwrite").save())
    time("full UNCACHED noop again")(
      graft.ops.SetSim.jaccardSelfJoin(dfRaw, "doc_id", "toks", 0.7)
        .write.format("noop").mode("overwrite").save())
    val df = dfRaw
    df.cache().count()
    // replicate internals for bisection
    val docs = df.select(col("doc_id").cast("long").as("__id"),
        array_distinct(col("toks")).as("__toks"))
      .withColumn("__m", size(col("__toks")).cast("long"))
    time("docs.count")(docs.count())
    val tok = docs.select(col("__id"), explode(col("__toks")).as("__t"))
    val freq = tok.groupBy("__t").agg(count(lit(1)).as("__df"))
    time("freq.count")(freq.count())
    val ordered = tok.join(freq, "__t").groupBy("__id")
      .agg(sort_array(collect_list(struct(col("__df"), col("__t")))).as("__ord"))
      .select(col("__id"), transform(col("__ord"), x => x.getField("__t")).as("__sorted"))
      .withColumn("__m", size(col("__sorted")).cast("long"))
      .withColumn("__p", (col("__m") - (lit(7L) * col("__m") + lit(9)) / lit(10) + 1).cast("int"))
    time("orderedPrefix.count")(ordered.count())
    val pref = ordered.select(col("__id"), explode(slice(col("__sorted"), lit(1), col("__p"))).as("__t"))
    time("prefix.count")(pref.count())
    val buckets = pref.groupBy("__t")
      .agg(graft.functions.CappedLongSet.cappedSet(col("__id"), 4096).as("__ids"))
      .where(col("__ids").isNotNull && size(col("__ids")) > 1)
    time("buckets.count")(buckets.count())
    val pairsOf = {
      val s2 = col("__ids")
      flatten(transform(s2, (a, i) =>
        transform(slice(s2, i + 2, size(s2)), b => struct(a.as("a"), b.as("b")))))
    }
    val exploded = buckets.select(explode(pairsOf).as("__pr"))
    time("pairExplode.count")(exploded.count())
    val cand = exploded.select(col("__pr.a").as("id_a"), col("__pr.b").as("id_b")).distinct()
    time("candDistinct.count")(cand.count())
    val sides = docs.select(col("__id"), col("__toks"), col("__m"))
    val out = cand
      .join(sides.toDF("id_a", "__ta", "__ma"), "id_a")
      .join(sides.toDF("id_b", "__tb", "__mb"), "id_b")
      .withColumn("inter", size(array_intersect(col("__ta"), col("__tb"))).cast("long"))
      .withColumn("uni", col("__ma") + col("__mb") - col("inter"))
      .where(lit(10) * col("inter") >= lit(7) * col("uni"))
    time("verify.count")(out.count())
    time("full operator")(
      graft.ops.SetSim.jaccardSelfJoin(df, "doc_id", "toks", 0.7).count())
    time("full operator again")(
      graft.ops.SetSim.jaccardSelfJoin(df, "doc_id", "toks", 0.7).count())
    spark.stop()
  }
}
