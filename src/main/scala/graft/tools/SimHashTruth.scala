package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.DedupDocs

/** Oracle-INDEPENDENT witness for the SimHash near-dup family — the
  * lesson of the r8 MinHash seed-family bug (a kernel degeneracy that
  * stayed oracle-green because the generated DuckDB oracle spelled the
  * same wrong formula; only ScreenBench's exact-Jaccard truth path
  * caught it). This gives the OTHER fuzzy-dedup family the same second
  * check, three layers deep:
  *
  *  1. KERNEL witness — every simhash64 recomputed on the driver from
  *     the published algorithm (plain String split + MessageDigest +
  *     big-endian 8-byte token hash, per-bit majority vote), sharing no
  *     code path with the UTF8String byte-walking kernel. A degeneracy
  *     like the MinHash missing-mod (every signature one hash repeated)
  *     shows up as mass mismatches here.
  *  2. BANDING witness — [[DedupDocs.simhashNearDupPairs]]' banded
  *     candidates vs BRUTE-FORCE all-pairs Hamming ≤ 3: pigeonhole over
  *     four 16-bit bands makes banding lossless at that radius, so
  *     precision = recall = 1.0 exactly or the banding is wrong.
  *  3. SEMANTIC table — brute-force Hamming ≤ h (h = 0..6, banding out
  *     of the loop) scored against EXACT 3-shingle Jaccard ≥ minJ truth
  *     (driver inverted index — no LSH, no Spark expression in the
  *     truth path) on the boilerplate-injected corpus: the ScreenBench
  *     precision/recall shape, showing where the Hamming knob sits on
  *     the Jaccard axis. A degenerate simhash (all-equal or
  *     few-distinct values) craters this precision instantly.
  *
  * `runMain graft.tools.SimHashTruth [sfDir] [fraction] [maxDocs] [minJ]`
  */
object SimHashTruth {
  private val K = 3

  /** Driver-side simhash from the published construction: single-space
    * split (empty tokens included), MD5 per token OCCURRENCE, token
    * hash = digest's first 8 bytes big-endian, bit b set iff more than
    * half the tokens vote 1 at b. Deliberately String-based — an
    * independent twin of the kernel's byte-walk, not a transliteration. */
  private def simhashRef(text: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val counts = new Array[Int](64)
    val toks = text.split(" ", -1)
    toks.foreach { t =>
      val th = java.nio.ByteBuffer.wrap(md.digest(t.getBytes("UTF-8"))).getLong
      var b = 0
      while (b < 64) { if (((th >>> b) & 1L) == 1L) counts(b) += 1; b += 1 }
    }
    var sim = 0L
    var b = 0
    while (b < 64) { if (2L * counts(b) > toks.length) sim |= 1L << b; b += 1 }
    sim
  }

  private def pr(pred: Set[(Long, Long)], truth: Set[(Long, Long)]): (Double, Double) = {
    val tp = (pred & truth).size.toDouble
    (if (pred.isEmpty) 1.0 else tp / pred.size,
      if (truth.isEmpty) 1.0 else tp / truth.size)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val fraction = if (args.length > 1) args(1).toDouble else 0.3
    val maxDocs = if (args.length > 2) args(2).toInt else 2000
    val minJ = if (args.length > 3) args(3).toDouble else 0.5
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = BoilerplateGen
      .inject(graft.model.Tables.documents(spark, sfDir), fraction, nTemplates = 8)
      .select("doc_id", "text")
      .orderBy("doc_id")
      .limit(maxDocs)
      .persist()
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    println(s"docs=${rows.length} fraction=$fraction minJ=$minJ sf=$sfDir")

    // ---- 1. kernel witness ----
    val engine = DedupDocs.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ref = rows.map { case (id, t) => id -> simhashRef(t) }.toMap
    val mismatches = ref.count { case (id, h) => engine(id) != h }
    val distinct = ref.values.toSet.size
    println(s"kernel witness: ${ref.size} docs recomputed independently, " +
      s"$mismatches mismatches, $distinct distinct simhash values")
    require(mismatches == 0, "engine simhash64 diverges from the independent recompute")

    // ---- 2. banding witness (brute-force Hamming vs banded pairs) ----
    val ids = rows.map(_._1).sorted
    def brutePairs(maxH: Int): Set[(Long, Long)] = {
      val out = Set.newBuilder[(Long, Long)]
      var i = 0
      while (i < ids.length) {
        var j = i + 1
        while (j < ids.length) {
          if (java.lang.Long.bitCount(ref(ids(i)) ^ ref(ids(j))) <= maxH)
            out += ((ids(i), ids(j)))
          j += 1
        }
        i += 1
      }
      out.result()
    }
    val banded = DedupDocs.simhashNearDupPairs(docs, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute3 = brutePairs(3)
    val (bp, br) = pr(banded, brute3)
    println(f"banding witness: banded=${banded.size} brute=${brute3.size} " +
      f"precision=$bp%.4f recall=$br%.4f (pigeonhole ⇒ both must be 1.0)")
    require(bp == 1.0 && br == 1.0, "banded pairs diverge from brute-force Hamming")

    // ---- 3. semantic table vs exact Jaccard truth ----
    // distinct K-shingle sets per doc (the DedupDocs.shingles contract:
    // docs under K tokens contribute none), interned to ints
    val intern = new java.util.HashMap[String, Integer]()
    val shingleSets = rows.map { case (id, t) =>
      val toks = t.split(" ", -1)
      val set = new java.util.HashSet[Int]()
      var i = 0
      while (i + K <= toks.length) {
        val s = toks.slice(i, i + K).mkString(" ")
        var code = intern.get(s)
        if (code == null) { code = intern.size(); intern.put(s, code) }
        set.add(code)
        i += 1
      }
      id -> set
    }.toMap
    // inverted index → co-occurrence counts → exact Jaccard
    val byShingle = new java.util.HashMap[Int, java.util.ArrayList[Long]]()
    shingleSets.toSeq.sortBy(_._1).foreach { case (id, set) =>
      set.forEach { s =>
        var l = byShingle.get(s)
        if (l == null) { l = new java.util.ArrayList[Long](); byShingle.put(s, l) }
        l.add(id)
      }
    }
    val co = scala.collection.mutable.HashMap.empty[(Long, Long), Int]
    byShingle.values.forEach { l =>
      var i = 0
      while (i < l.size()) {
        var j = i + 1
        while (j < l.size()) {
          val key = (math.min(l.get(i), l.get(j)), math.max(l.get(i), l.get(j)))
          co(key) = co.getOrElse(key, 0) + 1
          j += 1
        }
        i += 1
      }
    }
    val truthSet = co.collect {
      case ((a, b), inter)
          if {
            val union = shingleSets(a).size + shingleSets(b).size - inter
            union > 0 && inter.toDouble / union >= minJ
          } =>
        (a, b)
    }.toSet
    println(s"exact-Jaccard truth pairs (J >= $minJ): ${truthSet.size}")
    println("| hamming ≤ h | predicted pairs | precision | recall |")
    (0 to 6).foreach { h =>
      val pred = brutePairs(h)
      val (p, r) = pr(pred, truthSet)
      println(f"| $h | ${pred.size} | $p%.3f | $r%.3f |")
    }
    spark.stop()
  }
}
