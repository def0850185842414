package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Goldens are DuckDB `jaro_winkler_similarity` outputs (probed this
  * round) — the oracle engine's exact doubles, asserted bit-for-bit so
  * any variant drift (window floor, boost threshold, degenerate empty
  * cases) fails here before it fails an oracle gate. */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private val goldens = Seq(
    ("MARTHA", "MARHTA", 0.9611111111111111),
    ("DIXON", "DICKSONX", 0.8133333333333332),
    ("JELLYFISH", "SMELLYFISH", 0.8962962962962964),
    ("abc", "abc", 1.0),
    ("", "abc", 0.0),
    ("", "", 0.0), // the common-implementation degenerate, NOT 1.0
    ("a", "b", 0.0),
    ("a", "a", 1.0),
    ("ab", "ba", 0.0), // window 0: same-position matches only
    ("CRATE", "TRACE", 0.7333333333333334),
    ("DwAyNE", "DuANE", 0.8400000000000001),
    ("aXXXXXXX", "aYYYYYYY", 0.4166666666666667), // below boost threshold
    ("prefXq", "prefYw", 0.8666666666666666), // boosted from 0.7778
    ("ABCDEFGH", "ABDCFEHG", 0.9) // transposition counting
  )

  test("kernel matches the DuckDB goldens bit for bit") {
    goldens.foreach { case (a, b, want) =>
      val got = JaroWinkler.sim(a, b)
      assert(java.lang.Double.compare(got, want) == 0, s"sim($a, $b) = $got, want $want")
    }
  }

  test("symmetry and codegen == interpreted over the golden set, incl. NULL") {
    val df = goldens.map { case (a, b, _) => (a, b) }.toDF("a", "b")
    val rows = df
      .select(
        JaroWinkler.jaroWinkler(col("a"), col("b")).as("ab"),
        JaroWinkler.jaroWinkler(col("b"), col("a")).as("ba"))
      .collect()
    rows.zip(goldens).foreach { case (r, (a, b, want)) =>
      assert(java.lang.Double.compare(r.getDouble(0), want) == 0, s"codegen $a/$b")
      assert(java.lang.Double.compare(r.getDouble(1), want) == 0, s"symmetry $a/$b")
    }
    val n = Seq((null.asInstanceOf[String], "x")).toDF("a", "b")
      .select(JaroWinkler.jaroWinkler(col("a"), col("b"))).head()
    assert(n.isNullAt(0))
  }
}
