package graft.dsp

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FirSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  test("lowpass coefficients: odd, symmetric, unity DC gain") {
    val h = Fir.lowpassCoeffs(9, 0.25)
    assert(h.length == 9)
    (0 until 4).foreach(i => assert(math.abs(h(i) - h(8 - i)) < 1e-15))
    assert(math.abs(h.sum - 1.0) < 1e-12)
    // lowpass: center tap dominates
    assert(h(4) == h.max)
  }

  test("zero-phase: DC signal preserved in the interior, delay-free peak") {
    import spark.implicits._
    val n = 64
    // DC = 5.0 plus an impulse at position 32
    val df = (0 until n)
      .map(i => (1, i.toLong, if (i == 32) 15.0 else 5.0))
      .toDF("k", "t", "v")
    val h = Fir.lowpassCoeffs(9, 0.25)
    val out = Fir
      .zeroPhase(df, h, Seq("k"), "t", "v")
      .orderBy("t")
      .collect()
      .map(r => r.getLong(1) -> r.getDouble(2))
      .toMap
    // interior DC samples (away from edges and the impulse) stay 5.0
    assert(math.abs(out(16L) - 5.0) < 1e-12)
    assert(math.abs(out(48L) - 5.0) < 1e-12)
    // impulse response is centered: output peaks AT the impulse position
    // (zero phase), and is symmetric around it
    val peak = out.maxBy(_._2)._1
    assert(peak == 32L)
    (1 to 4).foreach { d =>
      assert(math.abs(out(32L - d) - out(32L + d)) < 1e-12)
    }
  }

  test("decimateFir keeps every q-th row per key") {
    import spark.implicits._
    val df = (0 until 40).map(i => (i % 2, i.toLong, i.toDouble)).toDF("k", "t", "v")
    val out = Fir.decimateFir(df, q = 4, numTaps = 9, Seq("k"), "t", "v")
    // 20 rows per key, positions 0,4,8,12,16 kept => 5 per key
    assert(out.count() == 10)
    assert(out.groupBy("k").count().collect().forall(_.getLong(1) == 5))
  }

  test("firSql mirrors firColumn bit-for-bit on the same data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = (0 until 100).map(i => (1, i.toLong, rnd.nextDouble() * 10 - 5)).toDF("k", "t", "v")
    df.createOrReplaceTempView("fir_probe")
    val h = Fir.lowpassCoeffs(9, 0.4)
    val viaColumn = Fir
      .zeroPhase(df, h, Seq("k"), "t", "v")
      .select("t", "v")
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
    val sql = s"SELECT t, ${Fir.firSql(h, "v", "k", "t")} AS v FROM fir_probe"
    val viaSql = spark
      .sql(sql)
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
    viaColumn.foreach { case (t, v) => assert(v == viaSql(t), s"t=$t") }
  }
}
