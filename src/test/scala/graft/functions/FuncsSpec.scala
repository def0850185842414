package graft.functions

import graft.SparkSpec
import graft.spikes.Spikes
import graft.ts.Validation
import org.apache.spark.sql.functions._

class FuncsSpec extends SparkSpec {
  import spark.implicits._

  test("padTo zero-pads and truncates to fixed length") {
    val df = Seq(Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0, 4.0, 5.0)).toDF("a")
    val out = df.select(Funcs.padTo(col("a"), 4)).collect().map(_.getSeq[Double](0))
    assert(out(0) == Seq(1.0, 2.0, 0.0, 0.0))
    assert(out(1) == Seq(1.0, 2.0, 3.0, 4.0))
  }

  test("bitsToMicrovolts applies the SpikeGadgets constant") {
    val df = Seq(8192.toShort).toDF("v")
    val out = df.select(Funcs.bitsToMicrovolts(col("v").cast("double"))).first().getDouble(0)
    assert(math.abs(out - 1024.0) < 1e-9)
  }

  test("frange matches the reference linspace construction") {
    val df = Seq(1).toDF("x")
    val out = df.select(Funcs.frange(lit(0.0), lit(1.0), lit(0.25))).first().getSeq[Double](0)
    assert(out == Seq(0.0, 0.25, 0.5, 0.75))
    // non-divisible range: num = floor(1/0.3) = 3 points of
    // linspace(0, 1, 3, endpoint=False) -> spacing 1/3, NOT step
    val nd = df.select(Funcs.frange(lit(0.0), lit(1.0), lit(0.3))).first().getSeq[Double](0)
    assert(nd.length == 3)
    assert(math.abs(nd(1) - 1.0 / 3.0) < 1e-12 && math.abs(nd(2) - 2.0 / 3.0) < 1e-12)
    // empty range yields an empty array (not [start, start-step])
    val empty = df.select(Funcs.frange(lit(5.0), lit(5.0), lit(1.0))).first().getSeq[Double](0)
    assert(empty.isEmpty)
  }

  test("requestRange validates against session bounds then slices") {
    val df = (0L to 100L).toDF("ts")
    val ok = Validation.requestRange(df, "ts", 10, 20, 0, 100)
    assert(ok.count() == 11)
    intercept[IllegalArgumentException] {
      Validation.requestRange(df, "ts", 10, 200, 0, 100)
    }
  }

  test("common average reference subtracts per-ts channel mean") {
    val df = Seq((0L, 0, 1.0), (0L, 1, 3.0), (1L, 0, 10.0), (1L, 1, 20.0))
      .toDF("ts", "channel", "value")
    val car = Spikes.commonAverageReference(df, "ts", "value")
      .orderBy("ts").collect().map(_.getDouble(1))
    assert(car.toSeq == Seq(2.0, 15.0))
    val sub = Spikes.subtractCar(df, "ts", "value")
      .orderBy("ts", "channel").collect().map(_.getDouble(2))
    assert(sub.toSeq == Seq(-1.0, 1.0, -5.0, 5.0))
  }
}
