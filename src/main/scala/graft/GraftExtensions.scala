package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CdcChunks, CharClassRuns, DotF32, DotI8, FftPowerBins, JaroWinkler, Md5Top60, MinHashSig, NfcNormalize, PercentDecodeUnreserved, PolyHash, ShingleArray, SimHash64, WinnowFps}

/** SparkSessionExtensions entry point: enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` to get the
  * engine's native functions (SQL included) and optimizer rules in every
  * session. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        FunctionIdentifier("dot_f32"),
        new ExpressionInfo(classOf[DotF32].getName, "dot_f32"),
        DotF32.builder(_)
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("poly_hash"),
        new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
        PolyHash.builder(_)
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("minhash_sig"),
        new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
        MinHashSig.builder(_)
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("simhash64"),
        new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
        SimHash64.builder(_)
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("shingle_array"),
        new ExpressionInfo(classOf[ShingleArray].getName, "shingle_array"),
        ShingleArray.builder(_)
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("char_class_runs"),
        new ExpressionInfo(classOf[CharClassRuns].getName, "char_class_runs"),
        CharClassRuns.builder(_)
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("dot_i8"),
        new ExpressionInfo(classOf[DotI8].getName, "dot_i8"),
        DotI8.builder(_)
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("nfc_normalize"),
        new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
        NfcNormalize.builder(_)
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("fft_power_bins"),
        new ExpressionInfo(classOf[FftPowerBins].getName, "fft_power_bins"),
        FftPowerBins.builder(_)
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("fft_complex_bins"),
        new ExpressionInfo(classOf[graft.functions.FftComplexBins].getName, "fft_complex_bins"),
        graft.functions.FftComplexBins.builder(_)
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("winnow_fps"),
        new ExpressionInfo(classOf[WinnowFps].getName, "winnow_fps"),
        WinnowFps.builder(_)
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("cdc_chunks"),
        new ExpressionInfo(classOf[CdcChunks].getName, "cdc_chunks"),
        CdcChunks.builder(_)
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("jaro_winkler"),
        new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
        JaroWinkler.builder(_)
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("md5_top60"),
        new ExpressionInfo(classOf[Md5Top60].getName, "md5_top60"),
        Md5Top60.builder(_)
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("percent_decode_unreserved"),
        new ExpressionInfo(classOf[PercentDecodeUnreserved].getName, "percent_decode_unreserved"),
        PercentDecodeUnreserved.builder(_)
      )
    )
    // bounded-range gather joins → exploded equi-joins (kills the BNLJ)
    ext.injectOptimizerRule(_ => graft.plans.RangeGatherRewrite)
  }
}
