package graft.spikes

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tetrode waveform assembly (G6, jagular/spikes.py:188-237): for shared
  * spike times, gather a patch per channel, concatenate the per-channel
  * patches into one `n_channels × patch` vector, drop spikes whose
  * waveform leaves (−maxAmplitude, +maxAmplitude) on ANY sample (P4,
  * spikes.py:229-230), convert times to seconds.
  *
  * Edge padding is TRAILING-ONLY zeros, as the reference pads
  * (np.pad(patch, (0, n)), spikes.py:420-423). One deliberate deviation:
  * for a peak so close to the stream start that `centered - size < 0`,
  * the reference's `data[centered-size : centered+size]` slice wraps the
  * negative index (a numpy artifact) and yields an EMPTY patch — an
  * all-zero waveform after padding. This engine keeps the samples that
  * do exist and zero-pads the remainder instead of discarding them.
  *
  * Input is long-layout multichannel data `(channel, idx, value)`; the
  * patch gather is the same broadcast range join as
  * [[Spikes.extractPatches]], grouped by (peak, channel).
  */
object Tetrode {

  /** Exploded form (one row per sample) — oracle-friendly.
    * Output: (peak_idx, channel, offset, value, time_s). */
  def formTetrodeExploded(
      samples: DataFrame,
      peaks: DataFrame,
      idxCol: String,
      channelCol: String,
      valueCol: String,
      halfWidth: Int,
      maxAmplitude: Double,
      sampRate: Double
  ): DataFrame = {
    // exploded-peak-index equi-join (see Spikes.extractPatches: a
    // range-condition join would be a BroadcastNestedLoopJoin); the peak
    // side is broadcast only when its counted size fits the session
    // threshold — a dense peak stream falls back to a shuffled equi-join
    val projected = peaks.select(col(idxCol).as("peak_idx"))
    val nPeaks = projected.count()
    val p = projected
      .select(
        col("peak_idx"),
        explode(sequence(lit(-halfWidth.toLong), lit((halfWidth - 1).toLong))).as("__off")
      )
    val patches = samples
      .join(
        Spikes.broadcastIfSmall(p, nPeaks * 2L * halfWidth),
        col(idxCol) === col("peak_idx") + col("__off")
      )
      .select(
        col("peak_idx"),
        col(channelCol).as("channel"),
        (col(idxCol) - col("peak_idx")).as("offset"),
        col(valueCol).as("value")
      )
    // P4: keep spikes whose every sample (all channels) is in range
    val ok = patches
      .groupBy("peak_idx")
      .agg(max(abs(col("value"))).as("__maxabs"))
      .where(col("__maxabs") < maxAmplitude)
      .select("peak_idx")
    patches
      // `ok` is bounded by the peak count already measured for the
      // explode gate above — the un-hinted spelling planned a
      // sort-merge join against the stats-less aggregate (r18 plan
      // audit); past the session threshold a dense peak stream keeps
      // the shuffled join, same degrade as the patch gather
      .join(Spikes.broadcastIfSmall(ok, nPeaks), "peak_idx")
      .withColumn("time_s", round(col("peak_idx") / sampRate, 9))
  }

  /** Assembled form: one row per spike with the concatenated
    * channel-major waveform vector (channel 0 patch, then channel 1, …)
    * — the reference's `n_channels*patch_size` recarray layout
    * (spikes.py:232-235). */
  def formTetrode(
      samples: DataFrame,
      peaks: DataFrame,
      idxCol: String,
      channelCol: String,
      valueCol: String,
      halfWidth: Int,
      maxAmplitude: Double,
      sampRate: Double
  ): DataFrame = {
    val patchLen = 2 * halfWidth
    formTetrodeExploded(samples, peaks, idxCol, channelCol, valueCol, halfWidth, maxAmplitude, sampRate)
      .groupBy("peak_idx", "time_s", "channel")
      .agg(
        transform(
          array_sort(collect_list(struct(col("offset"), col("value")))),
          s => s.getField("value")
        ).as("chpatch")
      )
      // F10: zero-pad stream-edge patches to the fixed patch size
      // (jagular/spikes.py:420-423)
      .withColumn("chpatch", graft.functions.Funcs.padTo(col("chpatch"), patchLen))
      .groupBy("peak_idx", "time_s")
      .agg(
        flatten(
          transform(
            array_sort(collect_list(struct(col("channel"), col("chpatch")))),
            s => s.getField("chpatch")
          )
        ).as("spikes")
      )
      .select(col("time_s").as("times"), col("spikes"), col("peak_idx"))
  }
}
