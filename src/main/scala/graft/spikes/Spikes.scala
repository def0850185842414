package graft.spikes

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Spike-detection chain (jagular/spikes.py): MAD threshold → threshold
  * crossings with a ≥2-consecutive-samples rule → refractory censor →
  * patch extraction. Everything except censor is declarative; censor is a
  * loop-carried fold run per segment.
  */
object Spikes {

  /** Robust MAD threshold (A3, jagular/spikes.py:239-258, Quiroga rule):
    * `multiplier * median(|x| / 0.6745)`. Exact median so the DuckDB
    * oracle computes the bit-identical double. Returns a 1-row DF. */
  def madThreshold(df: DataFrame, valueCol: String, multiplier: Double): DataFrame =
    df.agg((expr(s"median(abs($valueCol) / 0.6745D)") * multiplier).as("threshold"))

  /** Threshold crossings (P5+W2, jagular/spikes.py:339-375): sample indices
    * where the signal crosses `threshold` AND the next sample index is
    * consecutive and also crossing — i.e. the start of a run of ≥2
    * crossing samples. Polarity 'pos' keeps `x > thr`, 'neg' keeps
    * `x < -thr`.
    *
    * Implemented as a self-join on `idx + 1` instead of a global window:
    * an equi-join shuffles by key and scales; a keyless ordered window
    * would serialize. (The reference's `diff(below) == 1` on the
    * crossing-index array, spikes.py:368-373.)
    */
  def crossings(
      df: DataFrame,
      idxCol: String,
      valueCol: String,
      threshold: Double,
      polarity: String = "pos",
      keys: Seq[String] = Nil
  ): DataFrame = {
    val pred = polarity match {
      case "pos" => col(valueCol) > threshold
      case "neg" => col(valueCol) < -threshold
      case "both" => abs(col(valueCol)) > threshold
      case other => throw new IllegalArgumentException(s"polarity $other")
    }
    // keys (channel/tetrode) are part of the join: without them a
    // multichannel stream would pair crossings ACROSS channels, and the
    // keys would be missing from the output for downstream censor/gather
    val hits = df.where(pred).select((keys.map(col) :+ col(idxCol) :+ col(valueCol)): _*)
    val cond = keys
      .map(k => col(s"a.$k") === col(s"b.$k"))
      .foldLeft(col(s"a.$idxCol") + 1 === col(s"b.$idxCol"))(_ && _)
    hits
      .as("a")
      .join(hits.as("b"), cond)
      .select(
        (keys.map(k => col(s"a.$k").as(k)) :+
          col(s"a.$idxCol").as(idxCol) :+ col(s"a.$valueCol").as(valueCol)): _*
      )
  }

  /** Refractory censor (W3, jagular/spikes.py:303-337): ordered fold that
    * keeps an event only if it is at least `width` after the last KEPT
    * event — `[110,111,112,120,270,271,280] → [110,270]` (docstring
    * fixture, spikes.py:322-327). Loop-carried state ⇒ not a window
    * function.
    *
    * Runs per `keys` group (segment / channel): repartition by key, sort
    * within partitions by (keys, idx), and fold each group in one pass —
    * groups never straddle partitions, state resets on key change.
    * Embarrassingly parallel across keys.
    *
    * Scale note (keys = Nil): a truly global censor is inherently
    * sequential (each decision depends on the last KEPT event), so the
    * keyless path deliberately runs in one task. That is fine in
    * practice: censor consumes the crossing/peak stream, which is sparse
    * (orders of magnitude smaller than the sample stream); the heavy
    * stages before it are fully parallel. At 100 TB, partition by
    * channel/tetrode (the reference's own unit of work) as `keys`.
    */
  def censor(df: DataFrame, idxCol: String, width: Long, keys: Seq[String]): DataFrame = {
    val cols = df.columns
    val idxPos = cols.indexOf(idxCol)
    require(idxPos >= 0, s"no column $idxCol")
    val keyPos = keys.map(k => cols.indexOf(k))
    require(keyPos.forall(_ >= 0), s"missing key in ${keys.mkString(",")}")

    val arranged =
      if (keys.isEmpty)
        df.coalesce(1).sortWithinPartitions(col(idxCol))
      else
        df.repartition(keys.map(col): _*)
          .sortWithinPartitions((keys :+ idxCol).map(col): _*)

    val schema = arranged.schema
    val keyTypes = keyPos.map(i => schema(i).dataType)
    // InternalRow fold (no external-Row boxing); kept rows are copied out
    // of the reused UnsafeRow iterator slot.
    val rdd = org.apache.spark.sql.graftbridge.Bridge.toInternalRdd(arranged).mapPartitions { it =>
      import org.apache.spark.sql.catalyst.InternalRow
      var curKey: Seq[Any] = null
      var lastKept = Long.MinValue
      it.flatMap { r =>
        // copyValue: the sort/spill iterator reuses the UnsafeRow, so a
        // non-primitive key (UTF8String...) kept across rows would be a
        // view into overwritten bytes
        val k = keyPos.indices.map(i => InternalRow.copyValue(r.get(keyPos(i), keyTypes(i))))
        if (curKey == null || k != curKey) { curKey = k; lastKept = Long.MinValue }
        val idx = r.getLong(idxPos)
        if (lastKept == Long.MinValue || idx - lastKept >= width) {
          lastKept = idx
          Some(r.copy())
        } else None
      }
    }
    org.apache.spark.sql.graftbridge.Bridge.internalCreateDataFrame(df.sparkSession, rdd, schema)
  }

  /** Broadcast `df` only when `rows` rows of its schema provably fit the
    * session's `autoBroadcastJoinThreshold` (UnsafeRow footprint ≈ 8 B
    * null-bit word + 8 B per fixed-width field). An unconditional
    * `broadcast()` hint is a scale cliff: Spark honors it regardless of
    * size, so a peak stream that is sparse at test scale but large at
    * 100 TB would OOM the driver instead of degrading to a shuffle
    * join. Callers pass an EXACT `rows` (one O(peaks) count job — noise
    * next to the sample scan the join feeds). */
  private[graft] def broadcastIfSmall(df: DataFrame, rows: Long): DataFrame = {
    val thr = df.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    val bytes = rows * (8L + 8L * df.schema.size)
    if (thr > 0 && bytes <= thr) broadcast(df) else df
  }

  /** Common average reference (A4, jagular/spikes.py:92-117): the mean
    * across channels at each timestamp, and the per-sample CAR-subtracted
    * signal. The mean goes through DECIMAL so it is independent of
    * aggregation order (oracle-exact); one shuffle on ts. */
  def commonAverageReference(
      df: DataFrame,
      tsCol: String,
      valueCol: String
  ): DataFrame =
    df.groupBy(col(tsCol))
      .agg(
        (sum(col(valueCol).cast("decimal(18,2)")).cast("double") / count(lit(1)))
          .as("car")
      )

  /** CAR-subtracted signal: value − mean-across-channels(ts). */
  def subtractCar(df: DataFrame, tsCol: String, valueCol: String): DataFrame =
    df.join(commonAverageReference(df, tsCol, valueCol), tsCol)
      .withColumn(valueCol, col(valueCol) - col("car"))
      .drop("car")

  /** Patch gather around peaks (W4/J3, jagular/spikes.py:377-425): for each
    * peak index, collect `2*halfWidth` samples at
    * `[peak - halfWidth, peak + halfWidth)`, zero-padded at stream edges.
    *
    * Implemented by EXPLODING each peak into its 2·halfWidth wanted
    * sample indices and hash-joining on the exact index — a codegen'd
    * equi-join, NOT a range-condition join (which Spark can only
    * execute as a BroadcastNestedLoopJoin: O(samples × peaks)
    * predicate evaluations). The exploded peak side is broadcast ONLY
    * when its counted size fits the session broadcast threshold
    * (peaks ≪ samples in the typical sparse-spike regime: one scan of
    * the samples, one hash probe per sample); a dense peak stream
    * degrades to a plain shuffled equi-join on `__join_idx` instead of
    * OOMing the driver.
    * Output one row per EXISTING (peak, offset) sample — exploded form,
    * exactly comparable by an SQL oracle; offsets beyond the stream
    * edge are simply absent (fixed-size zero padding is the assembly
    * step's job — `Funcs.padTo`, as in Tetrode.formTetrode).
    *
    * `keys` (channel/tetrode) join and carry through, so a multichannel
    * stream gathers each peak only from its own channel. */
  def extractPatches(
      samples: DataFrame,
      peaks: DataFrame,
      idxCol: String,
      valueCol: String,
      halfWidth: Int,
      keys: Seq[String] = Nil,
      // callers that already know the peak cardinality (a censored
      // stream they just counted, a catalog row count) pass it here to
      // skip the guard's extra O(peaks-pipeline) count job
      peakCountHint: Option[Long] = None
  ): DataFrame = {
    val projected = peaks.select((keys.map(col) :+ col(idxCol).as("peak_idx")): _*)
    val nPeaks = peakCountHint.getOrElse(projected.count())
    val p = projected
      .select(
        (keys.map(col) :+ col("peak_idx") :+
          explode(sequence(lit(-halfWidth.toLong), lit((halfWidth - 1).toLong))).as("offset")): _*
      )
      .withColumn("__join_idx", col("peak_idx") + col("offset"))
      // rename peak-side keys so the join condition is unambiguous
      .select(
        (keys.map(k => col(k).as(s"__pk_$k")) :+ col("peak_idx") :+ col("offset") :+
          col("__join_idx")): _*
      )
    val cond = keys.foldLeft(col(idxCol) === col("__join_idx"))((c, k) =>
      c && col(k) === col(s"__pk_$k")
    )
    samples
      .join(broadcastIfSmall(p, nPeaks * 2L * halfWidth), cond)
      .select(
        (keys.map(col) :+ col("peak_idx") :+ col("offset") :+
          col(valueCol).as("value")): _*
      )
  }

  /** Window-gather formulation of the patch extraction (the alternative
    * physical strategy SURVEY.md §4.3 sketches as a future rule target):
    * collect the `[idx−halfWidth, idx+halfWidth)` frame over every sample
    * with an ordered window, then keep only peak rows. Better than the
    * range join when peaks are DENSE (join fan-out would dominate);
    * worse when peaks are sparse (frames are built for every row). Same
    * values as [[extractPatches]], one row per peak with the patch array
    * (edge patches are shorter, as in the range join). */
  def extractPatchesWindow(
      samples: DataFrame,
      peaks: DataFrame,
      idxCol: String,
      valueCol: String,
      halfWidth: Int,
      keys: Seq[String] = Nil
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w0 =
      if (keys.isEmpty) Window.orderBy(col(idxCol))
      else Window.partitionBy(keys.map(col): _*).orderBy(col(idxCol))
    val w = w0.rowsBetween(-halfWidth, halfWidth - 1)
    val framed = samples.withColumn("patch", collect_list(col(valueCol)).over(w))
    val pk = peaks.select(col(idxCol).as("peak_idx"))
    framed
      .join(broadcastIfSmall(pk, pk.count()), col(idxCol) === col("peak_idx"))
      .select((keys.map(col) :+ col("peak_idx") :+ col("patch")): _*)
  }
}
