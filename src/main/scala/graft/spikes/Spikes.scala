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
    * session's `autoBroadcastJoinThreshold`. An unconditional
    * `broadcast()` hint is a scale cliff: Spark honors it regardless of
    * size, so a peak stream that is sparse at test scale but large at
    * 100 TB would OOM the driver instead of degrading to a shuffle
    * join.
    *
    * UnsafeRow footprint model: 8 B null-bit word + 8 B fixed slot per
    * field, plus a 64 B variable-length allowance for each non-fixed-width
    * field (string channel ids, short arrays) — fixed-width-only schemas
    * are exact, variable-width ones conservative rather than flattering.
    *
    * Callers pass an EXACT `rows` (one O(peaks) count job — noise next to
    * the sample scan the join feeds). An UNDERCOUNT defeats the guard —
    * `peakCountHint`-style shortcuts must be counts of the actual joined
    * side, never estimates. */
  private[graft] def broadcastIfSmall(df: DataFrame, rows: Long): DataFrame =
    if (fitsBroadcast(df, rows)) broadcast(df) else df

  /** [[broadcastIfSmall]] with an EXPLICIT per-row byte model, for
    * sides whose variable-width fields the generic 64 B allowance
    * under-counts (e.g. a numHashes-long signature array) — the
    * under-count class that defeats the OOM guard. Callers own the
    * accuracy of `perRowBytes`. */
  private[graft] def broadcastIfSmallExact(
      df: DataFrame,
      rows: Long,
      perRowBytes: Long
  ): DataFrame = {
    val thr = df.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    if (thr > 0 && rows * perRowBytes <= thr) broadcast(df) else df
  }

  /** The [[broadcastIfSmall]] decision alone — for callers that pick a
    * different PLAN (not just a join hint) when the small side isn't
    * provably small, e.g. [[graft.ops.Decontaminate]]'s Bloom
    * pre-filter path. */
  private[graft] def fitsBroadcast(df: DataFrame, rows: Long): Boolean = {
    import org.apache.spark.sql.catalyst.expressions.UnsafeRow
    val thr = df.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    val perRow = 8L + df.schema.fields.map { f =>
      if (UnsafeRow.isFixedLength(f.dataType)) 8L
      else 8L + math.max(f.dataType.defaultSize.toLong, 64L)
    }.sum
    val bytes = rows * perRow
    thr > 0 && bytes <= thr
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
      // skip the guard's extra O(peaks-pipeline) count job. Must be
      // EXACT or an overcount: an undercount defeats the broadcast
      // guard and re-opens the driver-OOM path it exists to close.
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

  /** Peri-event (spike-triggered) average over gathered patches — the
    * PSTH/STA readout on top of [[extractPatches]]: per offset from
    * the trigger, the sample count and mean value across every peak.
    * The classic "what does the signal do around a spike" summary
    * (reference domain: the alignment chain jagular/alignment.py:58-108
    * consumes the same peak-centered patches).
    *
    * One map-side-combinable rollup bounded by 2·halfWidth rows;
    * means are one 6dp division of a DECIMAL-exact sum, so engines
    * cannot drift. Edge-truncated patches contribute only their
    * existing offsets (n varies by offset at the stream edges —
    * reported, not hidden). */
  def triggeredAverage(patches: DataFrame, valueCol: String = "value"): DataFrame =
    patches
      .groupBy("offset")
      .agg(
        count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(18,2)")).as("__s"))
      .select(
        col("offset"), col("n"),
        round(col("__s").cast("double") / col("n").cast("double"), 6).as("mean_value"))

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
    val framed =
      if (keys.isEmpty)
        // keyless: a `Window.orderBy(idx)` with no partition key executes
        // in ONE task — the boundary-exchange gather below is the
        // scalable equivalent (same trick ts/OrderedStream uses for
        // lag/lead, widened to a halfWidth frame)
        framesGlobal(samples, idxCol, valueCol, halfWidth)
      else {
        val w = Window
          .partitionBy(keys.map(col): _*)
          .orderBy(col(idxCol))
          .rowsBetween(-halfWidth, halfWidth - 1)
        samples.withColumn("patch", collect_list(col(valueCol)).over(w))
      }
    // keys join too (renamed to keep the condition unambiguous): a
    // multichannel stream must gather each peak only from its own
    // channel, exactly like extractPatches' range-join form
    val pk = peaks.select(
      (keys.map(k => col(k).as(s"__pk_$k")) :+ col(idxCol).as("peak_idx")): _*
    )
    val cond = keys.foldLeft(col(idxCol) === col("peak_idx"))((c, k) =>
      c && col(k) === col(s"__pk_$k")
    )
    framed
      .join(broadcastIfSmall(pk, pk.count()), cond)
      .select((keys.map(col) :+ col("peak_idx") :+ col("patch")): _*)
  }

  /** Scalable keyless ROWS-frame gather: appends a `patch` column holding
    * the `[i−halfWidth, i+halfWidth)` window of `valueCol` (by global
    * `idxCol` row order, null values skipped — `collect_list` semantics)
    * WITHOUT a single-task ordered window.
    *
    * Algorithm (the [[graft.ts.OrderedStream]] boundary exchange, widened
    * from one neighbor row to `halfWidth`): range-repartition + local
    * sort; collect each partition's FIRST and LAST `halfWidth` values
    * (O(numPartitions × halfWidth) driver rows); stitch each partition's
    * preceding/following pad on the driver (walking across short or empty
    * partitions); broadcast the pads back; each partition then builds
    * every row's frame locally from one streaming pass with a 2·halfWidth
    * sliding buffer. Two jobs, no single-task stage, task memory
    * O(partition). Requires a unique `idxCol` (ties across a partition
    * boundary would be nondeterministic), like every global-order
    * primitive here. */
  private[graft] def framesGlobal(
      df: DataFrame,
      idxCol: String,
      valueCol: String,
      halfWidth: Int
  ): DataFrame = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.types.ArrayType
    import org.apache.spark.storage.StorageLevel

    require(halfWidth > 0, "halfWidth must be positive")
    val spark = df.sparkSession
    val n = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val cols = df.columns
    val valPos = cols.indexOf(valueCol)
    require(valPos >= 0, s"no column $valueCol")
    val k = halfWidth

    val sorted = df.repartitionByRange(n, col(idxCol)).sortWithinPartitions(col(idxCol))
    val schema = sorted.schema
    val valType = schema(valPos).dataType
    val baseTypes = schema.fields.map(_.dataType)
    val nBase = baseTypes.length

    // persist anchors the sampled range partitioning across the two
    // passes (see OrderedStream's scaladoc); rows copied out of the
    // reused UnsafeRow slot first
    val internal = Bridge
      .toInternalRdd(sorted)
      .mapPartitions(_.map(_.copy()), preservesPartitioning = true)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // pass 1: first/last k values (copied to Catalyst value form) per
    // non-empty partition
    val ends = internal
      .mapPartitionsWithIndex { (pid, it) =>
        if (!it.hasNext) Iterator.empty
        else {
          val head = scala.collection.mutable.ArrayBuffer.empty[Any]
          val tail = new Array[Any](k)
          var count = 0L
          it.foreach { r =>
            val v = InternalRow.copyValue(r.get(valPos, valType))
            if (count < k) head += v
            tail((count % k).toInt) = v
            count += 1
          }
          val tailLen = math.min(count, k.toLong).toInt
          val tailArr = Array.tabulate(tailLen)(i => tail(((count - tailLen + i) % k).toInt))
          Iterator.single((pid, head.toArray, tailArr))
        }
      }
      .collect()

    val heads = Array.fill(n)(Array.empty[Any])
    val tails = Array.fill(n)(Array.empty[Any])
    ends.foreach { case (pid, h, t) => heads(pid) = h; tails(pid) = t }
    // pad BEFORE partition p (ascending, adjacent to p's first row): walk
    // backward gathering tails — a tail shorter than k IS its whole
    // partition, so continuing to p-2, p-3... is exact
    val prevPads = Array.tabulate(n) { p =>
      val buf = scala.collection.mutable.ArrayBuffer.empty[Any]
      var q = p - 1
      while (buf.length < k && q >= 0) {
        val t = tails(q)
        buf.prependAll(t.takeRight(math.min(k - buf.length, t.length)))
        q -= 1
      }
      buf.toArray
    }
    val nextPads = Array.tabulate(n) { p =>
      val buf = scala.collection.mutable.ArrayBuffer.empty[Any]
      var q = p + 1
      while (buf.length < k && q < n) {
        val h = heads(q)
        buf.appendAll(h.take(math.min(k - buf.length, h.length)))
        q += 1
      }
      buf.toArray
    }
    val bc = spark.sparkContext.broadcast((prevPads, nextPads))

    val outSchema = StructType(
      schema.fields :+ StructField("patch", ArrayType(valType, containsNull = false), nullable = false)
    )

    // pass 2: one streaming pass per partition over
    // (prevPad ++ rows ++ nextPad) with a 2k-value sliding buffer; a row
    // at combined position p emits once position p+k-1 (or stream end)
    // has been consumed, its frame = non-null values at [p-k, p+k-1]
    val outRdd = internal.mapPartitionsWithIndex { (pid, rows) =>
      val (prevB, nextB) = bc.value
      val padBefore = prevB(pid)
      val padAfter = nextB(pid)
      new Iterator[InternalRow] {
        private val vals = scala.collection.mutable.ArrayDeque.empty[Any]
        private var basePos = 0L // combined position of vals.head
        private var consumed = 0L // values consumed from the combined stream
        private var ended = false // whole combined stream consumed
        private val pending = scala.collection.mutable.Queue.empty[(InternalRow, Long)]
        private val out = scala.collection.mutable.Queue.empty[InternalRow]
        private var rowPos = padBefore.length.toLong // combined position of the next data row
        private var nextIdx = 0

        padBefore.foreach(feed)

        private def feed(v: Any): Unit = {
          vals.append(v)
          consumed += 1
        }

        private def emitReady(): Unit = {
          while (pending.nonEmpty &&
            (ended || consumed - 1 >= pending.head._2 + k - 1)) {
            val (r, p) = pending.dequeue()
            val lo = math.max(p - k, 0L)
            val hi = math.min(p + k - 1, consumed - 1)
            val frame = scala.collection.mutable.ArrayBuffer.empty[Any]
            var q = lo
            while (q <= hi) {
              val v = vals((q - basePos).toInt)
              if (v != null) frame += v
              q += 1
            }
            val fields = new Array[Any](nBase + 1)
            var i = 0
            while (i < nBase) { fields(i) = r.get(i, baseTypes(i)); i += 1 }
            fields(nBase) = new GenericArrayData(frame.toArray)
            out.enqueue(new GenericInternalRow(fields))
          }
          // oldest still-pending row needs values from its p-k on; with
          // none pending the next row can only need consumed-k on
          val needFrom = pending.headOption.map(_._2 - k).getOrElse(consumed - k)
          while (basePos < needFrom && vals.nonEmpty) { vals.removeHead(); basePos += 1 }
        }

        private def advance(): Unit = {
          while (out.isEmpty && !(ended && pending.isEmpty)) {
            if (rows.hasNext) {
              val r = rows.next()
              pending.enqueue((r, rowPos))
              feed(r.get(valPos, valType))
              rowPos += 1
            } else if (nextIdx < padAfter.length) {
              feed(padAfter(nextIdx))
              nextIdx += 1
            } else ended = true
            emitReady()
          }
        }

        override def hasNext: Boolean = { advance(); out.nonEmpty }
        override def next(): InternalRow = { advance(); out.dequeue() }
      }
    }
    Bridge.internalCreateDataFrame(spark, outRdd, outSchema)
  }
}
