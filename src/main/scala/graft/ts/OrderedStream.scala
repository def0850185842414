package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.StructType
import org.apache.spark.storage.StorageLevel

/** Scalable global-order neighbor access: the primitive that replaces
  * keyless `Window.orderBy(ts)` (which Spark executes in ONE task) for
  * lag/lead-style computations over a single global stream.
  *
  * Algorithm: range-repartition + local sort by the order column; collect
  * each partition's FIRST and LAST row projections (O(numPartitions) rows
  * on the driver); broadcast them back; every partition then computes
  * prev/next for its rows locally, using the boundary rows of its
  * neighbors for its edge rows. Two jobs, no single-task sort, task
  * memory O(partition).
  *
  * Runs on Catalyst InternalRows end to end (`Bridge.toInternalRdd` →
  * `internalCreateDataFrame`): no per-row external-Row encode/decode, no
  * schema-boxed `Row` allocation — the only per-row costs are one
  * UnsafeRow byte copy (the persist anchor) and the appended neighbor
  * fields.
  *
  * Requires a UNIQUE order column (ties could straddle a partition
  * boundary nondeterministically) — dedup first, as the extract pipeline
  * does.
  *
  * Like [[Sessionize.withSegmentIdGlobal]], the persist anchors the
  * sampled range partitioning across the two passes. It is deliberately
  * NOT unpersisted here — the returned DataFrame still reads through it
  * (an early unpersist would both recompute and re-sample the range
  * partitioner, breaking the anchor); the ContextCleaner reclaims it
  * once the result is no longer referenced.
  */
object OrderedStream {

  /** Returns `df` with, for each column c in (orderCol ± carried cols),
    * nullable `__prev_<c>` and `__next_<c>` columns, computed in global
    * `orderCol` order. */
  def withNeighbors(
      df: DataFrame,
      orderCol: String,
      carry: Seq[String],
      numPartitions: Int = 0
  ): DataFrame = {
    val spark = df.sparkSession
    val n =
      if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val cols = df.columns
    // distinct: carry containing the order column would otherwise emit
    // duplicate __prev_/__next_ field names
    val proj = (orderCol +: carry).distinct
    val projIdx = proj.map(c => cols.indexOf(c))
    require(projIdx.forall(_ >= 0), s"missing columns among $proj")

    val sorted = df
      .repartitionByRange(n, col(orderCol))
      .sortWithinPartitions(col(orderCol))
    val schema = sorted.schema
    val projTypes = projIdx.map(i => schema(i).dataType)

    // UnsafeRow iterators reuse the row object: copy before caching. The
    // persist is the correctness anchor fixing the sampled range
    // partitioning across both passes.
    val internal = Bridge
      .toInternalRdd(sorted)
      .mapPartitions(_.map(_.copy()), preservesPartitioning = true)
      .persist(StorageLevel.MEMORY_AND_DISK)

    def project(r: InternalRow): Array[Any] = {
      val out = new Array[Any](projIdx.length)
      var i = 0
      while (i < projIdx.length) {
        out(i) = r.get(projIdx(i), projTypes(i))
        i += 1
      }
      out
    }

    // pass 1: per-partition first/last projections
    val bounds = internal
      .mapPartitionsWithIndex { (pid, it) =>
        if (!it.hasNext) Iterator.empty
        else {
          val first = it.next()
          var last = first
          while (it.hasNext) last = it.next()
          Iterator.single((pid, project(first), project(last)))
        }
      }
      .collect()
      .sortBy(_._1)

    // neighbor boundary rows per partition id
    val prevOf = new Array[Array[Any]](n)
    val nextOf = new Array[Array[Any]](n)
    var lastSeen: Array[Any] = null
    bounds.foreach { case (pid, _, last) =>
      prevOf(pid) = lastSeen
      lastSeen = last
    }
    var nextSeen: Array[Any] = null
    bounds.reverse.foreach { case (pid, first, _) =>
      nextOf(pid) = nextSeen
      nextSeen = first
    }
    val bc = spark.sparkContext.broadcast((prevOf, nextOf))

    val extraFields = proj.flatMap { c =>
      val f = schema(cols.indexOf(c))
      Seq(f.copy(name = s"__prev_$c", nullable = true), f.copy(name = s"__next_$c", nullable = true))
    }
    val outSchema = StructType(schema.fields ++ extraFields)
    val nBase = schema.fields.length
    val nProj = projIdx.length
    val baseTypes = schema.fields.map(_.dataType)

    val outRdd = internal.mapPartitionsWithIndex { (pid, it) =>
      val (prevB, nextB) = bc.value
      val buf = it.buffered
      var prev: Array[Any] = if (pid < prevB.length) prevB(pid) else null
      new Iterator[InternalRow] {
        override def hasNext: Boolean = buf.hasNext
        override def next(): InternalRow = {
          val r = buf.next()
          val nxt: Array[Any] =
            if (buf.hasNext) project(buf.head)
            else if (pid < nextB.length) nextB(pid)
            else null
          val vals = new Array[Any](nBase + 2 * nProj)
          var i = 0
          while (i < nBase) { vals(i) = r.get(i, baseTypes(i)); i += 1 }
          var j = 0
          while (j < nProj) {
            vals(nBase + 2 * j) = if (prev == null) null else prev(j)
            vals(nBase + 2 * j + 1) = if (nxt == null) null else nxt(j)
            j += 1
          }
          prev = project(r)
          new GenericInternalRow(vals)
        }
      }
    }
    Bridge.internalCreateDataFrame(spark, outRdd, outSchema)
  }
}
