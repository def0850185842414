package graft.ts

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
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
  * Requires a UNIQUE order column (ties could straddle a partition
  * boundary nondeterministically) — dedup first, as the extract pipeline
  * does.
  *
  * Like [[Sessionize.withSegmentIdGlobal]], the persist anchors the
  * sampled range partitioning across the two passes.
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
    val proj = orderCol +: carry
    val projIdx = proj.map(c => cols.indexOf(c))
    require(projIdx.forall(_ >= 0), s"missing columns among $proj")

    val sorted = df
      .repartitionByRange(n, col(orderCol))
      .sortWithinPartitions(col(orderCol))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // pass 1: per-partition first/last projections
    val bounds = sorted.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        if (!it.hasNext) Iterator.empty
        else {
          val first = it.next()
          var last = first
          while (it.hasNext) last = it.next()
          Iterator.single((pid, projIdx.map(first.get), projIdx.map(last.get)))
        }
      }
      .collect()
      .sortBy(_._1)

    // neighbor boundary rows per partition id
    val prevOf = new Array[Seq[Any]](n)
    val nextOf = new Array[Seq[Any]](n)
    var lastSeen: Seq[Any] = null
    bounds.foreach { case (pid, first, last) =>
      prevOf(pid) = lastSeen
      lastSeen = last.toSeq
    }
    var nextSeen: Seq[Any] = null
    bounds.reverse.foreach { case (pid, first, last) =>
      nextOf(pid) = nextSeen
      nextSeen = first.toSeq
    }
    val bc = spark.sparkContext.broadcast((prevOf, nextOf))

    val extraFields = proj.flatMap { c =>
      val f = df.schema(cols.indexOf(c))
      Seq(f.copy(name = s"__prev_$c", nullable = true), f.copy(name = s"__next_$c", nullable = true))
    }
    val outSchema = StructType(sorted.schema.fields ++ extraFields)

    val outRdd = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      val (prevB, nextB) = bc.value
      val buf = it.buffered
      var prev: Seq[Any] = if (pid < prevB.length && prevB(pid) != null) prevB(pid) else null
      new Iterator[Row] {
        override def hasNext: Boolean = buf.hasNext
        override def next(): Row = {
          val r = buf.next()
          val cur = projIdx.map(r.get).toSeq
          val nxt: Seq[Any] =
            if (buf.hasNext) projIdx.map(buf.head.get).toSeq
            else if (pid < nextB.length && nextB(pid) != null) nextB(pid)
            else null
          val extras = proj.indices.flatMap { i =>
            Seq(if (prev == null) null else prev(i), if (nxt == null) null else nxt(i))
          }
          prev = cur
          Row.fromSeq(r.toSeq ++ extras)
        }
      }
    }
    spark.createDataFrame(outRdd, outSchema)
  }
}
