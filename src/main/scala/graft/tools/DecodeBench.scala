package graft.tools

import org.apache.hadoop.conf.Configuration

/** Dev micro-benchmark: RecFormat.decodeRange drain rate, no Spark. */
object DecodeBench {
  def main(args: Array[String]): Unit = {
    val path = if (args.nonEmpty) args(0) else "/tmp/ref_bench.rec"
    val conf = new Configuration()
    val cfg = graft.io.RecFormat.parseConfig(path, conf)
    val total = graft.io.RecFormat.packetCount(cfg, conf)
    (1 to 3).foreach { round =>
      val t0 = System.nanoTime()
      val it = graft.io.RecFormat.decodeRange(cfg, 0, total, conf)
      var n = 0L
      var acc = 0L
      while (it.hasNext) { val p = it.next(); acc += p.ts + p.values(0); n += 1 }
      val sec = (System.nanoTime() - t0) / 1e9
      val mb = total * cfg.packetSize / 1e6
      println(f"round $round: $n%d packets in $sec%.2fs = ${mb / sec}%.1f MB/s (acc $acc)")
    }
  }
}
