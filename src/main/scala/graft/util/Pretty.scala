package graft.util

/** Presentation helpers (F11, jagular/utils.py:552-675): byte counts,
  * thousands-separated ints, and d:hh:mm:ss.ms durations (incl. negative
  * and infinite) — display-layer only, kept out of query plans. */
object Pretty {

  /** PrettyBytes (utils.py:552-569). */
  def bytes(n: Long): String = {
    val units = Seq("bytes", "kB", "MB", "GB", "TB", "PB")
    var v = n.toDouble
    var u = 0
    while (v >= 1024.0 && u < units.length - 1) { v /= 1024.0; u += 1 }
    if (u == 0) f"$n%d bytes" else f"$v%.1f ${units(u)}"
  }

  /** PrettyInt (utils.py:571-581). */
  def int(n: Long): String = "%,d".format(n)

  /** PrettyDuration in seconds → "[-][Dd:]HH:MM:SS[.ms]"
    * (utils.py:583-675), tolerating negative and infinite values. */
  def duration(seconds: Double): String = {
    if (seconds.isPosInfinity) return "inf"
    if (seconds.isNegInfinity) return "-inf"
    val sign = if (seconds < 0) "-" else ""
    // integer milliseconds first, so rounding carries through every unit
    // (59.9996s is 00:01:00, not 00:00:59.1000)
    var t = math.round(math.abs(seconds) * 1000)
    val days = t / 86400000L; t -= days * 86400000L
    val hours = t / 3600000L; t -= hours * 3600000L
    val mins = t / 60000L; t -= mins * 60000L
    val whole = t / 1000L
    val ms = t % 1000L
    val msPart = if (ms > 0) f".$ms%03d" else ""
    val dayPart = if (days > 0) s"${days}d:" else ""
    f"$sign$dayPart$hours%02d:$mins%02d:$whole%02d$msPart"
  }
}
