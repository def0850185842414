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
    var s = math.abs(seconds)
    val days = (s / 86400).toLong; s -= days * 86400
    val hours = (s / 3600).toLong; s -= hours * 3600
    val mins = (s / 60).toLong; s -= mins * 60
    val whole = s.toLong
    val ms = math.round((s - whole) * 1000)
    val msPart = if (ms > 0) f".$ms%03d" else ""
    val dayPart = if (days > 0) s"${days}d:" else ""
    f"$sign$dayPart$hours%02d:$mins%02d:$whole%02d$msPart"
  }
}
