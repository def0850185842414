package graft.io

import java.io.{ByteArrayInputStream, DataInputStream, EOFException, InputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** SpikeGadgets `.rec` format: an embedded XML `<Configuration>` workspace
  * terminated by the literal line `</Configuration>\n`, followed by
  * fixed-size packets `header uint8[H] · timestamp uint32le · channels
  * int16le[N]`.
  *
  * Behavior matches the reference decoder
  * (reference: jagular/readers.py:215-285 config parse,
  * readers.py:287-342 packet decode, readers.py:180-213 bounds):
  *  - `header_size = 1 + Σ HardwareConfiguration child @numBytes`;
  *  - `numChannels` must be a multiple of 32 (`n_cards = numChannels/32`);
  *  - SpikeChannel elements in DOCUMENT order give the extraction
  *    projection, remapped `(hwChan % 32) * n_cards + hwChan / 32`
  *    (tetrode grouping preserved);
  *  - timestamps are uint32 LE (widened to Long — Spark has no unsigned);
  *  - samples are int16 LE.
  *
  * All reads go through Hadoop FileSystem, so the same code paths work on
  * local disk, HDFS, or object stores on a real cluster.
  */
object RecFormat {

  final case class RecConfig(
      path: String,
      configSectionSize: Long,
      nChannels: Int,
      headerSize: Int,
      samplingRate: Int,
      /** packet offsets (in the int16 channel block) to extract, document
        * order — tetrode grouping preserved. */
      reindex: Array[Int]
  ) {
    val timestampSize: Int = 4
    val bytesPerChannel: Int = 2
    val packetSize: Int = headerSize + timestampSize + nChannels * bytesPerChannel
    def nSpikeChannels: Int = reindex.length
  }

  private def fs(path: Path, conf: Configuration): FileSystem = path.getFileSystem(conf)

  /** S1: read the XML prefix (driver-side, bounded) and derive the packet
    * geometry + channel projection. */
  def parseConfig(pathStr: String, hadoopConf: Configuration = new Configuration()): RecConfig = {
    val path = new Path(pathStr)
    val in = fs(path, hadoopConf).open(path)
    val (xmlBytes, configSize) =
      try readConfigSection(in)
      finally in.close()

    val doc = javax.xml.parsers.DocumentBuilderFactory
      .newInstance()
      .newDocumentBuilder()
      .parse(new ByteArrayInputStream(xmlBytes))
    val root = doc.getDocumentElement

    val hwList = root.getElementsByTagName("HardwareConfiguration")
    require(hwList.getLength > 0, s"$pathStr: no HardwareConfiguration defined")
    val hw = hwList.item(0).asInstanceOf[org.w3c.dom.Element]
    val nChannels = hw.getAttribute("numChannels").toInt
    val samplingRate =
      Option(hw.getAttribute("samplingRate")).filter(_.nonEmpty).map(_.toInt).getOrElse(30000)
    require(nChannels % 32 == 0, s"$pathStr: numChannels ($nChannels) must be a multiple of 32")
    val nCards = nChannels / 32

    // header = 1 start byte + Σ direct-child Device @numBytes
    var headerSize = 1
    val kids = hw.getChildNodes
    (0 until kids.getLength).foreach { i =>
      kids.item(i) match {
        case e: org.w3c.dom.Element =>
          val nb = e.getAttribute("numBytes")
          if (nb.nonEmpty) headerSize += nb.toInt
        case _ =>
      }
    }

    // SpikeChannel elements in document order
    val spikes = root.getElementsByTagName("SpikeChannel")
    val reindex = (0 until spikes.getLength).map { i =>
      val hwChan = spikes.item(i).asInstanceOf[org.w3c.dom.Element].getAttribute("hwChan").toInt
      (hwChan % 32) * nCards + hwChan / 32
    }.toArray

    RecConfig(pathStr, configSize, nChannels, headerSize, samplingRate, reindex)
  }

  /** Scan forward line-by-line until the literal `</Configuration>\n` line
    * (reference: jagular/readers.py:235-246, incl. the 1000-line infinite
    * loop guard). Returns (xml bytes, size incl. terminator line). */
  private def readConfigSection(in: InputStream): (Array[Byte], Long) = {
    val buf = new scala.collection.mutable.ArrayBuffer[Byte](1 << 16)
    val line = new scala.collection.mutable.ArrayBuffer[Byte](256)
    var lines = 0
    var done = false
    while (!done) {
      line.clear()
      var b = in.read()
      while (b != -1 && b != '\n') { line += b.toByte; b = in.read() }
      if (b == -1) throw new EOFException("EOF before </Configuration>")
      line += '\n'.toByte
      buf ++= line
      if (new String(line.toArray, "US-ASCII") == "</Configuration>\n") done = true
      lines += 1
      if (lines > 1001) throw new IllegalArgumentException("Configuration info not found - check input file")
    }
    (buf.toArray, buf.length.toLong)
  }

  /** S2: first + last timestamp without scanning the file — seek to the
    * first packet and to EOF−packetSize (reference: readers.py:180-213).
    * This is the driver-side "read 2 packets, not the file" catalog trick
    * Catalyst can't derive (SURVEY.md §4.1). */
  def timestampBounds(cfg: RecConfig, hadoopConf: Configuration = new Configuration()): (Long, Long) = {
    val path = new Path(cfg.path)
    val f = fs(path, hadoopConf)
    val len = f.getFileStatus(path).getLen
    // PACKET-ALIGNED last seek: a truncated recording (crash mid-write)
    // leaves a partial trailing packet, and seeking to len - packetSize
    // would decode channel bytes as the "last" timestamp — which the V2
    // source would then trust for whole-file pruning
    val whole = (len - cfg.configSectionSize) / cfg.packetSize
    require(whole > 0, s"${cfg.path}: no whole packets after the config section")
    val in = f.open(path)
    try {
      val packet = new Array[Byte](cfg.packetSize)
      in.seek(cfg.configSectionSize)
      in.readFully(packet)
      val first = tsOf(packet, cfg)
      in.seek(cfg.configSectionSize + (whole - 1) * cfg.packetSize)
      in.readFully(packet)
      val last = tsOf(packet, cfg)
      (first, last)
    } finally in.close()
  }

  /** uint32 LE at headerSize, widened to Long. */
  private def tsOf(packet: Array[Byte], cfg: RecConfig): Long = {
    val o = cfg.headerSize
    ((packet(o) & 0xffL)) |
      ((packet(o + 1) & 0xffL) << 8) |
      ((packet(o + 2) & 0xffL) << 16) |
      ((packet(o + 3) & 0xffL) << 24)
  }

  /** Number of whole packets in the file (trailing partial ignored). */
  def packetCount(cfg: RecConfig, hadoopConf: Configuration = new Configuration()): Long = {
    val path = new Path(cfg.path)
    val len = fs(path, hadoopConf).getFileStatus(path).getLen
    (len - cfg.configSectionSize) / cfg.packetSize
  }

  /** Timestamp of packet `i` on an ALREADY-OPEN stream: one seek + 4-byte
    * read (no full decode, no per-probe open — on object stores the open
    * round trip dwarfs the read). */
  private def tsAtPacket(in: org.apache.hadoop.fs.FSDataInputStream, cfg: RecConfig, i: Long): Long = {
    in.seek(cfg.configSectionSize + i * cfg.packetSize + cfg.headerSize)
    val b = new Array[Byte](4)
    in.readFully(b)
    (b(0) & 0xffL) | ((b(1) & 0xffL) << 8) | ((b(2) & 0xffL) << 16) | ((b(3) & 0xffL) << 24)
  }

  private def withOpen[A](cfg: RecConfig, hadoopConf: Configuration)(
      f: org.apache.hadoop.fs.FSDataInputStream => A
  ): A = {
    val path = new Path(cfg.path)
    val in = fs(path, hadoopConf).open(path)
    try f(in)
    finally in.close()
  }

  /** Timestamp of a single packet: one open + one seek. Used by pruned
    * readers to seed their monotonicity guard with the packet BEFORE the
    * split, so a decreasing ts across a split (or pruning) boundary is
    * caught, not just one inside the split. */
  def tsAt(cfg: RecConfig, i: Long, hadoopConf: Configuration): Long =
    withOpen(cfg, hadoopConf)(in => tsAtPacket(in, cfg, i))

  /** Binary search (valid because in-file timestamps are non-decreasing,
    * the invariant the reference enforces — jagular/utils.py:323-328):
    * smallest packet index with ts >= t. O(log n) seeks, ONE open. */
  def firstPacketAtOrAbove(cfg: RecConfig, t: Long, total: Long, hadoopConf: Configuration): Long =
    withOpen(cfg, hadoopConf) { in =>
      var lo = 0L; var hi = total // invariant: ts(<lo) < t <= ts(>=hi)
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (tsAtPacket(in, cfg, mid) < t) lo = mid + 1 else hi = mid
      }
      lo
    }

  /** Largest packet index with ts <= t (or -1). O(log n) seeks, ONE open. */
  def lastPacketAtOrBelow(cfg: RecConfig, t: Long, total: Long, hadoopConf: Configuration): Long =
    withOpen(cfg, hadoopConf) { in =>
      var lo = -1L; var hi = total - 1 // invariant: ts(<=lo) <= t < ts(>hi)
      while (lo < hi) {
        val mid = (lo + hi + 1) >>> 1
        if (tsAtPacket(in, cfg, mid) <= t) lo = mid else hi = mid - 1
      }
      lo
    }

  /** Decoded packet: timestamp + the reindex-projected spike channels
    * (int16 as Short). `values(i)` is spike channel i in workspace
    * document order. */
  final case class Packet(ts: Long, values: Array[Short])

  private val emptyValues = new Array[Short](0)

  /** Packet iterator that can be closed EARLY (LIMIT queries, reader
    * teardown) — the stream otherwise closes on exhaustion. */
  trait PacketIterator extends Iterator[Packet] with java.io.Closeable

  /** S3: decode `count` packets starting at packet index `startPacket`.
    * Streams through the byte range; only the projected channels are
    * materialized (prune-at-decode, reference: readers.py:341).
    * `decodeValues = false` (column pruning: a ts-only projection) skips
    * channel extraction entirely — packets are still read (fixed-size
    * records) but no per-packet array is allocated. */
  def decodeRange(
      cfg: RecConfig,
      startPacket: Long,
      nPackets: Long,
      hadoopConf: Configuration,
      decodeValues: Boolean = true
  ): PacketIterator = {
    val path = new Path(cfg.path)
    val in = fs(path, hadoopConf).open(path)
    in.seek(cfg.configSectionSize + startPacket * cfg.packetSize)
    val dis = new DataInputStream(new java.io.BufferedInputStream(in, 1 << 20))
    val packet = new Array[Byte](cfg.packetSize)
    val reindex = cfg.reindex
    val chanBase = cfg.headerSize + cfg.timestampSize

    new PacketIterator {
      private var remaining = nPackets
      private var closed = false
      override def close(): Unit = {
        if (!closed) { dis.close(); closed = true }
        remaining = 0
      }
      override def hasNext: Boolean = {
        if (remaining <= 0 && !closed) { dis.close(); closed = true }
        remaining > 0
      }
      override def next(): Packet = {
        dis.readFully(packet)
        remaining -= 1
        val ts = tsOf(packet, cfg)
        val vals =
          if (!decodeValues) emptyValues
          else {
            val out = new Array[Short](reindex.length)
            var i = 0
            while (i < reindex.length) {
              val o = chanBase + reindex(i) * 2
              out(i) = (((packet(o) & 0xff)) | ((packet(o + 1) & 0xff) << 8)).toShort
              i += 1
            }
            out
          }
        if (remaining == 0 && !closed) { dis.close(); closed = true }
        Packet(ts, vals)
      }
    }
  }
}
