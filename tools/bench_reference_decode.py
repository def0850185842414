#!/usr/bin/env python3
"""Head-to-head single-node decode benchmark: the reference's
SpikeGadgetsRecFileReader.read_block loop vs graft's decode kernel
(graft.tools.DecodeBench) on the SAME synthetic .rec file.

Usage:
  python3 tools/bench_reference_decode.py [n_packets]   # writes /tmp/ref_bench.rec
  sbt "runMain graft.tools.DecodeBench /tmp/ref_bench.rec"

The reference needs one source-level compat rewrite (Element.getchildren
was removed in Python 3.9; list(elem) is the documented replacement).
Driver-side python only — not part of the shipped library.
"""
import importlib.util
import os
import sys
import time

import numpy as np

XML = """<Configuration>
<HardwareConfiguration numChannels="32" samplingRate="30000">
<Device name="ECU" numBytes="4"/>
</HardwareConfiguration>
<SpikeConfiguration>
<SpikeNTrode id="1">
<SpikeChannel hwChan="0"/>
<SpikeChannel hwChan="1"/>
<SpikeChannel hwChan="2"/>
<SpikeChannel hwChan="3"/>
</SpikeNTrode>
</SpikeConfiguration>
</Configuration>
""".encode("ascii")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    path = "/tmp/ref_bench.rec"
    # same layout as graft.tools.Throughput.writeRec
    ts = np.arange(n, dtype=np.uint32)
    rec = np.zeros(n, dtype=np.dtype([("h", "u1", 5), ("ts", "<u4"), ("ch", "<i2", 32)]))
    rec["ts"] = ts
    rec["ch"] = ((ts[:, None] + np.arange(32)[None, :]) % 2000 - 1000).astype("<i2")
    with open(path, "wb") as f:
        f.write(XML)
        rec.tofile(f)
    size = os.path.getsize(path)
    print("generated %d packets, %.1f MB at %s" % (n, size / 1e6, path))

    src = open("/root/reference/jagular/readers.py").read()
    src = src.replace("hw_config.getchildren()", "list(hw_config)")
    mod = importlib.util.module_from_spec(
        importlib.util.spec_from_loader("jreaders", loader=None))
    exec(compile(src, "readers.py", "exec"), mod.__dict__)

    reader = mod.SpikeGadgetsRecFileReader()
    for rnd in range(3):
        t0 = time.time()
        total = 0
        with open(path, "rb") as f:
            while True:
                tss, _ = reader.read_block(f, block_size=65536)
                if not tss:
                    break
                total += len(tss)
        dt = time.time() - t0
        print("reference round %d: %d packets in %.2fs = %.1f MB/s"
              % (rnd + 1, total, dt, size / 1e6 / dt))


if __name__ == "__main__":
    main()
