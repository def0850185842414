#!/usr/bin/env python3
"""Head-to-head single-node benchmarks vs the reference on the SAME
synthetic .rec file: decode (read_block loop vs graft.tools.DecodeBench)
and the full extract_channels pipeline (vs graft.tools.Throughput's
extract stage). The reference's scipy dependency is stubbed with a
faithful 2-point-linear interp1d (the only scipy piece extract uses).

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
        print("reference decode round %d: %d packets in %.2fs = %.1f MB/s"
              % (rnd + 1, total, dt, size / 1e6 / dt))

    bench_extract(size)


def bench_extract(size):
    """Run the reference's extract_channels end-to-end (write included)."""
    import shutil
    import types

    class _Interp1d:  # faithful 2-point linear interp1d (rows = channels)
        def __init__(self, x, y, assume_sorted=False):
            self.x0, self.x1 = float(x[0]), float(x[1])
            self.y = np.asarray(y, dtype=float)
        def __call__(self, xs):
            xs = np.asarray(xs, dtype=float)
            t = (xs - self.x0) / (self.x1 - self.x0)
            y0 = self.y[..., 0]; y1 = self.y[..., 1]
            return y0[..., None] + t[None, ...] * (y1 - y0)[..., None]

    scipy = types.ModuleType("scipy"); scipy.__path__ = []
    sig = types.ModuleType("scipy.signal")
    sig.sosfiltfilt = sig.iirdesign = lambda *a, **k: None
    itp = types.ModuleType("scipy.interpolate"); itp.interp1d = _Interp1d
    scipy.signal = sig; scipy.interpolate = itp
    sys.modules.update({"scipy": scipy, "scipy.signal": sig, "scipy.interpolate": itp})

    pkg = "/tmp/jagshim/jagular"
    if os.path.exists(pkg):
        shutil.rmtree(pkg)
    shutil.copytree("/root/reference/jagular", pkg)
    src = open(f"{pkg}/readers.py").read().replace("hw_config.getchildren()", "list(hw_config)")
    open(f"{pkg}/readers.py", "w").write(src)
    sys.path.insert(0, "/tmp/jagshim")
    from jagular.io import JagularFileMap
    from jagular.utils import extract_channels

    out = "/tmp/jag_extract"
    if os.path.exists(out):
        shutil.rmtree(out)
    os.makedirs(out)
    t0 = time.time()
    extract_channels(jfm=JagularFileMap("/tmp/ref_bench.rec"),
                     ts_out=f"{out}/timestamps.raw", ch_out_prefix=f"{out}/",
                     maxgap=150, block_size=65536)
    dt = time.time() - t0
    print("reference extract_channels: %.1f MB input in %.2fs = %.1f MB/s"
          % (size / 1e6, dt, size / 1e6 / dt))


if __name__ == "__main__":
    main()
