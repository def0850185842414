#!/usr/bin/env python3
"""Golden deflate sizes for q_compress_ratio's literal oracle table.

The query synthesizes per-document text from the doc_id residue
r = doc_id % 10:

    text(r) = md5(str(r)) * r + "the quick brown fox jumps over the lazy dog " * (10 - r)

so the deflate size depends only on r and can be pinned as a VALUES
literal in the DuckDB oracle. This script computes those sizes with
CPython's zlib (raw stream, level 6) — an implementation independent
of the JDK Deflater the graft.functions.DeflateSize kernel uses — and
prints the VALUES row list to paste into SparkEntry.oracleSql.
"""
import hashlib
import zlib

PROSE = "the quick brown fox jumps over the lazy dog "


def raw_deflate_size(s: str, level: int = 6) -> int:
    co = zlib.compressobj(level, zlib.DEFLATED, -15)  # -15 = raw stream
    return len(co.compress(s.encode()) + co.flush())


def main() -> None:
    rows = []
    for r in range(10):
        text = hashlib.md5(str(r).encode()).hexdigest() * r + PROSE * (10 - r)
        rows.append((r, len(text.encode()), raw_deflate_size(text)))
    print("VALUES " + ", ".join(f"({r}, {nd})" for r, _, nd in rows))
    for r, nb, nd in rows:
        print(f"r={r} n_bytes={nb} n_deflate={nd} ratio={round(nd / max(nb, 1), 4)}")


if __name__ == "__main__":
    main()
