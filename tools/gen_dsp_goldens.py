#!/usr/bin/env python3
"""Dev-only golden generator for the SosFiltFilt kernel.

Implements the standard sosfiltfilt algorithm (DF2T biquad cascade,
steady-state zi, odd-extension padding, forward-backward) in pure numpy —
an independent second implementation to cross-check the Scala kernel.
Prints golden output values for the hardcoded SOS + input used in
DspSpec.scala.
"""
import numpy as np

# must match DspSpec.scala
SOS = np.array([
    [0.2, 0.3, 0.1, 1.0, -0.5, 0.2],
    [0.4, 0.2, 0.1, 1.0, -0.3, 0.1],
])
N = 50
X = np.array([np.sin(i * 0.1) + 0.01 * i for i in range(N)])


def sosfilt(sos, x, zi):
    y = x.copy()
    zf = zi.copy()
    for s in range(sos.shape[0]):
        b0, b1, b2, _, a1, a2 = sos[s]
        z0, z1 = zf[s]
        out = np.empty_like(y)
        for i, xi in enumerate(y):
            yi = b0 * xi + z0
            z0 = b1 * xi - a1 * yi + z1
            z1 = b2 * xi - a2 * yi
            out[i] = yi
        y = out
        zf[s] = (z0, z1)
    return y, zf


def sosfilt_zi(sos):
    zi = np.zeros((sos.shape[0], 2))
    scale = 1.0
    for s in range(sos.shape[0]):
        b0, b1, b2, _, a1, a2 = sos[s]
        B = np.array([b1 - a1 * b0, b2 - a2 * b0])
        M = np.array([[1.0 + a1, -1.0], [a2, 1.0]])
        zi[s] = scale * np.linalg.solve(M, B)
        scale *= (b0 + b1 + b2) / (1.0 + a1 + a2)
    return zi


def odd_ext(x, n):
    left = 2.0 * x[0] - x[n:0:-1]
    right = 2.0 * x[-1] - x[-2:-(n + 2):-1]
    return np.concatenate([left, x, right])


def default_padlen(sos):
    nb2 = int(np.sum(sos[:, 2] == 0.0))
    na2 = int(np.sum(sos[:, 5] == 0.0))
    return 3 * (2 * sos.shape[0] + 1 - min(nb2, na2))


def sosfiltfilt(sos, x):
    pl = min(default_padlen(sos), len(x) - 1)
    ext = odd_ext(x, pl)
    zi = sosfilt_zi(sos)
    y, _ = sosfilt(sos, ext, zi * ext[0])
    y, _ = sosfilt(sos, y[::-1], zi * y[-1])
    y = y[::-1]
    return y[pl:pl + len(x)]


if __name__ == "__main__":
    y = sosfiltfilt(SOS, X)
    print("padlen", default_padlen(SOS))
    print(", ".join(f"{v!r}" for v in y))
