#!/usr/bin/env python3
"""Dev-only golden generator for Spline/Align: numpy reimplementation of
cspline1d / cspline1d_eval (Unser recursive filtering, mirror-symmetric
boundaries) and align_waveform_to_peak, cross-checking the Scala port.
"""
import numpy as np

Z1 = np.sqrt(3) - 2.0


def cspline1d(signal):
    k = len(signal)
    if k == 1:
        return signal * 6.0
    powers = Z1 ** np.arange(k)
    yplus = np.zeros(k)
    yplus[0] = signal[0] + Z1 * np.sum(powers * signal)
    for i in range(1, k):
        yplus[i] = signal[i] + Z1 * yplus[i - 1]
    out = np.zeros(k)
    out[k - 1] = Z1 / (Z1 - 1.0) * yplus[k - 1]
    for i in range(k - 2, -1, -1):
        out[i] = Z1 * (out[i + 1] - yplus[i])
    return out * 6.0


def cubic_basis(x):
    ax = abs(x)
    if ax < 1.0:
        return 2.0 / 3.0 - ax * ax + ax ** 3 / 2.0
    if ax < 2.0:
        return (2.0 - ax) ** 3 / 6.0
    return 0.0


def eval_at(coeffs, x):
    n = len(coeffs)
    for _ in range(64):
        if x < 0:
            x = -x
        elif x > n - 1:
            x = 2.0 * (n - 1) - x
        else:
            break
    jlower = int(np.floor(x - 2.0)) + 1
    res = 0.0
    for i in range(4):
        thisj = jlower + i
        indj = min(max(thisj, 0), n - 1)
        res += coeffs[indj] * cubic_basis(x - thisj)
    return res


def parabola_vertex(ym, y0, yp, i):
    a = (ym - 2 * y0 + yp) / 2.0
    b = (yp - ym) / 2.0
    return i - b / (2 * a)


def align(waveform, s_before, s_after, kind="cubic"):
    ns, nc = waveform.shape
    peaks = np.argmax(waveform, axis=0)
    vals = waveform[peaks, range(nc)]
    ch = int(np.argmax(vals))
    i = int(peaks[ch])
    frac = parabola_vertex(waveform[i - 1, ch], waveform[i, ch], waveform[i + 1, ch], i)
    xs = np.array([frac - s_before + j for j in range(s_before + s_after)])
    out = np.zeros((len(xs), nc))
    for c in range(nc):
        coeffs = cspline1d(waveform[:, c].astype(float))
        out[:, c] = [eval_at(coeffs, x) for x in xs]
    return frac, out


if __name__ == "__main__":
    # deterministic 12x2 waveform with an off-center peak on channel 1
    ns, nc = 12, 2
    wf = np.zeros((ns, nc))
    for s in range(ns):
        wf[s, 0] = np.sin(s * 0.4) * 3.0
        wf[s, 1] = 10.0 * np.exp(-((s - 5.3) ** 2) / 2.0)
    # spline coefficient golden for channel 1
    co = cspline1d(wf[:, 1])
    print("coeffs_ch1 =", ", ".join(repr(v) for v in co))
    frac, out = align(wf, 3, 3)
    print("frac =", repr(frac))
    for r in out:
        print("row:", ", ".join(repr(v) for v in r))
