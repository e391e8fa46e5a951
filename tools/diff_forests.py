#!/usr/bin/env python3
"""Diagnose the fast-mode worst-case quality gap (VERDICT r4 item 3).

For one Kodak image at one qpd6, encode with BOTH the exact engine and the
wavefront fast mode (CPU backend — decisions are platform-identical), decode
both streams with the traced pydecoder, and report:

  * partition/layout histograms (count + bits by (sz, lay)) for each forest
  * per-CTU SSE and bits for each -> the spatial distribution of the loss
    (is the dPSNR deficit concentrated in a few CTUs or spread?)
  * the top-N CTUs by RD-cost excess (fast vs exact, reference weights)

Usage: python tools/diff_forests.py <imgnum 1-24> [qpd6] [--topn N]
"""
import sys

import numpy as np

sys.path.insert(0, "tools")


def node_stats(stream, trace_sink):
    import pydecoder as pd
    d = pd.Dec(stream)
    d.trace = trace_sink
    rcon = d.run()
    return rcon, trace_sink


def per_ctu(trace, rcon, img, yszn, xszn):
    """(R, Cc) bits and SSE maps from a node trace + recon."""
    R, Cc = yszn // 32, xszn // 32
    bits = np.zeros((R, Cc), np.int64)
    for y, x, sz, lay, pm, b in trace:
        bits[y // 32, x // 32] += b
    h, w = img.shape
    err = np.zeros((yszn, xszn), np.int64)
    err[:h, :w] = (img.astype(np.int64) - rcon[:h, :w].astype(np.int64)) ** 2
    sse = err.reshape(R, 32, Cc, 32).sum((1, 3))
    return bits, sse


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    num = int(sys.argv[1])
    qpd6 = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    topn = 8
    from hevce_tpu.utils.imageio import read_pgm
    from hevce_tpu.runtime.native import encode_image_native
    from hevce_tpu.models.wavefront import encode_image_fast
    from hevce_tpu.ops import constants as C

    img = read_pgm(f"/root/reference/testimage/{num:02d}.pgm")
    s_ex, r_ex = encode_image_native(img, qpd6)
    s_fa, r_fa = encode_image_fast(img, qpd6)
    h, w = img.shape
    yszn, xszn = r_ex.shape

    def psnr(r):
        mse = ((img.astype(np.int64) - r[:h, :w].astype(np.int64)) ** 2).mean()
        return 10 * np.log10(255 * 255 / mse)

    print(f"image {num:02d} qpd6={qpd6}: exact {len(s_ex)} B {psnr(r_ex):.3f} dB"
          f" | fast {len(s_fa)} B {psnr(r_fa):.3f} dB "
          f"(d={psnr(r_fa) - psnr(r_ex):+.3f} dB, x{len(s_fa) / len(s_ex):.4f})")

    _, tr_ex = node_stats(s_ex, [])
    _, tr_fa = node_stats(s_fa, [])

    def hist(tr):
        hh = {}
        for y, x, sz, lay, pm, b in tr:
            k = (sz, lay)
            c, bb = hh.get(k, (0, 0))
            hh[k] = (c + 1, bb + b)
        return hh

    he, hf = hist(tr_ex), hist(tr_fa)
    print(f"{'(sz,lay)':>10} {'exact n':>8} {'bits':>9} {'fast n':>8} {'bits':>9}")
    for k in sorted(set(he) | set(hf)):
        ce, be = he.get(k, (0, 0))
        cf, bf = hf.get(k, (0, 0))
        print(f"{str(k):>10} {ce:8d} {be:9d} {cf:8d} {bf:9d}")

    be, se = per_ctu(tr_ex, r_ex, img, yszn, xszn)
    bf, sf = per_ctu(tr_fa, r_fa, img, yszn, xszn)
    wd = int(C.RDCOST_WEIGHT_DIST[qpd6])
    wb = int(C.RDCOST_WEIGHT_BITS[qpd6])
    excess = (wd * (sf - se) + wb * (bf - be)).astype(np.float64)
    flat = np.argsort(excess.reshape(-1))[::-1]
    R, Cc = excess.shape
    tot = excess.sum()
    print(f"\nper-CTU RD excess (fast - exact, ref weights): total {tot:.0f}")
    cum = 0.0
    for rank, k in enumerate(flat[:topn]):
        r, c = divmod(int(k), Cc)
        cum += excess[r, c]
        print(f"  #{rank + 1} CTU ({r:2d},{c:2d}): dSSE {sf[r, c] - se[r, c]:8d} "
              f"dbits {bf[r, c] - be[r, c]:7d} excess {excess[r, c]:10.0f} "
              f"(cum {100 * cum / max(tot, 1):.1f}%)")
    # concentration curve: how much of the total excess the worst K% of CTUs hold
    pos = np.sort(np.maximum(excess.reshape(-1), 0))[::-1]
    pt = pos.sum()
    for frac in (0.05, 0.10, 0.25, 0.50):
        kk = max(1, int(len(pos) * frac))
        print(f"  worst {int(frac * 100):2d}% of CTUs hold "
              f"{100 * pos[:kk].sum() / max(pt, 1):.1f}% of positive excess")


if __name__ == "__main__":
    main()
