#!/usr/bin/env python3
"""CTX_BIT sweep on the fast mode's worst-case Kodak images (VERDICT r4
item 3 pre-test): is there ANY global CTX_BIT that lifts the worst image
above -0.25 dB at acceptable size, or is the knob axis dead for the tail?

Decisions are CPU/TPU bit-identical, so this runs tunnel-free on the CPU
backend. Each config runs in a subprocess (the knobs are import-time
constants). Prints one dPSNR/size line per (image, ctx) pair.

Usage: python tools/ab_worst_image.py [img ...] [--ctx 0.60,0.65,0.70,0.75]
"""
import json
import os
import subprocess
import sys

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

_CHILD = """
import json, sys
import numpy as np
import jax
jax.config.update('jax_platforms', 'cpu')
cache = sys.argv[3]
if cache:
    jax.config.update('jax_compilation_cache_dir', cache)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
sys.path.insert(0, sys.argv[2])
from hevce_tpu.utils.imageio import read_pgm
from hevce_tpu.models.wavefront import encode_many_fast
files = json.loads(sys.argv[1])
imgs = [read_pgm(f) for f in files]
streams, recons = encode_many_fast(imgs, 2)
out = []
for im, s, r in zip(imgs, streams, recons):
    h, w = im.shape
    mse = ((im.astype(np.int64) - r[:h, :w].astype(np.int64)) ** 2).mean()
    out.append({'size': len(s),
                'psnr': float(10 * np.log10(255 * 255 / max(mse, 1e-9)))})
print('RESULT ' + json.dumps(out))
"""


def main():
    import numpy as np
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    imgs = [a for a in sys.argv[1:] if not a.startswith("--")]
    ctxs = "0.60,0.65,0.70,0.75"
    for a in sys.argv[1:]:
        if a.startswith("--ctx"):
            ctxs = a.split("=", 1)[1]
    nums = [int(v) for v in imgs] or [13]
    files = [f"/root/reference/testimage/{n:02d}.pgm" for n in nums]

    from hevce_tpu.runtime.native import encode_image_native
    from hevce_tpu.utils.imageio import read_pgm
    exact = {}
    for f in files:
        im = read_pgm(f)
        s, r = encode_image_native(im, 2)
        h, w = im.shape
        mse = ((im.astype(np.int64) - r[:h, :w].astype(np.int64)) ** 2).mean()
        exact[f] = (len(s), float(10 * np.log10(255 * 255 / mse)))
        print(f"exact {os.path.basename(f)}: {exact[f][0]} B "
              f"{exact[f][1]:.3f} dB", flush=True)

    cache = os.path.join(root, ".jaxcache")
    os.makedirs(cache, exist_ok=True)
    for ctx in ctxs.split(","):
        env = dict(os.environ)
        env.pop("HEVCE_RMD", None)
        env.pop("HEVCE_SIG_ZERO", None)
        env["HEVCE_CTX_BIT"] = ctx
        env["HEVCE_ADAPT"] = "0"     # sweep the RAW knob, no second pass
        r = subprocess.run(
            [sys.executable, "-c", _CHILD, json.dumps(files), root, cache],
            capture_output=True, text=True, env=env, timeout=7200)
        line = [ln for ln in r.stdout.splitlines()
                if ln.startswith("RESULT ")]
        if not line:
            print(f"ctx={ctx} FAILED:\n{r.stdout}\n{r.stderr}")
            continue
        res = json.loads(line[0][7:])
        for f, p in zip(files, res):
            es, ep = exact[f]
            print(f"ctx={ctx} {os.path.basename(f)}: "
                  f"dPSNR {p['psnr'] - ep:+.3f} dB  size x{p['size'] / es:.4f}",
                  flush=True)


if __name__ == "__main__":
    main()
