#!/usr/bin/env python3
"""Fast-mode quality/size A/B over RMD and rate-model knob configs.

Decisions are bit-identical CPU-vs-TPU (round-3 fix, verified by
tools/verify_cross_platform.py), so the quality/size envelope of any config
can be measured on the CPU backend; only THROUGHPUT needs the real chip.
Each config runs in a fresh subprocess (the knobs are import-time module
constants that shape every compiled front core).

Usage:
    python tools/ab_quality.py [--images N] [--qpd6 Q] \
        [--config LABEL=RMD:CTX:SIG ...]

Config string: RMD is 'off' or 'K,T'; CTX/SIG are bit floats (empty = repo
default). Default config set = the VERDICT r3 item-2/3 grid.

The exact-engine per-image baselines (PSNR, stream size) are cached in
/tmp/ab_exact_q{qpd6}.json — delete to regenerate.
"""
import argparse
import glob
import json
import os
import subprocess
import sys
import time

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo-root import; never PYTHONPATH (breaks axon plugin)

_CHILD = """
import json, os, sys, time
import numpy as np
import jax
jax.config.update('jax_platforms', 'cpu')
cache = os.environ.get('HEVCE_AB_CACHE')
if cache:
    os.makedirs(cache, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
from hevce_tpu.utils.imageio import read_pgm
from hevce_tpu.models.wavefront import encode_many_fast

files, qpd6 = json.loads(sys.argv[1]), int(sys.argv[2])
imgs = [read_pgm(f) for f in files]
t0 = time.time()
streams, recons = encode_many_fast(imgs, qpd6)
dt = time.time() - t0
out = []
for im, s, r in zip(imgs, streams, recons):
    h, w = im.shape
    mse = ((im.astype(np.int64) - r[:h, :w].astype(np.int64)) ** 2).mean()
    psnr = 10 * np.log10(255 * 255 / max(mse, 1e-9))
    out.append({'size': len(s), 'psnr': float(psnr)})
print('RESULT ' + json.dumps({'per_image': out, 'wall_s': dt}))
"""


def exact_baseline(files, qpd6):
    cache = f"/tmp/ab_exact_q{qpd6}.json"
    if os.path.exists(cache):
        d = json.load(open(cache))
        if d.get("files") == files:
            return d["per_image"]
    import numpy as np

    from hevce_tpu.runtime.native import encode_image_native
    from hevce_tpu.utils.imageio import read_pgm
    out = []
    for f in files:
        im = read_pgm(f)
        s, r = encode_image_native(im, qpd6)
        h, w = im.shape
        mse = ((im.astype(np.int64) - r[:h, :w].astype(np.int64)) ** 2).mean()
        out.append({"size": len(s),
                    "psnr": float(10 * np.log10(255 * 255 / max(mse, 1e-9)))})
        print(f"  exact {os.path.basename(f)}: {out[-1]['size']} B "
              f"{out[-1]['psnr']:.3f} dB", flush=True)
    json.dump({"files": files, "per_image": out}, open(cache, "w"))
    return out


def run_config(label, rmd, ctx, sig, files, qpd6):
    env = dict(os.environ)
    env.pop("HEVCE_RMD", None)
    env.pop("HEVCE_CTX_BIT", None)
    env.pop("HEVCE_SIG_ZERO", None)
    env["HEVCE_AB_CACHE"] = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jaxcache")
    if rmd:
        env["HEVCE_RMD"] = rmd
    if ctx:
        env["HEVCE_CTX_BIT"] = ctx
    if sig:
        env["HEVCE_SIG_ZERO"] = sig
    r = subprocess.run([sys.executable, "-c", _CHILD,
                        json.dumps(files), str(qpd6)],
                       capture_output=True, text=True, env=env,
                       timeout=7200)
    for line in r.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise RuntimeError(f"config {label} failed:\n{r.stdout}\n{r.stderr}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=6)
    ap.add_argument("--qpd6", type=int, default=2)
    ap.add_argument("--config", action="append", default=None,
                    help="LABEL=RMD:CTX:SIG (RMD 'off' or 'K,T')")
    args = ap.parse_args()

    files = sorted(glob.glob("/root/reference/testimage/*.pgm"))[:args.images]
    assert files, "no Kodak images"
    print(f"{len(files)} images @ qpd6={args.qpd6}", flush=True)
    exact = exact_baseline(files, args.qpd6)

    configs = args.config or [
        "dense-default=off::",
        "rmd12,4-default=12,4::",
        "rmd10,3-default=10,3::",
        "rmd12,4-c80=12,4:0.80:",
        "dense-c80=off:0.80:",
    ]
    print(f"{'config':24} {'dPSNR mean':>10} {'min':>8} {'size':>8} "
          f"{'wall_s':>7}")
    for cs in configs:
        label, spec = cs.split("=", 1)
        rmd, ctx, sig = (spec.split(":") + ["", ""])[:3]
        if rmd == "off":
            rmd = "off"
        res = run_config(label, rmd, ctx, sig, files, args.qpd6)
        dp = [p["psnr"] - e["psnr"] for p, e in zip(res["per_image"], exact)]
        rt = [p["size"] / e["size"] for p, e in zip(res["per_image"], exact)]
        import statistics as st
        print(f"{label:24} {st.mean(dp):>+10.3f} {min(dp):>+8.3f} "
              f"x{st.mean(rt):>7.4f} {res['wall_s']:>7.1f}", flush=True)


if __name__ == "__main__":
    main()
