"""xplane-profile the wavefront fast-mode slice on the live device.

Recipe per CLAUDE.md: run the slice under jax.profiler.trace, parse the
*.xplane.pb with tensorflow.tsl.profiler.protobuf.xplane_pb2, and aggregate
device event durations by metadata name. Prints the top-K ops by total
device time plus the aggregate step stats — this is the tool that found the
round-2 gather/dynamic-slice pathologies.

Usage: python tools/profile_front.py [B] [top_k]
"""
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    top_k = int(sys.argv[2]) if len(sys.argv) > 2 else 40

    from hevce_tpu.utils.imageio import read_pgm
    from hevce_tpu.models import wavefront as wf
    import jax

    files = sorted(glob.glob("/root/reference/testimage/*.pgm"))
    imgs = [read_pgm(f) for f in files]
    land = [im for im in imgs if im.shape[0] <= im.shape[1]][:B]

    # warm (compile) outside the trace
    out, _ = wf._dispatch_batch(land, 2, want_recon=False)
    np.asarray(out[:, -4:])

    trace_dir = "/tmp/front_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        t0 = time.time()
        out, _ = wf._dispatch_batch(land, 2, want_recon=False)
        np.asarray(out[:, -4:])
        dt = time.time() - t0
    print(f"traced slice: B={len(land)} {dt:.3f}s", flush=True)

    report(trace_dir, top_k)


def report(trace_dir, top_k):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    assert paths, f"no xplane under {trace_dir}"
    agg = {}          # name -> [total_ps, count]
    plane_totals = {}
    for p in paths:
        sp = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            sp.ParseFromString(f.read())
        for plane in sp.planes:
            if "TPU" not in plane.name and "/device" not in plane.name.lower():
                continue
            md = {m.id: m.name for m in plane.event_metadata.values()}
            tot = 0
            for line in plane.lines:
                for ev in line.events:
                    name = md.get(ev.metadata_id, str(ev.metadata_id))
                    a = agg.setdefault(name, [0, 0])
                    a[0] += ev.duration_ps
                    a[1] += 1
                    tot += ev.duration_ps
            plane_totals[plane.name] = plane_totals.get(plane.name, 0) + tot
    for name, tot in plane_totals.items():
        print(f"plane {name}: {tot/1e12:.4f}s total event time")
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:top_k]
    print(f"{'total_ms':>9} {'n':>7} {'us/ev':>8}  name")
    for name, (ps, n) in rows:
        print(f"{ps/1e9:9.2f} {n:7d} {ps/1e6/max(n,1):8.1f}  {name[:110]}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "report":
        report(sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 40)
    else:
        main()
