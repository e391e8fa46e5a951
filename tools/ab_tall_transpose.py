import os, time
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo-root import; never PYTHONPATH (breaks axon plugin)
import numpy as np
from hevce_tpu.utils.imageio import read_pgm
from hevce_tpu.runtime.native import encode_image_native, decode_stream

import glob
files = sorted(glob.glob("/root/reference/testimage/*.pgm"))
imgs = [read_pgm(f) for f in files]
tall = [(f, im) for f, im in zip(files, imgs) if im.shape[0] > im.shape[1]]
print("tall images:", [os.path.basename(f) for f, _ in tall])
timgs = [im for _, im in tall]

def psnr(a, b):
    m = ((a.astype(np.int64) - b.astype(np.int64)) ** 2).mean()
    return 10 * np.log10(255 * 255 / max(m, 1e-9))

# exact reference-quality encodes (host)
exact = [encode_image_native(im, 2) for im in timgs]

from hevce_tpu.models import wavefront as wf

# (a) transposed+mapped (default path now)
s_t, r_t = wf.encode_many_fast(timgs, 2, batch=6)
# (b) native orientation
os.environ["HEVCE_FAST_NO_TRANSPOSE"] = "1"
s_n, r_n = wf.encode_many_fast(timgs, 2, batch=6)
del os.environ["HEVCE_FAST_NO_TRANSPOSE"]

for i, im in enumerate(timgs):
    se, re_ = exact[i]
    pe = psnr(re_[:im.shape[0], :im.shape[1]], im)
    pt = psnr(r_t[i][:im.shape[0], :im.shape[1]], im)
    pn = psnr(r_n[i][:im.shape[0], :im.shape[1]], im)
    assert np.array_equal(decode_stream(s_t[i]), r_t[i])
    assert np.array_equal(decode_stream(s_n[i]), r_n[i])
    print(f"img {os.path.basename(tall[i][0])}: exact {pe:.3f} dB {len(se)}B | "
          f"transposed d={pt-pe:+.3f} dB size x{len(s_t[i])/len(se):.4f} | "
          f"native d={pn-pe:+.3f} dB size x{len(s_n[i])/len(se):.4f}")

# NOTE: this A/B requires the (reverted) transpose-normalization branch to
# exercise path (a); kept as the measurement record for the ROADMAP "dead
# end" bullet (round 3): transposed+mapped = -0.43..-0.64 dB at +3..5% size
# on the 6 tall Kodak images vs -0.10 dB at +1..2% native. Without that
# branch both paths are identical (HEVCE_FAST_NO_TRANSPOSE is then a no-op).
