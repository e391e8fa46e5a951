"""Command-line encoder driver.

Mirrors the reference CLI surface (reference src/HEVCeMain.c:138-230):

    python -m hevce_tpu <input-image> <out.h265> [qpd6 0-4] [rcon.pgm]

Arguments are order-free like the reference: any argument that is a single
character '0'..'4' is qpd6 (default 3, src/HEVCeMain.c:153-170); the first
remaining argument is the input, second the output stream, third the optional
reconstructed-image output. Any PIL-readable input is accepted (converted to
grayscale); the reference accepts only P5 PGM.

--fast selects the wavefront device mode (models/wavefront.py): a compliant
HEVC stream from greedy on-device decisions — NOT bit-identical to the
reference RDO output, which the default engines produce.

Prints the same result block (ratio / bpp / MSE / PSNR, src/HEVCeMain.c:204-211)
plus throughput.
"""
import sys
import time

import numpy as np


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    qpd6 = 3
    engine = "native"
    rest = []
    for a in argv:
        if len(a) == 1 and a in "01234":
            qpd6 = int(a)
        elif a == "--engine=python":
            engine = "python"
        elif a == "--engine=native":
            engine = "native"
        elif a in ("--fast", "--engine=fast"):
            engine = "fast"   # wavefront device mode: compliant stream,
            #                   NOT bit-identical to the reference RDO
        else:
            rest.append(a)
    if not 1 <= len(rest) <= 3:
        print(__doc__)
        return 1
    src = rest[0]
    dst = rest[1] if len(rest) > 1 else None
    rcon_path = rest[2] if len(rest) > 2 else None

    from hevce_tpu.utils.imageio import to_grayscale, write_pgm
    from hevce_tpu.utils.metrics import mse_psnr

    try:
        img = to_grayscale(src)
    except (OSError, ValueError) as e:
        print(f"error: cannot read input image '{src}': {e}")
        return 1
    print(f"  input           : {src} ({img.shape[1]}x{img.shape[0]})")
    print(f"  qpd6            : {qpd6}  (QP = {6 * qpd6 + 4})")
    print(f"  engine          : {engine}")

    t0 = time.time()
    if engine == "python":
        from hevce_tpu.models.encoder import encode_image
        stream, rcon = encode_image(img, qpd6)
    elif engine == "fast":
        from hevce_tpu.models.wavefront import encode_image_fast
        stream, rcon = encode_image_fast(img, qpd6)
    else:
        from hevce_tpu.runtime.native import encode_image_native
        stream, rcon = encode_image_native(img, qpd6)
    dt = time.time() - t0

    if dst:
        with open(dst, "wb") as f:
            f.write(stream)
    if rcon_path:
        write_pgm(rcon_path, rcon)

    mse, psnr = mse_psnr(img, rcon)
    npix = img.size
    print(f"  stream length                   = {len(stream)} B")
    print(f"  compression ratio               = {npix / len(stream):.2f}")
    print(f"  bits per pixel                  = {8.0 * len(stream) / npix:.5f}")
    print(f"  mean square error (MSE)         = {mse:.7f}")
    print(f"  peak signal/noise ratio (PSNR)  = {psnr:.4f} dB")
    print(f"  encode time                     = {dt:.2f} s ({npix / 1e6 / dt:.3f} MP/s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
