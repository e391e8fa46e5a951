#!/usr/bin/env python3
"""External-decoder compliance check via the system libde265.

Closes the last self-attestation loop (VERDICT r3 missing item 3): the
in-repo decoder (csrc decoder + tools/pydecoder.py) is recon-exact but
shares authorship with the encoder. The reference README points users at
third-party HEVC tools as the compliance oracle
(/root/reference/README.md:21-22); this script decodes our streams with
libde265 — an independent, widely-deployed HEVC decoder present on this
system as /usr/lib/x86_64-linux-gnu/libde265.so.0 (no headers installed,
so the stable public C API is bound via ctypes).

Checks (each stream is raw Annex-B bytes as written by the encoder):

  1. the committed REFERENCE golden streams (/root/reference/testimage_out,
     qpd6=4) decode to luma == our encoder's img_rcon for the same input
     (sanity: proves the oracle wiring itself against reference data);
  2. our bit-exact native-engine streams for the full Kodak-24 sweep at a
     chosen qpd6 decode to luma == the engine's img_rcon;
  3. optionally (--fast) the wavefront fast-mode streams decode to luma ==
     the device-chosen recon.

Equality is checked against libde265's PRE-DEBLOCK output
(DE265_DECODER_PARAM_DISABLE_DEBLOCKING, enum value 7 — verified
empirically: with it the committed reference golden stream decodes
byte-exactly to img_rcon; without it the only differences are <=3 px
either side of 8-aligned edges with |delta| <= 4, i.e. exactly the HEVC
luma deblocking footprint). The reference encoder's img_rcon is the
pre-deblock reconstruction (its headers do not disable the loop filter),
and HEVC intra prediction reads UNFILTERED samples, so this comparison
verifies the complete decoding process — header parsing, CABAC, syntax,
prediction, inverse transform — with only the output-stage filter
excluded.

Usage:
    python tools/verify_libde265.py [--qpd6 N] [--fast] [--limit K]

Exit 0 and a one-line PASS summary on success.
"""
import argparse
import ctypes
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DE265_SO = "libde265.so.0"


class LibDe265:
    """Minimal ctypes binding of the libde265 public decoding API."""

    # de265.h enum de265_param (v1.0.x): disable the output-stage loop
    # filters so the decode matches the encoder's pre-deblock recon
    PARAM_DISABLE_DEBLOCKING = 7
    PARAM_DISABLE_SAO = 8

    def __init__(self, path=DE265_SO):
        lib = ctypes.CDLL(path)
        lib.de265_new_decoder.restype = ctypes.c_void_p
        lib.de265_set_parameter_bool.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
        lib.de265_free_decoder.argtypes = [ctypes.c_void_p]
        lib.de265_push_data.restype = ctypes.c_int
        lib.de265_push_data.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
            ctypes.c_int64, ctypes.c_void_p]
        lib.de265_flush_data.argtypes = [ctypes.c_void_p]
        lib.de265_decode.restype = ctypes.c_int
        lib.de265_decode.argtypes = [ctypes.c_void_p,
                                     ctypes.POINTER(ctypes.c_int)]
        lib.de265_get_next_picture.restype = ctypes.c_void_p
        lib.de265_get_next_picture.argtypes = [ctypes.c_void_p]
        lib.de265_get_image_width.restype = ctypes.c_int
        lib.de265_get_image_width.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.de265_get_image_height.restype = ctypes.c_int
        lib.de265_get_image_height.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.de265_get_image_plane.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.de265_get_image_plane.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
        self.lib = lib

    def decode_luma(self, stream: bytes) -> np.ndarray:
        """Decode one Annex-B HEVC stream; return the first picture's luma
        plane as (H, W) uint8. Raises on decode failure / no picture."""
        lib = self.lib
        ctx = lib.de265_new_decoder()
        if not ctx:
            raise RuntimeError("de265_new_decoder failed")
        lib.de265_set_parameter_bool(ctx, self.PARAM_DISABLE_DEBLOCKING, 1)
        lib.de265_set_parameter_bool(ctx, self.PARAM_DISABLE_SAO, 1)
        try:
            err = lib.de265_push_data(ctx, stream, len(stream), 0, None)
            if err != 0:
                raise RuntimeError(f"de265_push_data error {err}")
            lib.de265_flush_data(ctx)
            more = ctypes.c_int(1)
            pic = None
            for _ in range(10000):
                if not more.value:
                    break
                lib.de265_decode(ctx, ctypes.byref(more))
                img = lib.de265_get_next_picture(ctx)
                if img and pic is None:
                    h = lib.de265_get_image_height(img, 0)
                    w = lib.de265_get_image_width(img, 0)
                    stride = ctypes.c_int(0)
                    p = lib.de265_get_image_plane(img, 0,
                                                  ctypes.byref(stride))
                    if not p:
                        raise RuntimeError("null luma plane")
                    buf = np.ctypeslib.as_array(p, (h, stride.value))
                    pic = np.ascontiguousarray(buf[:, :w]).copy()
            if pic is None:
                raise RuntimeError("libde265 produced no picture")
            return pic
        finally:
            lib.de265_free_decoder(ctx)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--qpd6", type=int, default=2)
    ap.add_argument("--fast", action="store_true",
                    help="also verify wavefront fast-mode streams")
    ap.add_argument("--limit", type=int, default=24,
                    help="max Kodak images per tier")
    args = ap.parse_args()

    from hevce_tpu.runtime.native import encode_image_native
    from hevce_tpu.utils.imageio import read_pgm

    dec = LibDe265()
    files = sorted(glob.glob("/root/reference/testimage/*.pgm"))[:args.limit]
    if not files:
        print("no Kodak images found", file=sys.stderr)
        return 1

    # tier 1: committed reference golden streams (qpd6=4) vs our recon
    n_golden = 0
    for f in files:
        g = f.replace("testimage/", "testimage_out/").replace(
            ".pgm", ".h265")
        try:
            golden = open(g, "rb").read()
        except OSError:
            continue
        img = read_pgm(f)
        _, rcon = encode_image_native(img, 4)
        luma = dec.decode_luma(golden)
        assert luma.shape == rcon.shape, (g, luma.shape, rcon.shape)
        assert np.array_equal(luma, rcon), f"golden {g} != img_rcon"
        n_golden += 1
    print(f"tier1 PASS: {n_golden} reference golden streams decode "
          f"(libde265) == img_rcon")

    # tier 2: our native bit-exact streams, full sweep at --qpd6
    for f in files:
        img = read_pgm(f)
        stream, rcon = encode_image_native(img, args.qpd6)
        luma = dec.decode_luma(bytes(stream))
        assert np.array_equal(luma, rcon), f"{f} qpd6={args.qpd6}"
    print(f"tier2 PASS: {len(files)} native streams @ qpd6={args.qpd6} "
          f"decode (libde265) == img_rcon")

    if args.fast:
        from hevce_tpu.models.wavefront import encode_many_fast
        imgs = [read_pgm(f) for f in files]
        streams, recons = encode_many_fast(imgs, args.qpd6)
        for i, (s, r) in enumerate(zip(streams, recons)):
            luma = dec.decode_luma(bytes(s))
            h, w = r.shape
            assert np.array_equal(luma[:h, :w], r), f"fast {files[i]}"
        print(f"tier3 PASS: {len(files)} fast-mode streams @ "
              f"qpd6={args.qpd6} decode (libde265) == device recon")

    print("verify_libde265: ALL PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
