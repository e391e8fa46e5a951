"""hevce_tpu — a TPU-native (JAX/XLA/Pallas) HEVC intra-frame still-image encoder.

A from-scratch rebuild of the capabilities of lidongxuan/HEVC-image-encoder-lite
(reference: /root/reference/src/HEVCe.c): an H.265/HEVC intra encoder for 8-bit
grayscale images, producing standard-compliant .h265 streams bit-identical to the
reference encoder, with the RDO mode-search math running densely on TPU.

Architecture (two engines joined by a narrow decision stream):
  * device engine (JAX, int32-exact): borders, 35-mode intra prediction,
    DST4/DCT8/16/32 transforms, RDOQ quantization, reconstruction, SSE —
    evaluated densely over (batch, mode, candidate) axes.
  * host engine (C++, ctypes-bound): CABAC arithmetic coder + context models +
    HEVC syntax serialization + the sequential RD arbiter that owns the live
    CABAC state (reference HEVCe.c:621-1340, :1346-1560).

Public API mirrors the reference contract HEVCImageEncoder
(reference src/HEVCe.h:5-12): see hevce_tpu.models.encoder.encode_image.
"""

from hevce_tpu.version import __version__  # noqa: F401
