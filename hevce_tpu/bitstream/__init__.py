"""Host-side bitstream engine: CABAC arithmetic coder, context models, HEVC
syntax serialization and headers.

Two implementations with identical behavior:
  * this Python package — readable reference, used by tests and small encodes;
  * the native C++ engine (csrc/), ctypes-bound — the production arbiter/packer.
"""
