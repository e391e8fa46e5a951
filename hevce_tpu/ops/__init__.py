"""Numeric device-side ops: int32 bit-exact HEVC intra-encoder math."""
