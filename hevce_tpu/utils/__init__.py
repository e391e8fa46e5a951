"""Utilities: image I/O, metrics, format conversion, evaluation harness."""
