"""Encoder models: device-side dense CU candidate evaluation + host RD arbiter."""
