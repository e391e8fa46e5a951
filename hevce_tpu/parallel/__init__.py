"""Multi-device scaling: image-batch sharding of the dense CU-candidate math
over a jax.sharding.Mesh (ICI collectives inserted by XLA)."""
