"""r2l_tpu — a TPU-native (JAX/XLA/Pallas/pjit) neural light field framework.

A ground-up rebuild of the capabilities of snap-research/R2L ("Distilling
Neural Radiance Field to Neural Light Field", ECCV'22):

  * NeRF teacher training (hierarchical volumetric rendering)
  * pseudo-data generation (teacher renders random poses -> ray shards)
  * R2L student distillation (deep residual-MLP light field)
  * rendering / evaluation / export / benchmarking

Everything is designed TPU-first: functional models over parameter pytrees,
explicit PRNG keys, static shapes under ``jax.jit``, GSPMD sharding over a
``jax.sharding.Mesh`` for multi-chip, and a fused Pallas ray->RGB kernel on
the inference hot path.
"""

__version__ = "0.1.0"
