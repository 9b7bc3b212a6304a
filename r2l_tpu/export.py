"""Model export + numerical parity check.

The reference exports to ONNX (opset 11, dynamic batch axis) and verifies
with onnxruntime at ``rtol=1e-3, atol=1e-5`` (`/root/reference/main.py:
831-885, 1106-1122`). The TPU-native analog is ``jax.export``: a serialized
StableHLO artifact with a symbolic batch dimension, reloadable by any JAX
process (and convertible to TF SavedModel / TFLite downstream). The parity
check deserializes the artifact and asserts the same tolerances as the
reference against the live forward pass.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from .models.r2l import R2LConfig, apply_r2l

RTOL, ATOL = 1e-3, 1e-5  # reference tolerances (`main.py:879-882`)


def export_r2l(params: dict, cfg: R2LConfig, out_dir: str,
               sample_batch: int = 4096) -> str:
    """Serialize the R2L forward to ``<out_dir>/r2l.stablehlo``.

    The batch axis is exported symbolically, matching the reference's
    dynamic-batch ONNX axis (`main.py:1111-1115`).

    The artifact is always the FULL-PRECISION forward (params are stored
    f32; ``compute_dtype`` only selects the on-TPU activation dtype):
    the reference likewise exports its f32 torch model, and the
    rtol=1e-3/atol=1e-5 parity check below is meaningless for a bf16
    graph, whose two compilations legitimately differ by ~bf16 eps.
    """
    import dataclasses

    from jax import export as jexport

    os.makedirs(out_dir, exist_ok=True)
    cfg = dataclasses.replace(cfg, compute_dtype=jnp.float32,
                              precision="highest")

    def forward(x):
        return apply_r2l(params, cfg, x)

    batch = jexport.symbolic_shape("b")[0]
    spec = jax.ShapeDtypeStruct((batch, cfg.input_dim), jnp.float32)
    exported = jexport.export(jax.jit(forward))(spec)
    blob = exported.serialize()

    path = os.path.join(out_dir, "r2l.stablehlo")
    with open(path, "wb") as f:
        f.write(blob)

    check_export(path, params, cfg, sample_batch)
    return path


def check_export(path: str, params: dict, cfg: R2LConfig,
                 sample_batch: int = 4096) -> None:
    """Reload the artifact and assert parity (reference ``check_onnx``).
    Compares against the f32 forward — the graph ``export_r2l`` writes."""
    import dataclasses

    from jax import export as jexport

    cfg = dataclasses.replace(cfg, compute_dtype=jnp.float32,
                              precision="highest")

    with open(path, "rb") as f:
        restored = jexport.deserialize(f.read())

    x = jax.random.normal(jax.random.key(0),
                          (sample_batch, cfg.input_dim), jnp.float32)
    got = np.asarray(restored.call(x))
    # jit: eager apply_r2l would dispatch the 88-layer net op-by-op
    # (~30 ms/call through this image's device tunnel)
    want = np.asarray(jax.jit(
        lambda x: apply_r2l(params, cfg, x))(x))
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)
