"""Model zoo: NeRF teacher and R2L residual-MLP light-field student.

Models are functional: ``init_*(key, cfg) -> params`` pytrees and
``apply_*(params, cfg, x) -> y`` pure functions, jit/pjit/vmap/grad-ready.
"""
from .nerf import NeRFConfig, init_nerf, apply_nerf
from .r2l import R2LConfig, init_r2l, apply_r2l, r2l_num_blocks

__all__ = [
    "NeRFConfig", "init_nerf", "apply_nerf",
    "R2LConfig", "init_r2l", "apply_r2l", "r2l_num_blocks",
]
