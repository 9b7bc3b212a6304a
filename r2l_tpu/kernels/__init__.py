"""Pallas TPU kernels — the hand-scheduled hot paths.

Only ops where XLA's default schedule leaves real performance on the table
live here; everything else trusts the compiler. The flagship is the fused
R2L light-field forward (`r2l_pallas.py`): the XLA schedule streams the
[n_ray, W] activation matrix to HBM between every one of the 88 layers
(~21 GB of traffic per 400x400 frame — measured HBM-bound at ~40 FPS on
v5e), while the fused kernel keeps the whole 11 MB bf16 weight stack VMEM-
resident and the activation tile on-chip for all layers, making the frame
compute-bound (~2x).
"""
from .r2l_pallas import fused_r2l_apply, prepare_fused_params

__all__ = ["fused_r2l_apply", "prepare_fused_params"]
