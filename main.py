"""CLI entry preserving the reference's command-line surface.

Same invocations as `/root/reference/main.py` (README.md:51,97,109,123):

  python main.py --model_name R2L --config configs/lego_noview.txt \
      --n_sample_per_ray 16 --netwidth 256 --netdepth 88 \
      --use_residual --trial.ON --trial.body_arch resmlp \
      --render_only --render_test --pretrained_ckpt <ckpt>

plus training, --benchmark, and --convert_to_onnx (which on this framework
emits a StableHLO artifact, a real .onnx, and a TF SavedModel — all with
the same dynamic-batch semantics and reload parity checks).
"""
import os

# Raise the XLA:CPU in-process collective watchdog before jax loads: on
# oversubscribed CPU hosts (shared CI boxes) slow scheduling or a
# concurrent single-core XLA compile can push an in-flight multi-device
# collective rendezvous past the default 40 s termination watchdog ->
# silent SIGABRT (xla/.../rendezvous.cc). 300 s gives legitimate
# stragglers room while still bounding a real deadlock. No effect on TPU.
_flags = os.environ.get("XLA_FLAGS", "")
# guard each flag separately: appending both when only one is user-set
# would override the user's explicit value (last flag wins)
for _f in ("xla_cpu_collective_call_terminate_timeout_seconds",
           "xla_cpu_collective_timeout_seconds"):
    if _f not in _flags:
        _flags = (_flags + f" --{_f}=300").strip()
os.environ["XLA_FLAGS"] = _flags

from r2l_tpu.app import train
from r2l_tpu.configs import parse_args

if __name__ == "__main__":
    train(parse_args())
