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
from r2l_tpu.app import train
from r2l_tpu.configs import parse_args

if __name__ == "__main__":
    train(parse_args())
