"""CI for tools/verify_released_ckpt.py — the one-command released-
checkpoint parity harness (BASELINE.md north star; the real artifact is
env-blocked, so the harness is exercised end-to-end against a synthetic
torch ``.tar`` built by ``checkpoint.params_to_torch_r2l``)."""
import json
import os

import jax
import numpy as np
import pytest

from r2l_tpu import checkpoint as ckpt
from r2l_tpu.models.r2l import R2LConfig, init_r2l
from tools.verify_released_ckpt import main as verify_main

L = 10
N_SAMPLE = 4
CFG = R2LConfig(input_dim=N_SAMPLE * 3 * (2 * L + 1), netwidth=32,
                netdepth=6, precision="highest")


@pytest.fixture(scope="module")
def synthetic_release(tmp_path_factory):
    """A torch .tar in the reference save_ckpt schema + a blender-format
    scene whose test images ARE this model's own renders (so the harness
    must reproduce them up to PNG quantization, ~50+ dB)."""
    torch = pytest.importorskip("torch")
    import imageio.v2 as imageio

    from r2l_tpu.evaluate import make_r2l_frame_fn
    from r2l_tpu.rays import pose_spherical
    from r2l_tpu.sampler import PointSampler

    base = tmp_path_factory.mktemp("release")
    params = init_r2l(jax.random.key(7), CFG)

    # reference save_ckpt schema (`main.py:1516-1542`)
    sd = {k: torch.from_numpy(np.array(v, copy=True))
          for k, v in ckpt.params_to_torch_r2l(params, CFG).items()}
    tar = str(base / "lego.tar")
    torch.save({"global_step": 1200000, "best_psnr": 31.87,
                "best_psnr_step": 1190000,
                "network_fn_state_dict": sd}, tar)

    # blender scene: 2 test frames rendered by the model itself
    H = W = 16
    cax = 0.6911112070083618
    focal = 0.5 * W / np.tan(0.5 * cax)
    scene = str(base / "scene")
    sampler = PointSampler(H=H, W=W, focal=focal, n_sample=N_SAMPLE,
                           near=2.0, far=6.0)
    frame_fn = make_r2l_frame_fn(params, CFG, sampler, embed_L=L,
                                 use_pallas=False)
    rng = np.random.default_rng(3)
    for split, n in (("train", 1), ("val", 1), ("test", 2)):
        os.makedirs(os.path.join(scene, split), exist_ok=True)
        frames = []
        for k in range(n):
            c2w = pose_spherical(rng.uniform(-180, 180),
                                 rng.uniform(-60, -20), 4.0)
            img = np.asarray(frame_fn(c2w.astype(np.float32)[:3, :4]),
                             np.float32)
            rgba = np.concatenate([img, np.ones((H, W, 1), np.float32)],
                                  -1)
            imageio.imwrite(os.path.join(scene, f"{split}/r_{k}.png"),
                            (np.clip(rgba, 0, 1) * 255).astype(np.uint8))
            frames.append({"file_path": f"./{split}/r_{k}",
                           "transform_matrix": c2w.tolist()})
        with open(os.path.join(scene, f"transforms_{split}.json"),
                  "w") as f:
            json.dump({"camera_angle_x": cax, "frames": frames}, f)
    return tar, scene


def test_verify_passes_on_faithful_conversion(synthetic_release, capsys):
    tar, scene = synthetic_release
    rc = verify_main(["--ckpt", tar, "--datadir", scene,
                      "--paths", "xla", "--expect_psnr", "45.0"])
    out = capsys.readouterr().out
    assert rc == 0
    line = [l for l in out.splitlines() if l.startswith("{")][-1]
    rep = json.loads(line)
    assert rep["pass"] is True
    # PNG-quantization-limited self-render: comfortably above 45 dB
    assert rep["results"]["xla"]["psnr"] > 45.0
    assert "PASS" in out
    # the paper-comparable table columns (r4 verdict Next #4): SSIM and
    # FLIP always; LPIPS null without weights (env-blocked offline)
    assert rep["results"]["xla"]["ssim"] > 0.99
    assert rep["results"]["xla"]["flip"] is not None
    assert rep["results"]["xla"]["lpips"] is None
    assert "FLIP" in out and "LPIPS" in out


def test_report_only_all_skipped_is_not_pass(synthetic_release, capsys):
    """Report-only mode (no --expect_psnr) where every path is skipped
    must NOT read as success (advisor r4 finding)."""
    tar, scene = synthetic_release
    rc = verify_main(["--ckpt", tar, "--datadir", scene,
                      "--paths", "pallas", "--act", "lrelu",
                      "--platform", "cpu"])
    out = capsys.readouterr().out
    assert rc == 1
    rep = json.loads([l for l in out.splitlines()
                      if l.startswith("{")][-1])
    assert rep["pass"] is False
    assert "nothing was verified" in out


def test_verify_fails_loudly_when_off(synthetic_release, capsys):
    tar, scene = synthetic_release
    rc = verify_main(["--ckpt", tar, "--datadir", scene,
                      "--paths", "xla", "--expect_psnr", "99.0"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "FAIL" in out


def test_verify_report_only_mode(synthetic_release, capsys):
    """Without --expect_psnr: report PSNRs, exit 0."""
    tar, scene = synthetic_release
    rc = verify_main(["--ckpt", tar, "--datadir", scene, "--paths", "xla"])
    assert rc == 0
    rep = json.loads([l for l in capsys.readouterr().out.splitlines()
                      if l.startswith("{")][-1])
    assert rep["expect_psnr"] is None


def test_verify_native_msgpack_input(synthetic_release, tmp_path, capsys):
    """The harness also takes native .msgpack checkpoints (so a distilled
    model can be checked with the same command)."""
    tar, scene = synthetic_release
    params = ckpt.torch_r2l_to_params(
        ckpt.load_torch_tar(tar)["network_fn_state_dict"], CFG)
    native = str(tmp_path / "ckpt.msgpack")
    ckpt.save_checkpoint(native, {"params": params},
                         meta={"global_step": 5})
    rc = verify_main(["--ckpt", native, "--datadir", scene,
                      "--paths", "xla", "--expect_psnr", "45.0"])
    assert rc == 0


def test_empty_paths_and_all_skipped_fail_loudly(synthetic_release):
    """An empty --paths list or a selection where every kernel path is
    unsupported must error, not report an unconditional PASS."""
    tar, scene = synthetic_release
    with pytest.raises(SystemExit, match="no inference path"):
        verify_main(["--ckpt", tar, "--datadir", scene, "--paths", " , ",
                  "--platform", "cpu"])
    # non-relu act: the fused kernels are unsupported -> the pallas path
    # is SKIPPED (not silently rendered through XLA under a kernel
    # label), and with --expect_psnr set that cannot count as a PASS.
    with pytest.raises(SystemExit, match="all skipped"):
        verify_main(["--ckpt", tar, "--datadir", scene, "--paths", "pallas",
                  "--act", "lrelu", "--expect_psnr", "30.0",
                  "--platform", "cpu"])
