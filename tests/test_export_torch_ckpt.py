"""tools/export_torch_ckpt.py: native .msgpack -> reference-schema .tar
roundtrips (the 'switch back to the reference' direction of the
bidirectional converter story)."""
import jax
import numpy as np
import pytest

from r2l_tpu import checkpoint as ckpt
from r2l_tpu.models.nerf import NeRFConfig, init_nerf
from r2l_tpu.models.r2l import R2LConfig, init_r2l
from tools.export_torch_ckpt import main as export_main


def _tree_equal(a, b):
    jax.tree.map(lambda x, y: np.testing.assert_array_equal(
        np.asarray(x, np.float32), np.asarray(y, np.float32)), a, b)


def test_r2l_msgpack_to_tar_roundtrip(key, tmp_path):
    pytest.importorskip("torch")
    cfg = R2LConfig(input_dim=4 * 3 * 21, netwidth=32, netdepth=6)
    params = init_r2l(key, cfg)
    native = str(tmp_path / "ckpt.msgpack")
    ckpt.save_checkpoint(native, {"params": params},
                         meta={"global_step": 7, "best_psnr": 12.5,
                               "best_psnr_step": 6})
    tar = str(tmp_path / "out.tar")
    assert export_main(["--ckpt", native, "--out", tar]) == 0

    blob = ckpt.load_torch_tar(tar)
    assert blob["global_step"] == 7 and blob["best_psnr"] == 12.5
    sd = blob["network_fn_state_dict"]
    cfg2 = ckpt.infer_r2l_config_from_state_dict(sd)
    assert (cfg2.netwidth, cfg2.num_blocks) == (32, cfg.num_blocks)
    _tree_equal(ckpt.torch_r2l_to_params(sd, cfg2), params)


@pytest.mark.parametrize("viewdirs", [True, False])
def test_teacher_msgpack_to_tar_roundtrip(key, tmp_path, viewdirs):
    pytest.importorskip("torch")
    ncfg = NeRFConfig(D=3, W=16, skips=(1,), use_viewdirs=viewdirs,
                      input_ch=63, input_ch_views=27 if viewdirs else 0,
                      output_ch=5 if viewdirs else 4)
    k1, k2 = jax.random.split(key)
    pc, pf = init_nerf(k1, ncfg), init_nerf(k2, ncfg)
    native = str(tmp_path / "teacher.msgpack")
    ckpt.save_checkpoint(native, {"coarse": pc, "fine": pf,
                                  "opt_state": {}},
                         meta={"global_step": 9})
    tar = str(tmp_path / "teacher.tar")
    args = ["--ckpt", native, "--out", tar, "--model_name", "nerf"]
    assert export_main(args) == 0   # viewdirs inferred from the tree

    blob = ckpt.load_torch_tar(tar)
    assert blob["global_step"] == 9
    _tree_equal(ckpt.torch_nerf_to_params(
        blob["network_fn_state_dict"], ncfg), pc)
    _tree_equal(ckpt.torch_nerf_to_params(
        blob["network_fine_state_dict"], ncfg), pf)


def test_params_to_torch_nerf_is_inverse(key):
    ncfg = NeRFConfig(D=4, W=16, skips=(2,), use_viewdirs=True,
                      input_ch=63, input_ch_views=27, output_ch=5)
    pc = init_nerf(key, ncfg)
    sd = ckpt.params_to_torch_nerf(pc, ncfg)
    _tree_equal(ckpt.torch_nerf_to_params(sd, ncfg), pc)


def test_r2l_linear_tail_export_uses_reference_keys(key, tmp_path):
    """--linear_tail exports tail weights under 'tail.*' (the reference
    naming for a sigmoid-less tail) instead of 'tail.0.*'."""
    pytest.importorskip("torch")
    cfg = R2LConfig(input_dim=4 * 3 * 21, netwidth=32, netdepth=6,
                    linear_tail=True)
    params = init_r2l(key, cfg)
    native = str(tmp_path / "lt.msgpack")
    ckpt.save_checkpoint(native, {"params": params},
                         meta={"global_step": 1})
    tar = str(tmp_path / "lt.tar")
    assert export_main(["--ckpt", native, "--out", tar,
                        "--linear_tail"]) == 0
    sd = ckpt.load_torch_tar(tar)["network_fn_state_dict"]
    assert "tail.weight" in sd and "tail.0.weight" not in sd
    cfg2 = ckpt.infer_r2l_config_from_state_dict(sd)
    assert cfg2.linear_tail
    _tree_equal(ckpt.torch_r2l_to_params(sd, cfg2), params)


def test_r2l_mlp_body_msgpack_to_tar_roundtrip(key, tmp_path):
    """mlp-body student checkpoints export too (the body restores from
    msgpack as a stringified-index dict; the old hand-rolled normalizer
    KeyError'd on it)."""
    pytest.importorskip("torch")
    cfg = R2LConfig(input_dim=4 * 3 * 21, netwidth=32, netdepth=6,
                    body_arch="mlp")
    params = init_r2l(key, cfg)
    native = str(tmp_path / "ckpt.msgpack")
    ckpt.save_checkpoint(native, {"params": params},
                         meta={"global_step": 3})
    tar = str(tmp_path / "out.tar")
    assert export_main(["--ckpt", native, "--out", tar]) == 0

    blob = ckpt.load_torch_tar(tar)
    sd = blob["network_fn_state_dict"]
    cfg2 = ckpt.infer_r2l_config_from_state_dict(sd)
    assert cfg2.body_arch == "mlp" and cfg2.netdepth == 6
    _tree_equal(ckpt.torch_r2l_to_params(sd, cfg2), params)
