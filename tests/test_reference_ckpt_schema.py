"""Loading a reference-style torch ``.tar`` checkpoint end to end.

Synthesizes a checkpoint with the exact reference save schema
(`main.py:1516-1542`: ``global_step``, ``best_psnr``,
``network_fn_state_dict`` with DataParallel ``module.`` prefixes,
``optimizer_state_dict``) and drives it through the CLI loader path.
"""
import numpy as np
import pytest

from r2l_tpu import checkpoint as ckpt
from r2l_tpu.models import R2LConfig, apply_r2l, init_r2l


@pytest.fixture
def torch_tar(tmp_path, key):
    torch = pytest.importorskip("torch")
    cfg = R2LConfig(input_dim=8 * 3 * 21, netwidth=32, netdepth=6)
    params = init_r2l(key, cfg)
    sd = {"module." + k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in ckpt.params_to_torch_r2l(params, cfg).items()}
    blob = {
        "global_step": 123456,
        "best_psnr": 31.87,
        "best_psnr_step": 120000,
        "network_fn_state_dict": sd,
        "optimizer_state_dict": {"state": {}, "param_groups": []},
    }
    path = str(tmp_path / "ckpt_123456.tar")
    torch.save(blob, path)
    return path, cfg, params


def test_load_torch_tar_schema(torch_tar):
    path, cfg, params = torch_tar
    blob = ckpt.load_torch_tar(path)
    assert blob["global_step"] == 123456
    sd = blob["network_fn_state_dict"]
    inferred = ckpt.infer_r2l_config_from_state_dict(
        ckpt.strip_module_prefix(sd))
    assert inferred.input_dim == cfg.input_dim
    back = ckpt.torch_r2l_to_params(sd, inferred)
    x = np.random.default_rng(0).normal(size=(8, cfg.input_dim)) \
        .astype(np.float32)
    import jax.numpy as jnp
    np.testing.assert_allclose(
        np.asarray(apply_r2l(back, inferred, jnp.asarray(x))),
        np.asarray(apply_r2l(params, cfg, jnp.asarray(x))),
        rtol=1e-6, atol=1e-7)


def test_cli_render_from_torch_tar(torch_tar, tmp_path, monkeypatch):
    """--pretrained_ckpt <reference .tar> through build_r2l + resume."""
    path, cfg, params = torch_tar
    from r2l_tpu.app import build_r2l
    from r2l_tpu.configs import parse_args
    from r2l_tpu.logging_ import Logger

    args = parse_args([
        "--model_name", "R2L", "--n_sample_per_ray", "8",
        "--netwidth", "32", "--netdepth", "6", "--use_residual",
        "--trial.ON", "--trial.body_arch", "resmlp",
        "--pretrained_ckpt", path, "--resume"])
    logger = Logger("t", experiments_dir=str(tmp_path / "Exp"))
    cfg2, params2, start = build_r2l(args, logger)
    assert start == 123456  # --resume restores the step
    assert cfg2.input_dim == cfg.input_dim
    for a, b in zip(__import__("jax").tree.leaves(params),
                    __import__("jax").tree.leaves(params2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    logger.close()
