"""CLI/config-system parity tests (reference `option.py` surface)."""
import os

from r2l_tpu.configs import (args_to_r2l_config, parse_args, parse_mesh_spec,
                             read_config_file)

CANONICAL = ("--model_name R2L --n_sample_per_ray 16 --netwidth 256 "
             "--netdepth 88 --use_residual --trial.ON "
             "--trial.body_arch resmlp --trial.n_block -1").split()


def test_defaults_match_reference():
    args = parse_args([])
    assert args.netdepth == 8 and args.netwidth == 256
    assert args.N_rand == 4096 and args.lrate == 5e-4
    assert args.lrate_decay == 250 and args.chunk == 32768
    assert args.N_samples == 64 and args.N_importance == 0
    assert args.dataset_type == "llff" and args.testskip == 8
    assert args.model_name == "R2L" and args.N_iters == 200000
    assert args.n_sample_per_ray == 192
    assert args.pseudo_ratio == -1.0 and args.hard_mul == 1
    assert args.use_rand_focal is True


def test_trial_namespace_collapse():
    args = parse_args(CANONICAL)
    assert args.trial.body_arch == "resmlp"
    assert args.trial.n_learnable == 2
    assert not hasattr(args, "trial.ON")


def test_trial_off_means_no_namespace():
    args = parse_args([])
    assert not hasattr(args, "trial")


def test_hard_ratio_parsing():
    assert parse_args(["--hard_ratio", "0.2"]).hard_ratio == 0.2
    assert parse_args(["--hard_ratio", "0.1,0.3"]).hard_ratio == [0.1, 0.3]


def test_n_pose_parsing():
    args = parse_args(["--n_pose_kd", "100", "--n_pose_video", "9,2,1"])
    assert args.n_pose_kd == 100
    assert args.n_pose_video == [9, 2, 1]
    assert parse_args(["--n_pose_kd", "None"]).n_pose_kd is None
    # a bare non-integer scalar is a clean parse-time error, not a
    # ValueError deep inside get_novel_poses
    import pytest as _pytest
    with _pytest.raises(SystemExit):
        parse_args(["--n_pose_video", "40.0"])


def test_video_tag_default():
    assert parse_args([]).video_tag == "pose40"


def test_config_file_roundtrip(tmp_path):
    cfg = tmp_path / "lego.txt"
    cfg.write_text(
        "expname = blender_paper_lego\n"
        "dataset_type = blender\n"
        "no_batching = True  # comment\n"
        "use_viewdirs = False\n"
        "white_bkgd = True\n"
        "lrate_decay = 500\n"
        "N_samples = 64\nN_importance = 128\nN_rand = 1024\n"
        "precrop_iters = 500\nprecrop_frac = 0.5\nhalf_res = True\n")
    args = parse_args(["--config", str(cfg)])
    assert args.expname == "blender_paper_lego"
    assert args.dataset_type == "blender"
    assert args.no_batching is True and args.use_viewdirs is False
    assert args.white_bkgd is True and args.half_res is True
    assert args.lrate_decay == 500 and args.N_importance == 128


def test_cli_overrides_config_file(tmp_path):
    cfg = tmp_path / "c.txt"
    cfg.write_text("N_rand = 1024\n")
    args = parse_args(["--config", str(cfg), "--N_rand", "2048"])
    assert args.N_rand == 2048


REPO_CONFIGS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "configs")


def test_shipped_configs_all_parse():
    """All 57 scene configs shipped in repo configs/ must parse cleanly."""
    names = sorted(os.listdir(REPO_CONFIGS))
    assert len(names) == 57
    for f in names:
        args = parse_args(["--config", os.path.join(REPO_CONFIGS, f)])
        assert args.dataset_type in ("llff", "blender"), f
        assert args.expname, f


def test_shipped_configs_match_reference_set():
    """Same scene/variant matrix as the reference configs/ dir."""
    ref_dir = "/root/reference/configs"
    if not os.path.isdir(ref_dir):
        return
    assert sorted(os.listdir(REPO_CONFIGS)) == sorted(os.listdir(ref_dir))


def test_shipped_config_semantics():
    """Spot-check the variant semantics (reference configs/lego*.txt)."""
    def load(name):
        return parse_args(["--config", os.path.join(REPO_CONFIGS, name)])

    lego = load("lego.txt")
    assert lego.dataset_type == "blender" and lego.half_res is True
    assert lego.use_viewdirs is True and lego.no_batching is True
    assert lego.white_bkgd is True and lego.lrate_decay == 500
    assert lego.N_samples == 64 and lego.N_importance == 128
    assert lego.N_rand == 1024 and lego.precrop_iters == 500

    noview = load("lego_noview.txt")
    assert noview.use_viewdirs is False

    hr = load("lego_800x800.txt")
    assert hr.half_res is False and hr.use_viewdirs is True

    batching = load("lego_usebatching.txt")
    assert batching.no_batching is False  # the flag line is commented out

    fern = load("fern.txt")
    assert fern.dataset_type == "llff" and fern.factor == 8
    assert fern.llffhold == 8 and fern.N_importance == 64
    assert fern.raw_noise_std == 1.0 and fern.use_viewdirs is True

    fern_nv = load("fern_noview.txt")
    assert fern_nv.use_viewdirs is False and fern_nv.no_batching is True

    donerf = load("donerf_barbershop_noview.txt")
    assert donerf.dataset_type == "blender" and donerf.use_viewdirs is False
    assert "donerf_data" in donerf.datadir


def test_args_to_r2l_config_canonical():
    args = parse_args(CANONICAL)
    cfg = args_to_r2l_config(args)
    assert cfg.input_dim == 16 * 3 * 21 == 1008
    assert cfg.netwidth == 256 and cfg.num_blocks == 43
    assert cfg.body_arch == "resmlp" and cfg.use_residual


def test_plucker_input_dim():
    args = parse_args(CANONICAL + ["--plucker"])
    assert args_to_r2l_config(args).input_dim == 6 * 21


def test_mesh_spec():
    assert parse_mesh_spec("") is None
    assert parse_mesh_spec("data:8") == {"data": 8}
    assert parse_mesh_spec("data:4,model:2") == {"data": 4, "model": 2}


def test_store_false_flag_in_config_file(tmp_path):
    """'no_rand_focal = True' in a scene file must DISABLE random focal
    (same meaning as passing --no_rand_focal on the CLI)."""
    cfg = tmp_path / "c.txt"
    cfg.write_text("no_rand_focal = True\n")
    assert parse_args(["--config", str(cfg)]).use_rand_focal is False
    cfg.write_text("no_rand_focal = False\n")
    assert parse_args(["--config", str(cfg)]).use_rand_focal is True


def test_layerwise_netwidths_flag():
    args = parse_args(["--netdepth", "5", "--layerwise_netwidths",
                       "32,16,48,24"])
    cfg = args_to_r2l_config(args)
    assert cfg.layerwise_widths == (32, 16, 48, 24)
    assert cfg.widths == [32, 16, 48, 24, 3]


def test_layerwise_netwidths_rejects_resmlp():
    import pytest
    with pytest.raises(SystemExit):
        args = parse_args(CANONICAL + ["--layerwise_netwidths", "256,256"])
        args_to_r2l_config(args)


def test_vestigial_flags_warn(capsys):
    parse_args(["--use_bn", "--shuffle_input"])
    err = capsys.readouterr().err
    assert "use_bn" in err and "NO effect" in err
    assert "shuffle_input" in err
    parse_args([])  # defaults stay silent
    assert "NO effect" not in capsys.readouterr().err


def test_sl_flags_warn_vestigial(capsys):
    """--sl.ON is accepted (reference smilelogging surface) but warns:
    nothing in R2L reads args.sl (smilelogging/__init__.py:36-40)."""
    from r2l_tpu.configs import parse_args

    parse_args(["--sl.ON"])
    err = capsys.readouterr().err
    assert "--sl.ON" in err and "vestigial" in err
    # default-off parses silently
    parse_args([])
    assert "--sl.ON" not in capsys.readouterr().err
