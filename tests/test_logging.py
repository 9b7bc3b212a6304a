"""Logging runtime tests (experiment dirs, metric trackers, ETA)."""
import os

from r2l_tpu.logging_ import AverageMeter, Logger, LossLine, Timer, check_path


def test_logger_creates_experiment_layout(tmp_path):
    log = Logger("myexp", experiments_dir=str(tmp_path))
    assert os.path.isdir(log.weights_dir)
    assert os.path.isdir(log.gen_img_dir)
    assert os.path.isdir(log.log_dir)
    log.print("hello", "world")
    log.close()
    with open(os.path.join(log.log_dir, "log.txt")) as f:
        content = f.read()
    assert "hello world" in content and log.expid in content
    assert os.path.exists(os.path.join(log.log_dir, "script.sh"))
    assert os.path.exists(os.path.join(log.log_dir, "git.json"))


def test_logger_debug_routes_to_debug_dir(tmp_path):
    log = Logger("x", experiments_dir=str(tmp_path), debug=True)
    assert "Debug_Dir" in log.exp_dir
    log.close()


def test_logger_resume_latest(tmp_path):
    a = Logger("exp", experiments_dir=str(tmp_path))
    a.close()
    b = Logger("exp", experiments_dir=str(tmp_path),
               resume_time_id="latest")
    assert b.exp_dir == a.exp_dir
    b.close()


def test_logger_non_main_process_writes_nothing(tmp_path):
    log = Logger("quiet", experiments_dir=str(tmp_path / "sub"),
                 main_process=False)
    log.print("should not appear")
    assert not os.path.isdir(str(tmp_path / "sub"))
    log.close()


def test_average_meter():
    m = AverageMeter("t")
    m.update(1.0)
    m.update(3.0)
    assert m.avg == 2.0 and m.val == 3.0


def test_lossline_ema():
    ll = LossLine(ema=0.5)
    ll.update("loss", 1.0)
    v = ll.update("loss", 3.0)
    assert v == 2.0
    assert "loss" in ll.format()


def test_timer_eta_format():
    t = Timer(10)
    assert "/" in t()


def test_check_path_globs(tmp_path):
    p = tmp_path / "ckpt_0001.msgpack"
    p.write_bytes(b"x")
    assert check_path(str(tmp_path / "ckpt_*.msgpack")) == str(p)
    assert check_path("") == ""


def test_code_cache(tmp_path):
    import zipfile
    src = tmp_path / "proj"
    (src / "pkg").mkdir(parents=True)
    (src / "pkg" / "a.py").write_text("x = 1\n")
    (src / "readme.txt").write_text("not python\n")
    log = Logger("c", experiments_dir=str(tmp_path / "Exp"))
    out = log.cache_code(str(src))
    names = zipfile.ZipFile(out).namelist()
    assert "pkg/a.py" in names and "readme.txt" not in names
    log.close()
