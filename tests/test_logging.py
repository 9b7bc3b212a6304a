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


def test_logger_non_main_process_writes_to_otherranks(tmp_path):
    """Non-main processes used to write nothing; they now tee into
    OtherRanks/ (see test_nonmain_process_logs_under_otherranks)."""
    log = Logger("quiet", experiments_dir=str(tmp_path / "sub"),
                 main_process=False, rank=1)
    log.print("rank line")
    assert os.path.isdir(os.path.join(log.exp_dir, "OtherRanks", "rank_1"))
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


def test_nonmain_process_logs_under_otherranks(tmp_path):
    """Non-main processes tee into OtherRanks/rank_<r>/log/log.txt
    (reference smilelogging `logger.py:240-241,309-310`)."""
    from r2l_tpu.logging_ import Logger
    lg = Logger("mh", experiments_dir=str(tmp_path), main_process=False,
                rank=3)
    lg.print("hello from rank 3")  # console-gated, file-teed
    assert "OtherRanks/rank_3" in lg.log_dir.replace("\\", "/")
    text = open(lg._log_path).read()
    assert "hello from rank 3" in text
    # main process layout unchanged
    lg0 = Logger("mh", experiments_dir=str(tmp_path), main_process=True)
    assert "OtherRanks" not in lg0.log_dir
