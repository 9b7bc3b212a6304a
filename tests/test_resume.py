"""--resume restores the FULL training state (round-3 verdict Missing #1).

The reference restores ``optimizer_state_dict``, ``global_step`` and
``best_psnr/best_psnr_step`` (`main.py:504-509`). These tests pin:
  * resumed training is bit-identical to never having stopped
    (Adam moments + both optax schedule counts survive the msgpack
    round trip);
  * the first post-resume update uses the LR schedule at the resumed
    step, not the warmup value;
  * the mined hard-ray pool survives (TPU-native extra);
  * best_psnr bookkeeping survives so ckpt_best is never overwritten by
    a worse post-resume eval (CLI test in test_app_e2e.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from r2l_tpu.models import R2LConfig, init_r2l
from r2l_tpu.sampler import PointSampler
from r2l_tpu.train import (DistillConfig, init_train_state,
                           make_distill_step, make_lr_schedule)


def _setup(key, warmup="1e-6,10"):
    cfg = R2LConfig(input_dim=8 * 3 * 21, netwidth=16, netdepth=4)
    params = init_r2l(key, cfg)
    dcfg = DistillConfig(batch_size=64, perturb=True, warmup_lr=warmup,
                         n_hard_in=8, n_hard_out=8, hard_mul=2.0)
    sampler = PointSampler(H=4, W=4, focal=5.0, n_sample=8,
                           near=2.0, far=6.0)
    state, tx = init_train_state(key, params, dcfg)
    step = make_distill_step(cfg, dcfg, sampler, tx)
    return cfg, dcfg, sampler, state, tx, step


def _batches(rng, n_steps, n):
    out = []
    for _ in range(n_steps):
        o = np.zeros((n, 3), np.float32)
        d = rng.normal(size=(n, 3)).astype(np.float32)
        rgb = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
        out.append(jnp.asarray(np.concatenate([o, d, rgb], 1)))
    return out


def _roundtrip(tree):
    """msgpack round trip exactly as checkpoint.save/load do."""
    host = jax.tree.map(np.asarray, tree)
    return serialization.msgpack_restore(serialization.to_bytes(host))


def test_resume_equals_continuous(key, rng):
    """save@4 -> restore -> 2 more steps == 6 straight steps, bitwise."""
    cfg, dcfg, sampler, state, tx, step = _setup(key)
    fresh_n = dcfg.batch_size - dcfg.n_hard_out
    batches = _batches(rng, 6, fresh_n)
    keys = [jax.random.key(100 + i) for i in range(6)]

    cont = state
    for i in range(6):
        cont, _ = step(cont, batches[i], keys[i])

    # state was donated into the continuous run — re-init (same key).
    _, _, _, half, _, _ = _setup(key)
    for i in range(4):
        half, _ = step(half, batches[i], keys[i])
    blob = _roundtrip({"params": half.params, "opt_state": half.opt_state,
                       "pool": {"rays": half.pool.rays,
                                "size": half.pool.size,
                                "ptr": half.pool.ptr}})

    # Fresh process: re-init, then restore exactly like app.run_distill.
    _, _, _, state2, tx2, step2 = _setup(key)
    params = serialization.from_state_dict(state2.params, blob["params"])
    opt = serialization.from_state_dict(state2.opt_state, blob["opt_state"])
    pool = state2.pool._replace(
        rays=jnp.asarray(blob["pool"]["rays"]),
        size=jnp.asarray(blob["pool"]["size"], jnp.int32),
        ptr=jnp.asarray(blob["pool"]["ptr"], jnp.int32))
    resumed = state2._replace(params=params, opt_state=opt, pool=pool,
                              step=jnp.asarray(4, jnp.int32))
    for i in range(4, 6):
        resumed, _ = step2(resumed, batches[i], keys[i])

    jax.tree.map(np.testing.assert_array_equal,
                 jax.tree.map(np.asarray, cont.params),
                 jax.tree.map(np.asarray, resumed.params))
    np.testing.assert_array_equal(np.asarray(cont.pool.rays),
                                  np.asarray(resumed.pool.rays))
    assert int(resumed.step) == 6


def test_resume_restores_schedule_count_and_moments(key, rng):
    """The LR-schedule count and Adam moments survive: the first resumed
    update must use schedule(start), not the warmup-start LR."""
    cfg, dcfg, sampler, state, tx, step = _setup(key, warmup="1e-6,10")
    fresh_n = dcfg.batch_size - dcfg.n_hard_out
    for i, b in enumerate(_batches(rng, 4, fresh_n)):
        state, _ = step(state, b, jax.random.key(i))
    blob = _roundtrip({"params": state.params,
                       "opt_state": state.opt_state})

    _, _, _, state2, _, _ = _setup(key, warmup="1e-6,10")
    opt = serialization.from_state_dict(state2.opt_state, blob["opt_state"])
    # optax.adam(schedule) = (ScaleByAdamState, ScaleByScheduleState):
    # both counts must be 4, and the moments nonzero.
    assert int(opt[0].count) == 4
    assert int(opt[1].count) == 4
    mu_max = max(float(jnp.max(jnp.abs(l)))
                 for l in jax.tree.leaves(opt[0].mu))
    assert mu_max > 0.0
    # The schedule value at the restored count differs from the warmup
    # start (the failure mode: a fresh opt_state restarts at step 0).
    sch = make_lr_schedule(dcfg.lrate, dcfg.lrate_decay, dcfg.warmup_lr)
    assert float(sch(int(opt[1].count))) > 2 * float(sch(0))


def test_restore_opt_state_mismatch_warns_not_crashes(key, rng):
    """--freeze_pretrained (or any tx change) after save: the restore
    helper must warn and fall back to the fresh opt_state."""
    import optax

    from r2l_tpu.app import _restore_opt_state

    cfg, dcfg, sampler, state, tx, step = _setup(key)
    blob = _roundtrip({"params": state.params,
                       "opt_state": state.opt_state})
    frozen_tx = optax.set_to_zero()
    frozen = state._replace(opt_state=frozen_tx.init(state.params))

    msgs = []
    logger = type("L", (), {"print": staticmethod(msgs.append)})()
    out = _restore_opt_state(frozen, blob, logger)
    assert any("WARNING" in m for m in msgs)
    # fell back: still the set_to_zero state, not the adam tuple
    assert jax.tree.structure(out.opt_state) == \
        jax.tree.structure(frozen.opt_state)


def test_restore_opt_state_missing_key_warns(key):
    from r2l_tpu.app import _restore_opt_state
    cfg, dcfg, sampler, state, tx, step = _setup(key)
    msgs = []
    logger = type("L", (), {"print": staticmethod(msgs.append)})()
    out = _restore_opt_state(state, {"params": {}}, logger)
    assert any("no optimizer state" in m for m in msgs)
    assert out is state
