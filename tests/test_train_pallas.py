"""Fused training VJP vs jax.grad of apply_r2l (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from r2l_tpu.encoding import r2l_embed
from r2l_tpu.kernels.r2l_train_pallas import (bwd_group,
                                              make_fused_train_apply,
                                              train_fwd)
from r2l_tpu.kernels.r2l_pallas import prepare_fused_params_pe
from r2l_tpu.models import R2LConfig, apply_r2l, init_r2l

CFG = R2LConfig(input_dim=6 * 9, netdepth=8, netwidth=32,
                use_residual=True, body_arch="resmlp",
                compute_dtype=jnp.bfloat16, precision="default")
DIM, L, N, TILE = 6, 4, 64, 32


@pytest.fixture(scope="module")
def setup():
    params = init_r2l(jax.random.key(0), CFG)
    pts = jax.random.uniform(jax.random.key(1), (N, DIM), minval=-2.0,
                             maxval=2.0)
    return params, pts


def test_train_fwd_matches_apply(setup):
    params, pts = setup
    fp = prepare_fused_params_pe(params, CFG, DIM, L,
                                 weight_dtype=jnp.bfloat16)
    rgb, stash = train_fwd(fp, CFG, pts, DIM, L, tile=TILE, interpret=True)
    want = apply_r2l(params, CFG, r2l_embed(pts, L))
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(want),
                               rtol=2e-2, atol=2e-2)
    assert stash.shape == (2 * CFG.num_blocks + 1, N, CFG.netwidth)
    assert np.isfinite(np.asarray(stash, np.float32)).all()


def test_fused_vjp_grads_exact_in_f32(setup):
    """In f32 the fused VJP reproduces jax.grad to float precision —
    the backward math is exact, not approximate."""
    import dataclasses
    params, pts = setup
    cfg32 = dataclasses.replace(CFG, compute_dtype=jnp.float32,
                                precision="highest")
    tgt = jax.random.uniform(jax.random.key(2), (N, 3))
    fused_apply = make_fused_train_apply(cfg32, DIM, L, tile=TILE,
                                         group_blocks=2,
                                         compute_dtype=jnp.float32,
                                         interpret=True)
    gf = jax.grad(lambda p: jnp.mean((fused_apply(p, pts) - tgt) ** 2))(
        params)
    gr = jax.grad(lambda p: jnp.mean(
        (apply_r2l(p, cfg32, r2l_embed(pts, L)) - tgt) ** 2))(params)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        assert np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9) < 1e-5


def test_fused_vjp_grads_match_autodiff(setup):
    params, pts = setup
    tgt = jax.random.uniform(jax.random.key(2), (N, 3))
    fused_apply = make_fused_train_apply(CFG, DIM, L, tile=TILE,
                                         group_blocks=2, interpret=True)

    def loss_fused(p):
        return jnp.mean((fused_apply(p, pts) - tgt) ** 2)

    def loss_ref(p):
        return jnp.mean((apply_r2l(p, CFG, r2l_embed(pts, L)) - tgt) ** 2)

    lf, gf = jax.value_and_grad(loss_fused)(params)
    lr, gr = jax.value_and_grad(loss_ref)(params)
    np.testing.assert_allclose(float(lf), float(lr), rtol=2e-2)
    for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(gf),
                   key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_leaves_with_path(gr),
                   key=lambda kv: str(kv[0]))):
        assert str(ka) == str(kb)
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        # bf16 ReLU-boundary masks can flip on a handful of elements
        # between two bf16 evaluations (different accumulation order);
        # require norm-level agreement + near-total elementwise match
        # bf16-vs-bf16: both sides round differently near ReLU
        # boundaries; exactness is proven by the f32 test above
        rel = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-6)
        assert rel < 5e-2, (str(ka), rel)
        scale = max(np.abs(b).max(), 1e-6)
        frac_bad = np.mean(np.abs(a - b) / scale > 5e-2)
        assert frac_bad < 2e-3, (str(ka), frac_bad)


def test_distill_step_with_fused_vjp_matches_xla(setup):
    """make_distill_step(fused_vjp=True) trains like the XLA step."""
    from r2l_tpu.sampler import PointSampler
    from r2l_tpu.train import (DistillConfig, init_train_state,
                               make_distill_step)
    params, _ = setup
    dcfg = DistillConfig(batch_size=64, n_hard_in=8, n_hard_out=16,
                         hard_mul=2.0, embed_L=L, perturb=True)
    sampler = PointSampler(H=8, W=8, focal=8.0, n_sample=2,
                           near=2.0, far=6.0)
    fresh = jax.random.uniform(jax.random.key(3), (48, 9))

    losses = {}
    for fused in (False, True):
        # fresh buffers each round: the step donates its state
        p = jax.tree.map(jnp.array, params)
        state, tx = init_train_state(jax.random.key(4), p, dcfg)
        step = make_distill_step(CFG, dcfg, sampler, tx, fused_vjp=fused,
                                 fused_tile=32, fused_group_blocks=2)
        ls = []
        for i in range(4):
            state, m = step(state, fresh, jax.random.key(10 + i))
            ls.append(float(m["loss"]))
        losses[fused] = ls
    np.testing.assert_allclose(losses[True], losses[False], rtol=2e-2)
    assert losses[True][-1] < losses[True][0]  # it learns


def test_int8_train_fwd_matches_apply(setup):
    """int8 training forward (train_fwd_int8) reproduces the f32 forward
    within the int8 envelope, and its stash holds the (dequantized)
    activations the backward consumes."""
    from r2l_tpu.kernels.r2l_pallas import calibrate_r2l_int8_pe
    from r2l_tpu.kernels.r2l_train_pallas import train_fwd_int8
    params, pts = setup
    fp = calibrate_r2l_int8_pe(params, CFG, DIM, L, calib_pts=pts)
    rgb, stash = train_fwd_int8(fp, CFG, pts, DIM, L, tile=TILE,
                                interpret=True)
    want = apply_r2l(params, CFG, r2l_embed(pts, L))
    d = np.asarray(rgb) - np.asarray(want)
    assert np.max(np.abs(d)) < 4e-2, np.max(np.abs(d))
    assert stash.shape == (2 * CFG.num_blocks + 1, N, CFG.netwidth)
    assert np.isfinite(np.asarray(stash, np.float32)).all()


def test_int8_fused_vjp_trains(setup):
    """The int8-forward straight-through VJP produces a usable descent
    direction: a few SGD steps reduce the distill loss, and grads stay
    close in direction to the bf16 autodiff grads."""
    params, pts = setup
    tgt = jax.random.uniform(jax.random.key(2), (N, 3))
    fused8 = make_fused_train_apply(CFG, DIM, L, tile=TILE,
                                    group_blocks=2, interpret=True,
                                    quantize="int8", calib_pts=pts)

    def loss8(p):
        return jnp.mean((fused8(p, pts) - tgt) ** 2)

    def loss_ref(p):
        return jnp.mean((apply_r2l(p, CFG, r2l_embed(pts, L)) - tgt) ** 2)

    l8, g8 = jax.value_and_grad(loss8)(params)
    lr, gr = jax.value_and_grad(loss_ref)(params)
    np.testing.assert_allclose(float(l8), float(lr), rtol=5e-2)
    # cosine similarity per leaf: the straight-through grads must point
    # the same way (quantization noise, not a different function)
    for a, b in zip(jax.tree.leaves(g8), jax.tree.leaves(gr)):
        a = np.asarray(a, np.float32).ravel()
        b = np.asarray(b, np.float32).ravel()
        cos = float(a @ b / max(np.linalg.norm(a) * np.linalg.norm(b),
                                1e-12))
        assert cos > 0.95, cos

    # descent: 5 plain-SGD steps reduce the loss
    p = params
    for _ in range(5):
        g = jax.grad(loss8)(p)
        p = jax.tree.map(lambda w, d: w - 0.5 * d, p, g)
    assert float(loss_ref(p)) < float(lr), (float(loss_ref(p)), float(lr))


def test_int8_stash_q_contract(setup):
    """stash_q=True stashes the int8 q-values of the quantized chain:
    row b = quantized block-b input, row nb+1+b = quantized inner
    activation, row nb = quantized tail input (global residual folded).
    Golden: an f32 emulation of the same chain in plain numpy — the
    stashed INTEGERS must match to <=1 (f32 rounding at round() edges)."""
    from r2l_tpu.kernels.r2l_pallas import calibrate_r2l_int8_pe
    from r2l_tpu.kernels.r2l_train_pallas import train_fwd_int8
    params, pts = setup
    nb = CFG.num_blocks
    fp = calibrate_r2l_int8_pe(params, CFG, DIM, L, calib_pts=pts)
    _, stash = train_fwd_int8(fp, CFG, pts, DIM, L, tile=TILE,
                              interpret=True, stash_q=True)
    assert stash.dtype == jnp.int8
    sq = np.asarray(stash, np.float32)

    def q8(x, inv):
        return np.clip(np.round(np.asarray(x, np.float32) * inv),
                       -127, 127)

    # freq-major embed order matches the kernel: sins, coss, raw p
    p = np.asarray(pts, np.float32)
    parts = [np.sin(p * (2.0 ** j)) for j in range(L)]
    parts += [np.cos(p * (2.0 ** j)) for j in range(L)]
    parts.append(p)
    x = np.concatenate(parts, axis=1)
    head_inv = np.asarray(fp.head_inv, np.float32)[0]
    in_dim = x.shape[1]
    xq = q8(x, head_inv[:in_dim])
    if head_inv.shape[0] > in_dim:
        xq = np.concatenate(
            [xq, np.zeros((x.shape[0], head_inv.shape[0] - in_dim),
                          np.float32)], axis=1)
    acc = xq @ np.asarray(fp.head_q, np.float32)
    h = np.maximum(acc * np.asarray(fp.head_m, np.float32)
                   + np.asarray(fp.head_b, np.float32), 0.0)
    body_q = np.asarray(fp.body_q, np.float32)
    body_m = np.asarray(fp.body_m, np.float32)
    body_b = np.asarray(fp.body_b, np.float32)
    body_inv = np.asarray(fp.body_inv, np.float32)
    h0 = h
    for b in range(nb):
        qin = q8(h, body_inv[2 * b])
        np.testing.assert_allclose(sq[b], qin, atol=1, err_msg=f"h row {b}")
        t1r = np.maximum(qin @ body_q[2 * b] * body_m[2 * b]
                         + body_b[2 * b], 0.0)
        qt = q8(t1r, body_inv[2 * b + 1])
        np.testing.assert_allclose(sq[nb + 1 + b], qt, atol=1,
                                   err_msg=f"t row {b}")
        t2 = (qt @ body_q[2 * b + 1] * body_m[2 * b + 1]
              + body_b[2 * b + 1])
        h = t2 + h
    hf = h + h0 if CFG.use_residual else h
    qtail = q8(hf, np.asarray(fp.tail_inv, np.float32)[0])
    np.testing.assert_allclose(sq[nb], qtail, atol=1, err_msg="tail row")


def test_int8_stash_q_vjp_matches_bf16_stash(setup):
    """The int8-stash backward (bwd_group(body_scale=...)) produces
    gradients equivalent to the bf16-stash straight-through backward —
    same loss, near-identical grad direction — while halving stash HBM."""
    params, pts = setup
    tgt = jax.random.uniform(jax.random.key(2), (N, 3))
    outs = {}
    for sq in (False, True):
        fused = make_fused_train_apply(CFG, DIM, L, tile=TILE,
                                       group_blocks=2, interpret=True,
                                       quantize="int8", calib_pts=pts,
                                       stash_q=sq)
        loss = lambda p: jnp.mean((fused(p, pts) - tgt) ** 2)  # noqa: E731
        outs[sq] = jax.value_and_grad(loss)(params)
    (lb, gb), (lq, gq) = outs[False], outs[True]
    # forward differs by the dropped bf16 residual-stream bounce only
    np.testing.assert_allclose(float(lq), float(lb), rtol=5e-3)
    for a, b in zip(jax.tree.leaves(gq), jax.tree.leaves(gb)):
        a = np.asarray(a, np.float32).ravel()
        b = np.asarray(b, np.float32).ravel()
        cos = float(a @ b / max(np.linalg.norm(a) * np.linalg.norm(b),
                                1e-12))
        assert cos > 0.99, cos


def test_int8_external_calib_matches_internal(setup):
    """external_calib=True with fp freshly packed from the same params is
    bit-identical to the in-step-calibration path (same scales, same
    kernel), and gradients agree exactly."""
    params, pts = setup
    tgt = jax.random.uniform(jax.random.key(2), (N, 3))
    fused_in = make_fused_train_apply(CFG, DIM, L, tile=TILE,
                                      group_blocks=2, interpret=True,
                                      quantize="int8", calib_pts=pts)
    fused_ex, calibrate = make_fused_train_apply(
        CFG, DIM, L, tile=TILE, group_blocks=2, interpret=True,
        quantize="int8", calib_pts=pts, external_calib=True)
    fp = calibrate(params)
    np.testing.assert_array_equal(np.asarray(fused_in(params, pts)),
                                  np.asarray(fused_ex(params, pts, fp)))

    loss_in = lambda p: jnp.mean((fused_in(p, pts) - tgt) ** 2)  # noqa
    loss_ex = lambda p: jnp.mean((fused_ex(p, pts, fp) - tgt) ** 2)  # noqa
    li, gi = jax.value_and_grad(loss_in)(params)
    le, ge = jax.value_and_grad(loss_ex)(params)
    np.testing.assert_array_equal(float(li), float(le))
    for a, b in zip(jax.tree.leaves(gi), jax.tree.leaves(ge)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_distill_step_calib_every(setup):
    """fused_calib_every=N inside a scanned dispatch: scales ride the
    scan carry and a lax.cond refreshes them every N global steps.
    Step 1 of the scan sees dispatch-entry scales == live-params scales,
    so it must EXACTLY reproduce one step of the exact (N=1) path with
    the same derived key; later steps run on (bounded) stale scales."""
    from r2l_tpu.sampler import PointSampler
    from r2l_tpu.train import (DistillConfig, init_train_state,
                               make_distill_step)
    params, pts = setup
    dcfg = DistillConfig(batch_size=64, n_hard_in=8, n_hard_out=16,
                         hard_mul=2.0, embed_L=L, perturb=True)
    sampler = PointSampler(H=8, W=8, focal=8.0, n_sample=2,
                           near=2.0, far=6.0)
    fresh = jax.random.uniform(jax.random.key(3), (48, 9))

    p = jax.tree.map(jnp.array, params)
    state, tx = init_train_state(jax.random.key(4), p, dcfg)
    scan3 = make_distill_step(
        CFG, dcfg, sampler, tx, fused_vjp=True, fused_tile=32,
        fused_group_blocks=2, fused_quantize="int8",
        fused_calib_pts=pts, scan_steps=3, fused_calib_every=2)
    batches = jnp.stack([fresh] * 3)
    state, mss, _ = scan3(state, batches, jax.random.key(10))
    assert mss["loss"].shape == (3,)
    assert np.isfinite(np.asarray(mss["loss"])).all()
    assert int(state.step) == 3

    # exact-mode (N=1) first step with the scan's derived key
    p = jax.tree.map(jnp.array, params)
    state1, tx1 = init_train_state(jax.random.key(4), p, dcfg)
    step1 = make_distill_step(
        CFG, dcfg, sampler, tx1, fused_vjp=True, fused_tile=32,
        fused_group_blocks=2, fused_quantize="int8",
        fused_calib_pts=pts)
    _, sub = jax.random.split(jax.random.key(10))
    _, m1 = step1(state1, fresh, sub)
    np.testing.assert_array_equal(float(m1["loss"]),
                                  float(mss["loss"][0]))
