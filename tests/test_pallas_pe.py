"""PE-fused Pallas kernel vs embed-outside reference path."""
import jax
import jax.numpy as jnp
import numpy as np

from r2l_tpu.encoding import r2l_embed
from r2l_tpu.kernels.r2l_pallas import (_pe_row_permutation,
                                        fused_r2l_apply_pe,
                                        prepare_fused_params_pe)
from r2l_tpu.models import R2LConfig, apply_r2l, init_r2l


def test_pe_row_permutation_roundtrip():
    dim_pts, L = 6, 3
    perm = _pe_row_permutation(dim_pts, L)
    assert sorted(perm) == list(range(dim_pts * (2 * L + 1)))
    # Feature p*dim+s of the freq-major layout must equal feature
    # s*(2L+1)+j of the per-scalar layout.
    x = np.random.default_rng(0).normal(size=(5, dim_pts)).astype(np.float32)
    emb = np.asarray(r2l_embed(jnp.asarray(x), L))          # per-scalar
    parts = ([np.sin(x * 2.0 ** j) for j in range(L)]
             + [np.cos(x * 2.0 ** j) for j in range(L)] + [x])
    freq_major = np.concatenate(parts, axis=1)               # kernel layout
    np.testing.assert_allclose(freq_major, emb[:, perm], rtol=1e-6)


def test_pe_fused_matches_reference_f32(key):
    dim_pts, L = 12, 4
    cfg = R2LConfig(input_dim=dim_pts * (2 * L + 1), netwidth=128,
                    netdepth=6)
    params = init_r2l(key, cfg)
    pts = jax.random.normal(jax.random.key(5), (40, dim_pts)) * 0.5
    ref = apply_r2l(params, cfg, r2l_embed(pts, L))
    fp = prepare_fused_params_pe(params, cfg, dim_pts, L,
                                 weight_dtype=jnp.float32)
    out = fused_r2l_apply_pe(fp, cfg, pts, dim_pts, L, tile=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_pe_fused_bf16_close(key):
    dim_pts, L = 48, 10  # canonical ray layout, small net
    cfg = R2LConfig(input_dim=dim_pts * (2 * L + 1), netwidth=64,
                    netdepth=6)
    params = init_r2l(key, cfg)
    pts = jax.random.normal(jax.random.key(5), (24, dim_pts)) * 0.5
    ref = apply_r2l(params, cfg, r2l_embed(pts, L))
    fp = prepare_fused_params_pe(params, cfg, dim_pts, L)
    out = fused_r2l_apply_pe(fp, cfg, pts, dim_pts, L, tile=8)
    assert float(jnp.max(jnp.abs(out - ref))) < 3e-2
