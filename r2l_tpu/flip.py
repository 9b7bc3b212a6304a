"""LDR-FLIP perceptual difference metric, pure jnp.

JAX reimplementation of the NVIDIA FLIP algorithm (Andersson et al., HPG
2020) covering the reference's `utils/flip_loss.py:57-438` capability —
color pipeline (sRGB -> YCxCz, per-channel CSF spatial filtering,
Hunt-adjusted L*a*b*, HyAB error + redistribution) and feature pipeline
(edge/point Gaussian-derivative detectors), combined as
``deltaE_c ** (1 - deltaE_f)``.

TPU notes: filter radii depend only on pixels-per-degree, which is static
per call -> all convolutions have static shapes; the whole metric jits.
The reference implementation hardcodes ``device='cuda'`` throughout
(`flip_loss.py:179,192,231,250`); this one runs anywhere XLA does.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# Standard monitor assumption, as in the reference wrapper
# (`main.py:372-379`): 0.7 m wide 3840-px monitor viewed from 0.7 m.
DEFAULT_PPD = 0.7 * (3840.0 / 0.7) * (np.pi / 180.0)

_QC, _QF = 0.7, 0.5
_PC, _PT = 0.4, 0.95

# D65 white point.
_XW, _YW, _ZW = 0.950428545, 1.0, 1.088900371

_RGB2XYZ = np.array([
    [0.41238656, 0.35759149, 0.18045049],
    [0.21263682, 0.71518298, 0.07218020],
    [0.01933062, 0.11919716, 0.95037259],
], dtype=np.float32)
_XYZ2RGB = np.linalg.inv(_RGB2XYZ).astype(np.float32)


def srgb_to_linear(c: Array) -> Array:
    return jnp.where(c <= 0.04045, c / 12.92,
                     ((c + 0.055) / 1.055) ** 2.4)


def linear_to_srgb(c: Array) -> Array:
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(c <= 0.0031308, c * 12.92,
                     1.055 * c ** (1.0 / 2.4) - 0.055)


def _linrgb_to_xyz(rgb: Array) -> Array:
    return jnp.einsum("...c,rc->...r", rgb, jnp.asarray(_RGB2XYZ))


def _xyz_to_linrgb(xyz: Array) -> Array:
    return jnp.einsum("...c,rc->...r", xyz, jnp.asarray(_XYZ2RGB))


def srgb_to_ycxcz(srgb: Array) -> Array:
    xyz = _linrgb_to_xyz(srgb_to_linear(srgb))
    x, y, z = xyz[..., 0] / _XW, xyz[..., 1] / _YW, xyz[..., 2] / _ZW
    return jnp.stack([116.0 * y - 16.0, 500.0 * (x - y), 200.0 * (y - z)],
                     axis=-1)


def ycxcz_to_linrgb(ycc: Array) -> Array:
    y = (ycc[..., 0] + 16.0) / 116.0
    x = ycc[..., 1] / 500.0 + y
    z = y - ycc[..., 2] / 200.0
    xyz = jnp.stack([x * _XW, y * _YW, z * _ZW], axis=-1)
    return _xyz_to_linrgb(xyz)


def _linrgb_to_lab(rgb: Array) -> Array:
    xyz = _linrgb_to_xyz(jnp.clip(rgb, 0.0, 1.0))
    t = jnp.stack([xyz[..., 0] / _XW, xyz[..., 1] / _YW, xyz[..., 2] / _ZW],
                  axis=-1)
    delta = 6.0 / 29.0
    f = jnp.where(t > delta ** 3, jnp.cbrt(jnp.maximum(t, 1e-12)),
                  t / (3 * delta ** 2) + 4.0 / 29.0)
    L = 116.0 * f[..., 1] - 16.0
    a = 500.0 * (f[..., 0] - f[..., 1])
    b = 200.0 * (f[..., 1] - f[..., 2])
    return jnp.stack([L, a, b], axis=-1)


def _hunt(lab: Array) -> Array:
    """Hunt adjustment: scale chroma by lightness."""
    L = lab[..., 0]
    return jnp.stack([L, 0.01 * L * lab[..., 1], 0.01 * L * lab[..., 2]],
                     axis=-1)


def _hyab(a: Array, b: Array) -> Array:
    d = a - b
    return jnp.abs(d[..., 0]) + jnp.linalg.norm(d[..., 1:], axis=-1)


# ---------------------------------------------------------------------------
# Spatial CSF filters (sum-of-Gaussians per opponent channel)
# ---------------------------------------------------------------------------

_CSF = {  # a1, b1, a2, b2 per channel
    "A": (1.0, 0.0047, 0.0, 1.0e-5),
    "RG": (1.0, 0.0053, 0.0, 1.0e-5),
    "BY": (34.1, 0.04, 13.5, 0.025),
}


def _csf_kernels(ppd: float) -> tuple[np.ndarray, int]:
    """Build the 3 separable-ish 2D CSF kernels; returns [3, k, k], radius."""
    b_max = 0.04  # largest b across channels sets the support
    radius = int(math.ceil(3.0 * math.sqrt(b_max / (2.0 * math.pi ** 2)) * ppd))
    k = 2 * radius + 1
    ax = np.arange(-radius, radius + 1) / ppd
    xx, yy = np.meshgrid(ax, ax)
    d2 = xx ** 2 + yy ** 2
    kernels = []
    for name in ("A", "RG", "BY"):
        a1, b1, a2, b2 = _CSF[name]
        g = (a1 * math.sqrt(math.pi / b1) *
             np.exp(-math.pi ** 2 * d2 / b1) +
             a2 * math.sqrt(math.pi / b2) *
             np.exp(-math.pi ** 2 * d2 / b2))
        kernels.append(g / g.sum())
    return np.stack(kernels).astype(np.float32), radius


def _conv2d_single(img: Array, kernel: Array) -> Array:
    """img [H, W], kernel [k, k] -> [H, W], REPLICATE boundary padding.

    The reference pads with mode='replicate' before every VALID conv
    (`flip_loss.py:190-201` spatial_filter, `:290-298` feature_detection);
    zero padding would darken the borders and shift the mean error by
    several percent on small images.
    """
    r = (kernel.shape[0] - 1) // 2
    img = jnp.pad(img, ((r, r), (r, r)), mode="edge")
    out = jax.lax.conv_general_dilated(
        img[None, :, :, None], kernel[:, :, None, None],
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)  # metric: no bf16 MXU passes
    return out[0, :, :, 0]


# ---------------------------------------------------------------------------
# Feature (edge/point) detectors
# ---------------------------------------------------------------------------

def _feature_kernels(ppd: float) -> tuple[np.ndarray, np.ndarray, int]:
    """Gaussian 1st/2nd derivative kernels [2(x,y), k, k] each."""
    w = 0.082
    sd = 0.5 * w * ppd
    radius = int(math.ceil(3.0 * sd))
    ax = np.arange(-radius, radius + 1, dtype=np.float32)
    xx, yy = np.meshgrid(ax, ax)
    g = np.exp(-(xx ** 2 + yy ** 2) / (2.0 * sd ** 2))
    # Edge: first derivative; Point: second derivative.
    edge_x = -xx * g
    point_x = (xx ** 2 / (sd ** 2) - 1.0) * g
    # Normalize positive/negative lobes to unit mass (FLIP convention).

    def norm(kern):
        pos = np.maximum(kern, 0.0)
        neg = np.maximum(-kern, 0.0)
        out = np.where(kern > 0, kern / max(pos.sum(), 1e-8),
                       kern / max(neg.sum(), 1e-8))
        return out.astype(np.float32)

    edge = np.stack([norm(edge_x), norm(edge_x.T)])
    point = np.stack([norm(point_x), norm(point_x.T)])
    return edge, point, radius


def _detect(y_norm: Array, kern: np.ndarray) -> Array:
    gx = _conv2d_single(y_norm, jnp.asarray(kern[0]))
    gy = _conv2d_single(y_norm, jnp.asarray(kern[1]))
    return jnp.sqrt(gx ** 2 + gy ** 2)


# ---------------------------------------------------------------------------
# FLIP
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("ppd",))
def _flip_impl(reference: Array, test: Array, ppd: float) -> Array:
    csf, _ = _csf_kernels(ppd)
    edge_k, point_k, _ = _feature_kernels(ppd)

    ycc_r = srgb_to_ycxcz(reference)
    ycc_t = srgb_to_ycxcz(test)

    # --- color pipeline ---
    def filter_ycc(ycc):
        chans = [_conv2d_single(ycc[..., c], jnp.asarray(csf[c]))
                 for c in range(3)]
        return jnp.stack(chans, axis=-1)

    filt_r = ycxcz_to_linrgb(filter_ycc(ycc_r))
    filt_t = ycxcz_to_linrgb(filter_ycc(ycc_t))
    hunt_r = _hunt(_linrgb_to_lab(filt_r))
    hunt_t = _hunt(_linrgb_to_lab(filt_t))
    hyab = _hyab(hunt_r, hunt_t)

    green = _hunt(_linrgb_to_lab(jnp.asarray([[0.0, 1.0, 0.0]])))
    blue = _hunt(_linrgb_to_lab(jnp.asarray([[0.0, 0.0, 1.0]])))
    cmax = _hyab(green, blue)[0] ** _QC

    de = hyab ** _QC
    pccmax = _PC * cmax
    delta_e_c = jnp.where(
        de < pccmax,
        (_PT / pccmax) * de,
        _PT + ((de - pccmax) / (cmax - pccmax)) * (1.0 - _PT))

    # --- feature pipeline (achromatic channel) ---
    y_r = (ycc_r[..., 0] + 16.0) / 116.0
    y_t = (ycc_t[..., 0] + 16.0) / 116.0
    d_edge = jnp.abs(_detect(y_r, edge_k) - _detect(y_t, edge_k))
    d_point = jnp.abs(_detect(y_r, point_k) - _detect(y_t, point_k))
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    delta_e_f = jnp.clip(
        jnp.maximum(d_edge, d_point) * inv_sqrt2, 0.0, 1.0) ** _QF

    return jnp.clip(delta_e_c, 0.0, 1.0) ** (1.0 - delta_e_f)


def flip_error_map(reference: Array, test: Array,
                   ppd: float = DEFAULT_PPD) -> Array:
    """Per-pixel FLIP error in [0,1]; inputs [H, W, 3] sRGB in [0,1]."""
    return _flip_impl(reference, test, float(ppd))


def flip(reference: Array, test: Array, ppd: float = DEFAULT_PPD) -> Array:
    """Mean FLIP error (lower is better)."""
    return jnp.mean(flip_error_map(reference, test, ppd))
