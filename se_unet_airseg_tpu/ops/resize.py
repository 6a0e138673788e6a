"""Trilinear upsampling with PyTorch `align_corners=True` semantics.

The reference model upsamples every encoder/decoder side output back to
full resolution with `nn.Upsample(scale_factor=s, mode='trilinear',
align_corners=True)` (reference SE_UNet.py:19,61,136-138). Parity with
those semantics is required for checkpoint-level numerical agreement
(SURVEY.md §7 hard part 2).

TPU-first design: instead of a gather per output voxel (VPU-bound,
poor locality), interpolation along each axis is expressed as a dense
(out, in) matrix applied via `jnp.einsum`. The three per-axis matrices
are tiny (e.g. 128x16 for scale 8) and the contraction maps onto the
MXU; XLA fuses the three einsums into an efficient pipeline. The
matrices are computed at trace time from static shapes, so everything
stays jit-compatible with zero dynamic shapes.
"""

from functools import lru_cache

import jax.numpy as jnp
import numpy as np
from jax import lax


@lru_cache(maxsize=None)
def _interp_matrix(n_in: int, n_out: int) -> np.ndarray:
    """Dense 1-D linear-interpolation matrix, align_corners=True.

    Output coordinate i samples input coordinate i*(n_in-1)/(n_out-1)
    (PyTorch `align_corners=True` mapping). Rows have at most two
    non-zeros (floor/ceil lerp weights).
    """
    m = np.zeros((n_out, n_in), dtype=np.float32)
    if n_in == 1 or n_out == 1:
        m[:, 0] = 1.0
        return m
    scale = (n_in - 1) / (n_out - 1)
    src = np.arange(n_out, dtype=np.float64) * scale
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, n_in - 2)
    frac = (src - lo).astype(np.float32)
    rows = np.arange(n_out)
    m[rows, lo] = 1.0 - frac
    m[rows, lo + 1] = frac
    return m


def upsample_trilinear(x: jnp.ndarray, scale: int, mat=None) -> jnp.ndarray:
    """Trilinear upsample of an NDHWC tensor by an integer factor.

    Matches `torch.nn.Upsample(scale_factor=scale, mode='trilinear',
    align_corners=True)` on NCDHW inputs (modulo layout). `scale=1`
    is the identity, as in the reference's `down_sample=1` blocks.
    `mat` is the precomputed (d*scale, d) interpolation matrix for
    cubic volumes (keeps relayed-TPU programs constant-free)."""
    if scale == 1:
        return x
    _, d, h, w, _ = x.shape
    dtype = x.dtype
    if mat is not None:
        md = mh = mw = mat.astype(jnp.float32)
    else:
        md = jnp.asarray(_interp_matrix(d, d * scale), dtype=jnp.float32)
        mh = jnp.asarray(_interp_matrix(h, h * scale), dtype=jnp.float32)
        mw = jnp.asarray(_interp_matrix(w, w * scale), dtype=jnp.float32)
    y = x.astype(jnp.float32)
    # Separable interpolation: one MXU contraction per spatial axis.
    # HIGHEST precision: each row has only 2 non-zeros, so exactness is
    # cheap and keeps PyTorch bit-parity.
    hp = lax.Precision.HIGHEST
    y = jnp.einsum("Dd,ndhwc->nDhwc", md, y, precision=hp)
    y = jnp.einsum("Hh,ndhwc->ndHwc", mh, y, precision=hp)
    y = jnp.einsum("Ww,ndhwc->ndhWc", mw, y, precision=hp)
    return y.astype(dtype)


def upsample_trilinear_bm(x: jnp.ndarray, scale: int, mat=None) -> jnp.ndarray:
    """upsample_trilinear on a batch-minor (D,H,W,N,C) tensor."""
    if scale == 1:
        return x
    d, h, w, _, _ = x.shape
    dtype = x.dtype
    if mat is not None:
        md = mh = mw = mat.astype(jnp.float32)
    else:
        md = jnp.asarray(_interp_matrix(d, d * scale), dtype=jnp.float32)
        mh = jnp.asarray(_interp_matrix(h, h * scale), dtype=jnp.float32)
        mw = jnp.asarray(_interp_matrix(w, w * scale), dtype=jnp.float32)
    y = x.astype(jnp.float32)
    hp = lax.Precision.HIGHEST
    y = jnp.einsum("Dd,dhwnc->Dhwnc", md, y, precision=hp)
    y = jnp.einsum("Hh,dhwnc->dHwnc", mh, y, precision=hp)
    y = jnp.einsum("Ww,dhwnc->dhWnc", mw, y, precision=hp)
    return y.astype(dtype)
