"""Correlation volumes + lookup (replaces droid_backends CUDA kernels).

Two implementations, matching the reference's two memory regimes:

  - `corr_pyramid` + `corr_lookup`: precomputed all-pairs 4-level correlation
    pyramid (corr.py:39-90) with the bilinear 7x7-neighborhood gather of
    correlation_kernels.cu:31-135. The gather is expressed as one big
    take-along-axis per level — XLA lowers it to an efficient TPU gather; the
    backward (scatter into the volume) comes from autodiff of the same
    gather, which is exactly what corr_index_backward hand-codes.

  - `alt_corr`: on-the-fly patch correlation (altcorr_kernel.cu semantics,
    corr.py:93-159) for global BA where the O(E·(HW)^2) volumes don't fit:
    dot(fmap1[pixel], fmap2[neighborhood(coords)]) with bilinear weights.

Out-of-bounds samples contribute zero, matching `within_bounds` in the CUDA
kernels. Lookup output channel order is (level, dx, dy) — i indexes the x
offset, j the y offset, as in corr_index_forward_kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def avg_pool2(x: jax.Array) -> jax.Array:
    """2x2/stride-2 average pooling on the last two dims (odd trailing
    rows/cols dropped, matching torch F.avg_pool2d)."""
    *lead, H, W = x.shape
    H2, W2 = H // 2, W // 2
    x = x[..., : H2 * 2, : W2 * 2]
    x = x.reshape(*lead, H2, 2, W2, 2)
    return x.mean(axis=(-3, -1))


def compute_corr(fmap1: jax.Array, fmap2: jax.Array) -> jax.Array:
    """All-pairs correlation (corr.py:81-90).

    fmap1, fmap2: (E, H, W, C) -> (E, H*W, H, W) float32, scaled by 1/16.
    """
    E, H, W, C = fmap1.shape
    a = fmap1.reshape(E, H * W, C) / 4.0
    b = fmap2.reshape(E, H * W, C) / 4.0
    corr = jnp.einsum("enc,emc->enm", a, b,
                      preferred_element_type=jnp.float32)
    return corr.reshape(E, H * W, H, W)


def corr_pyramid(fmap1: jax.Array, fmap2: jax.Array,
                 num_levels: int = 4) -> list[jax.Array]:
    """Build the 4-level pyramid: level i is (E, H*W, H/2^i, W/2^i)."""
    corr = compute_corr(fmap1, fmap2)
    pyramid = [corr]
    for _ in range(num_levels - 1):
        corr = avg_pool2(corr)
        pyramid.append(corr)
    return pyramid


def _bilinear_window_gather(volume: jax.Array, coords: jax.Array,
                            radius: int) -> jax.Array:
    """Sample a (2r+1)^2 window around `coords` from per-pixel 2D volumes.

    volume: (E, P, h2, w2) — one little correlation image per source pixel.
    coords: (E, P, 2) float (x, y) target-resolution centers.
    Returns (E, P, (2r+1)^2) with channel order a(x-offset)-major, matching
    corr_index_forward_kernel.
    """
    E, P, h2, w2 = volume.shape
    r = radius
    rd = 2 * r + 1

    x0 = coords[..., 0]
    y0 = coords[..., 1]
    fx = jnp.floor(x0)
    fy = jnp.floor(y0)
    dx = (x0 - fx)[..., None]  # (E, P, 1)
    dy = (y0 - fy)[..., None]

    # integer grid of (rd+1)^2 sample points: i -> x, j -> y
    offs = jnp.arange(rd + 1, dtype=jnp.float32) - r
    gx = (fx[..., None] + offs).astype(jnp.int32)  # (E, P, rd+1)
    gy = (fy[..., None] + offs).astype(jnp.int32)

    inb_x = (gx >= 0) & (gx < w2)
    inb_y = (gy >= 0) & (gy < h2)
    gxc = jnp.clip(gx, 0, w2 - 1)
    gyc = jnp.clip(gy, 0, h2 - 1)

    # gather all (rd+1)^2 integer samples: flat index per (i, j)
    flat_idx = (gyc[:, :, None, :] * w2 + gxc[:, :, :, None])  # (E,P,rd+1,rd+1)
    vflat = volume.reshape(E, P, h2 * w2)
    vals = jnp.take_along_axis(
        vflat, flat_idx.reshape(E, P, -1), axis=-1
    ).reshape(E, P, rd + 1, rd + 1)
    vals = vals * (inb_x[:, :, :, None] & inb_y[:, :, None, :])

    # bilinear combine neighbors: out[a, b] =
    #   (1-dx)(1-dy) v[a, b] + dx(1-dy) v[a+1, b] + (1-dx)dy v[a, b+1]
    #   + dx dy v[a+1, b+1]
    w00 = (1 - dx) * (1 - dy)
    w10 = dx * (1 - dy)
    w01 = (1 - dx) * dy
    w11 = dx * dy
    out = (
        vals[:, :, :rd, :rd] * w00[..., None]
        + vals[:, :, 1:, :rd] * w10[..., None]
        + vals[:, :, :rd, 1:] * w01[..., None]
        + vals[:, :, 1:, 1:] * w11[..., None]
    )  # (E, P, rd, rd) with dims (x-offset, y-offset)
    return out.reshape(E, P, rd * rd)


def _bilinear_window_onehot(volume: jax.Array, coords: jax.Array,
                            radius: int) -> jax.Array:
    """Same contract as _bilinear_window_gather, but the (rd+1)^2 integer
    samples are pulled with two one-hot MXU contractions instead of a
    take_along_axis. Lane-dim gathers over millions of queries are the TPU
    slow path (the round-2 binning A/B measured select-reduce beating
    gathers 3-13x); the one-hot matmul is exact — each row has at most one
    nonzero, so bf16 accumulation reproduces the gathered values bitwise —
    and out-of-bounds columns get all-zero one-hot rows, which subsumes the
    explicit in-bounds mask."""
    E, P, h2, w2 = volume.shape
    r = radius
    rd = 2 * r + 1

    x0 = coords[..., 0]
    y0 = coords[..., 1]
    fx = jnp.floor(x0)
    fy = jnp.floor(y0)
    dx = (x0 - fx)[..., None]
    dy = (y0 - fy)[..., None]

    offs = jnp.arange(rd + 1, dtype=jnp.float32) - r
    # keep indices unclipped: OOB -> all-false one-hot row -> zero sample
    gx = jnp.nan_to_num(fx[..., None] + offs, nan=-1.0,
                        posinf=2.0 * w2, neginf=-1.0).astype(jnp.int32)
    gy = jnp.nan_to_num(fy[..., None] + offs, nan=-1.0,
                        posinf=2.0 * h2, neginf=-1.0).astype(jnp.int32)
    ohx = (gx[..., None] == jnp.arange(w2, dtype=jnp.int32)).astype(
        volume.dtype)                                       # (E, P, rd+1, w2)
    ohy = (gy[..., None] == jnp.arange(h2, dtype=jnp.int32)).astype(
        volume.dtype)                                       # (E, P, rd+1, h2)

    # vals[e,p,i,j] = vol[e,p, gy[j], gx[i]]
    t = jnp.einsum("ephw,epiw->epih", volume, ohx,
                   preferred_element_type=volume.dtype)     # (E, P, rd+1, h2)
    vals = jnp.einsum("epih,epjh->epij", t, ohy,
                      preferred_element_type=jnp.float32)   # (E, P, i, j)

    w00 = (1 - dx) * (1 - dy)
    w10 = dx * (1 - dy)
    w01 = (1 - dx) * dy
    w11 = dx * dy
    out = (
        vals[:, :, :rd, :rd] * w00[..., None]
        + vals[:, :, 1:, :rd] * w10[..., None]
        + vals[:, :, :rd, 1:] * w01[..., None]
        + vals[:, :, 1:, 1:] * w11[..., None]
    )
    return out.reshape(E, P, rd * rd)


def _bilinear_window_patch(volume: jax.Array, coords: jax.Array,
                           radius: int) -> jax.Array:
    """Same contract via per-pixel (rd+1)x(rd+1) patch slices from a
    zero-padded volume (a vmapped dynamic_slice lowers to ONE gather of
    contiguous 2D blocks instead of (rd+1)^2 scalar samples per query).
    Window starts are clipped into the pad band, so fully-out-of-bounds
    windows read zeros and partially-overlapping windows keep their true
    alignment (pad width == window size)."""
    E, P, h2, w2 = volume.shape
    r = radius
    rd = 2 * r + 1
    k = rd + 1  # window side
    pad = k

    volp = jnp.pad(volume, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    x0 = coords[..., 0]
    y0 = coords[..., 1]
    fx = jnp.floor(x0)
    fy = jnp.floor(y0)
    dx = (x0 - fx)[..., None]
    dy = (y0 - fy)[..., None]

    fx = jnp.nan_to_num(fx, nan=-1e4, posinf=1e4, neginf=-1e4)
    fy = jnp.nan_to_num(fy, nan=-1e4, posinf=1e4, neginf=-1e4)
    sx = (jnp.clip(fx - r, -pad, w2 + pad - k) + pad).astype(jnp.int32)
    sy = (jnp.clip(fy - r, -pad, h2 + pad - k) + pad).astype(jnp.int32)

    vals = jax.vmap(jax.vmap(
        lambda v, y, x: jax.lax.dynamic_slice(v, (y, x), (k, k))
    ))(volp, sy, sx)                       # (E, P, j=y, i=x)
    vals = vals.transpose(0, 1, 3, 2).astype(jnp.float32)  # -> (E, P, i, j)

    w00 = (1 - dx) * (1 - dy)
    w10 = dx * (1 - dy)
    w01 = (1 - dx) * dy
    w11 = dx * dy
    out = (
        vals[:, :, :rd, :rd] * w00[..., None]
        + vals[:, :, 1:, :rd] * w10[..., None]
        + vals[:, :, :rd, 1:] * w01[..., None]
        + vals[:, :, 1:, 1:] * w11[..., None]
    )
    return out.reshape(E, P, rd * rd)


_WINDOW_FNS = {
    "gather": _bilinear_window_gather,
    "onehot": _bilinear_window_onehot,
    "patch": _bilinear_window_patch,
}


def corr_lookup(pyramid: list[jax.Array], coords: jax.Array,
                radius: int = 3, method: str = "onehot") -> jax.Array:
    """Multi-level windowed lookup (CorrBlock.__call__, corr.py:57-67).

    coords: (E, H, W, 2) float (x, y) at level-0 resolution.
    Returns (E, H, W, L*(2r+1)^2) feature channels (level-major).
    method: sampling strategy (all numerically equivalent) —
      'gather' = take_along_axis (v5e A/B: the slow path at tracking scale),
      'onehot' = one-hot MXU contraction (default),
      'patch'  = padded vmapped dynamic_slice.
    """
    E, H, W, _ = coords.shape
    c = coords.reshape(E, H * W, 2)
    fn = _WINDOW_FNS[method]
    outs = []
    for i, vol in enumerate(pyramid):
        outs.append(fn(vol, c / (2 ** i), radius))
    out = jnp.concatenate(outs, axis=-1)
    return out.reshape(E, H, W, -1)


# ---------------------------------------------------------------------------
# on-the-fly patch correlation (AltCorrBlock semantics)
# ---------------------------------------------------------------------------

def fmap_pyramid(fmaps: jax.Array, num_levels: int = 4) -> list[jax.Array]:
    """fmaps (F, H, W, C) -> levels [(F, H/2^i, W/2^i, C)], pre-scaled by 1/4
    (corr.py:117)."""
    x = fmaps / 4.0
    pyr = [x]
    for _ in range(num_levels - 1):
        F, H, W, C = x.shape
        H2, W2 = H // 2, W // 2
        x = x[:, : H2 * 2, : W2 * 2]
        x = x.reshape(F, H2, 2, W2, 2, C).mean(axis=(2, 4))
        pyr.append(x)
    return pyr


def alt_corr(pyramid: list[jax.Array], coords: jax.Array, ii: jax.Array,
             jj: jax.Array, radius: int = 3,
             method: str = "vol_onehot") -> jax.Array:
    """Correlation features without stored volumes (AltCorrBlock semantics).

    method="vol_onehot" (default): build each edge's correlation volume ON
    THE FLY as one MXU contraction (f1 · f2ᵀ over C=128) and sample the
    (2r+1)² window with the proven one-hot select-reduce — the identical
    math to the gather form because dot(f1, bilin(f2)) == bilin(dot(f1, f2))
    (bilinear weights are linear). The volume is transient: a lax.map over
    8-edge sub-chunks bounds it to (8, HW, h2, w2) ≈ 300 MB at 48x64, and
    XLA reuses the buffer across map steps. This trades ~24x more MXU FLOPs
    for ZERO multi-million-row gathers — the lane-dim take_along_axis of the
    gather form is the same TPU slow path that lost 3-13x in the binning and
    corr-lookup A/Bs (v5e A/B: see scripts/microbench_altcorr.py).

    method="gather": the direct form (reference altcorr_kernel.cu:39-300
    semantics), kept as the memory-floor fallback and CPU/test oracle.
    """
    if method == "vol_onehot":
        return _alt_corr_vol(pyramid, coords, ii, jj, radius)
    return _alt_corr_gather(pyramid, coords, ii, jj, radius)


def _alt_corr_vol(pyramid, coords, ii, jj, radius):
    E, H, W, _ = coords.shape
    f1 = pyramid[0][ii].reshape(E, H * W, -1)      # (E, P, C), scaled 1/4
    sub = 8 if E % 8 == 0 else (4 if E % 4 == 0 else (2 if E % 2 == 0 else 1))

    outs = []
    for lvl, fm in enumerate(pyramid):
        _, h2, w2, C = fm.shape
        f2 = fm[jj].reshape(E, h2 * w2, C)
        c = coords.reshape(E, H * W, 2) / (2 ** lvl)

        def level_chunk(args, h2=h2, w2=w2):
            f1c, f2c, cc = args
            vol = jnp.einsum("epc,eqc->epq", f1c, f2c,
                             preferred_element_type=jnp.float32)
            vol = vol.reshape(vol.shape[0], H * W, h2, w2)
            return _bilinear_window_onehot(vol, cc, radius)

        out = jax.lax.map(level_chunk,
                          (f1.reshape(E // sub, sub, H * W, -1),
                           f2.reshape(E // sub, sub, h2 * w2, C),
                           c.reshape(E // sub, sub, H * W, 2)))
        outs.append(out.reshape(E, H * W, -1))

    return jnp.concatenate(outs, axis=-1).reshape(E, H, W, -1)


def _alt_corr_gather(pyramid: list[jax.Array], coords: jax.Array,
                     ii: jax.Array, jj: jax.Array,
                     radius: int = 3) -> jax.Array:
    """Direct patch-dot form: for each edge e and pixel p,
    dot(fmap1_lvl0[ii[e], p], bilin(fmap_lvl[jj[e]], coords[e, p]/2^lvl +
    offset)) over the (2r+1)^2 window. coords (E, H, W, 2).
    Returns (E, H, W, L*(2r+1)^2)."""
    E, H, W, _ = coords.shape
    rd = 2 * radius + 1
    f1 = pyramid[0][ii]  # (E, H, W, C)
    C = f1.shape[-1]
    f1 = f1.reshape(E, H * W, C)

    outs = []
    for lvl, fm in enumerate(pyramid):
        _, h2, w2, _ = fm.shape
        f2 = fm[jj].reshape(E, h2 * w2, C)  # (E, P2, C)
        c = coords.reshape(E, H * W, 2) / (2 ** lvl)

        x0, y0 = c[..., 0], c[..., 1]
        fxg, fyg = jnp.floor(x0), jnp.floor(y0)
        dx = (x0 - fxg)[..., None]
        dy = (y0 - fyg)[..., None]

        offs = jnp.arange(rd + 1, dtype=jnp.float32) - radius
        gx = (fxg[..., None] + offs).astype(jnp.int32)  # (E, P, rd+1)
        gy = (fyg[..., None] + offs).astype(jnp.int32)
        inb_x = (gx >= 0) & (gx < w2)
        inb_y = (gy >= 0) & (gy < h2)
        gxc = jnp.clip(gx, 0, w2 - 1)
        gyc = jnp.clip(gy, 0, h2 - 1)

        # dot products at integer grid points: (E, P, rd+1, rd+1)
        flat = gyc[:, :, None, :] * w2 + gxc[:, :, :, None]
        flat = flat.reshape(E, -1)  # (E, P*(rd+1)^2)
        g = jnp.take_along_axis(f2, flat[..., None], axis=1)
        g = g.reshape(E, H * W, rd + 1, rd + 1, C)
        dots = jnp.einsum("epc,epijc->epij", f1, g,
                          preferred_element_type=jnp.float32)
        dots = dots * (inb_x[:, :, :, None] & inb_y[:, :, None, :])

        w00 = (1 - dx) * (1 - dy)
        w10 = dx * (1 - dy)
        w01 = (1 - dx) * dy
        w11 = dx * dy
        out = (
            dots[:, :, :rd, :rd] * w00[..., None]
            + dots[:, :, 1:, :rd] * w10[..., None]
            + dots[:, :, :rd, 1:] * w01[..., None]
            + dots[:, :, 1:, 1:] * w11[..., None]
        )
        outs.append(out.reshape(E, H * W, rd * rd))

    return jnp.concatenate(outs, axis=-1).reshape(E, H, W, -1)
