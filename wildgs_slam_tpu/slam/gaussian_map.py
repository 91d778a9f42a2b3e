"""Functional Gaussian map: fixed-capacity 3DGS model + Adam + densify/prune.

TPU-native re-design of the reference's GaussianModel
(thirdparty/gaussian_splatting/scene/gaussian_model.py:35-749). The reference
mutates torch parameter tensors and surgically edits Adam state on every
densify/prune (cat_tensors_to_optimizer / _prune_optimizer,
gaussian_model.py:526-644). Under XLA we instead keep a *fixed capacity* C of
Gaussian slots with an `alive` mask:

  - prune      = clear alive bits,
  - clone/split/extend = masked compaction (cumsum) + scatter into free slots,
  - Adam state = same-capacity pytree; freed/new slots are zeroed, matching
    the reference's zero-init of optimizer state for appended points.

Everything is jit-compatible with static shapes; capacity overflow drops new
points and reports the count (the reference grows unboundedly; we make the
budget explicit).

Parameter storage conventions match the reference for checkpoint interop:
raw opacity is pre-sigmoid, raw scaling is log, rotations are (w, x, y, z)
quaternions (gaussian_model.py:54-62, 218-220), PLY layout is Inria's.
"""

from __future__ import annotations

from typing import NamedTuple

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import lie


class GaussianParams(NamedTuple):
    """Optimizable leaves, all with leading capacity dim C."""

    xyz: jax.Array        # (C, 3)
    f_dc: jax.Array       # (C, 1, 3)
    f_rest: jax.Array     # (C, R, 3), R = (max_sh+1)^2 - 1
    opacity: jax.Array    # (C, 1) pre-sigmoid
    scaling: jax.Array    # (C, S) log-scale, S=1 isotropic else 3
    rotation: jax.Array   # (C, 4) unnormalized quaternion (w, x, y, z)


class GaussianAux(NamedTuple):
    alive: jax.Array            # (C,) bool
    kf_id: jax.Array            # (C,) int32 anchoring keyframe
    n_obs: jax.Array            # (C,) int32
    xyz_grad_accum: jax.Array   # (C,) densification stats
    denom: jax.Array            # (C,)
    max_radii2d: jax.Array      # (C,) float32


class AdamState(NamedTuple):
    mu: GaussianParams
    nu: GaussianParams
    count: jax.Array  # () int32, shared step count (torch keeps per-group
                      # step across cat/replace, so one scalar is faithful)


class GaussianMap(NamedTuple):
    params: GaussianParams
    aux: GaussianAux
    adam: AdamState


# ---------------------------------------------------------------------------
# Construction / activations
# ---------------------------------------------------------------------------

def create(capacity: int, max_sh_degree: int = 0, isotropic: bool = False):
    R = (max_sh_degree + 1) ** 2 - 1
    S = 1 if isotropic else 3
    z = lambda *s: jnp.zeros(s, jnp.float32)
    params = GaussianParams(
        xyz=z(capacity, 3),
        f_dc=z(capacity, 1, 3),
        f_rest=z(capacity, max(R, 1), 3) if R > 0 else z(capacity, 0, 3),
        opacity=z(capacity, 1),
        scaling=z(capacity, S),
        rotation=jnp.tile(jnp.array([1.0, 0, 0, 0]), (capacity, 1)),
    )
    aux = GaussianAux(
        alive=jnp.zeros(capacity, bool),
        kf_id=jnp.full((capacity,), -1, jnp.int32),
        n_obs=jnp.zeros(capacity, jnp.int32),
        xyz_grad_accum=z(capacity),
        denom=z(capacity),
        max_radii2d=z(capacity),
    )
    adam = AdamState(
        mu=jax.tree.map(jnp.zeros_like, params),
        nu=jax.tree.map(jnp.zeros_like, params),
        count=jnp.zeros((), jnp.int32),
    )
    return GaussianMap(params, aux, adam)


def get_scaling(p: GaussianParams) -> jax.Array:
    s = jnp.exp(p.scaling)
    if s.shape[-1] == 1:
        s = jnp.tile(s, (1, 3))
    return s


def get_rotation_xyzw(p: GaussianParams) -> jax.Array:
    """Normalized quaternion in our lie-layout (x, y, z, w)."""
    q = p.rotation / jnp.linalg.norm(p.rotation, axis=-1, keepdims=True)
    return jnp.concatenate([q[:, 1:4], q[:, 0:1]], axis=-1)


def get_opacity(p: GaussianParams) -> jax.Array:
    return jax.nn.sigmoid(p.opacity)[:, 0]


def get_sh(p: GaussianParams) -> jax.Array:
    """(C, K, 3) SH coefficients (dc first)."""
    return jnp.concatenate([p.f_dc, p.f_rest], axis=1)


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


def num_alive(m: GaussianMap) -> jax.Array:
    return jnp.sum(m.aux.alive)


# ---------------------------------------------------------------------------
# Adam (torch semantics: betas (0.9, 0.999), bias correction, eps=1e-15)
# ---------------------------------------------------------------------------

class LearningRates(NamedTuple):
    xyz: jax.Array
    f_dc: jax.Array
    f_rest: jax.Array
    opacity: jax.Array
    scaling: jax.Array
    rotation: jax.Array


def default_lrs(opt_params: dict, spatial_lr_scale: float = 6.0) -> LearningRates:
    """Per-group lrs as in training_setup (gaussian_model.py:271-318);
    spatial_lr_scale=6.0 matches mapper.py:79 (init_lr(6.0))."""
    return LearningRates(
        xyz=jnp.float32(opt_params["position_lr_init"] * spatial_lr_scale),
        f_dc=jnp.float32(opt_params["feature_lr"]),
        f_rest=jnp.float32(opt_params["feature_lr"] / 20.0),
        opacity=jnp.float32(opt_params["opacity_lr"]),
        scaling=jnp.float32(opt_params["scaling_lr"] * spatial_lr_scale),
        rotation=jnp.float32(opt_params["rotation_lr"]),
    )


def expon_lr(step, lr_init, lr_final, lr_delay_mult=1.0, max_steps=1000000,
             lr_delay_steps=0):
    """Log-lerp lr schedule (general_utils.helper, reference
    utils/general_utils.py:79-94); applied to the xyz group."""
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1)
        )
    else:
        delay_rate = 1.0
    return delay_rate * log_lerp


def adam_step(m: GaussianMap, grads: GaussianParams, lrs: LearningRates,
              b1=0.9, b2=0.999, eps=1e-15) -> GaussianMap:
    """One Adam step over all parameter groups; dead slots masked."""
    count = m.adam.count + 1
    alive_f = m.aux.alive.astype(jnp.float32)

    def upd(p, g, mu, nu, lr):
        mask = alive_f.reshape((-1,) + (1,) * (g.ndim - 1))
        g = g * mask
        mu = b1 * mu + (1 - b1) * g
        nu = b2 * nu + (1 - b2) * g * g
        mu_hat = mu / (1 - b1 ** count.astype(jnp.float32))
        nu_hat = nu / (1 - b2 ** count.astype(jnp.float32))
        p = p - lr * mu_hat / (jnp.sqrt(nu_hat) + eps)
        return p, mu, nu

    out = [
        upd(p, g, mu, nu, lr)
        for p, g, mu, nu, lr in zip(m.params, grads, m.adam.mu, m.adam.nu, lrs)
    ]
    params = GaussianParams(*[o[0] for o in out])
    mu = GaussianParams(*[o[1] for o in out])
    nu = GaussianParams(*[o[2] for o in out])
    return GaussianMap(params, m.aux, AdamState(mu, nu, count))


# ---------------------------------------------------------------------------
# Slot management: masked compaction + scatter into free slots
# ---------------------------------------------------------------------------

def _free_slot_table(alive: jax.Array, budget: int) -> jax.Array:
    """Indices of the first `budget` free slots, padded with C (drop slot)."""
    C = alive.shape[0]
    free_rank = jnp.cumsum(~alive) - 1  # rank of each free slot
    table = jnp.full((budget,), C, jnp.int32)
    write = jnp.where(~alive & (free_rank < budget), free_rank, budget)
    table = jnp.concatenate([table, jnp.array([C], jnp.int32)])
    table = table.at[write].set(jnp.arange(C, dtype=jnp.int32), mode="drop")
    return table[:budget]


def _scatter_new(m: GaussianMap, new_params: GaussianParams,
                 new_mask: jax.Array, new_kf_id, new_n_obs):
    """Write masked rows of `new_params` (any leading size) into free slots.

    Returns (map, n_dropped). Adam state and stats of written slots zeroed;
    stats of ALL slots are reset as in densification_postfix
    (gaussian_model.py:639-644)."""
    C = m.aux.alive.shape[0]
    M = new_mask.shape[0]

    rank = jnp.cumsum(new_mask) - 1            # position among new entries
    free = _free_slot_table(m.aux.alive, M)    # (M,) target slot or C
    n_free = jnp.sum(free < C)
    ok = new_mask & (rank < n_free)
    dst = jnp.where(ok, free[jnp.clip(rank, 0, M - 1)], C)  # C = drop
    n_dropped = jnp.sum(new_mask) - jnp.sum(ok)

    def write(dest_arr, src_arr):
        pad = jnp.zeros((1,) + dest_arr.shape[1:], dest_arr.dtype)
        return jnp.concatenate([dest_arr, pad])[: C + 1].at[dst].set(
            src_arr, mode="drop"
        )[:C]

    params = GaussianParams(*[
        write(d, s) for d, s in zip(m.params, new_params)
    ])
    zero_new = lambda a: write(a, jnp.zeros((M,) + a.shape[1:], a.dtype))
    mu = GaussianParams(*[zero_new(a) for a in m.adam.mu])
    nu = GaussianParams(*[zero_new(a) for a in m.adam.nu])

    alive = m.aux.alive.at[jnp.where(dst < C, dst, C)].set(True, mode="drop")
    aux = GaussianAux(
        alive=alive,
        kf_id=write(m.aux.kf_id, new_kf_id),
        n_obs=write(m.aux.n_obs, new_n_obs),
        xyz_grad_accum=jnp.zeros_like(m.aux.xyz_grad_accum),
        denom=jnp.zeros_like(m.aux.denom),
        max_radii2d=jnp.zeros_like(m.aux.max_radii2d),
    )
    return GaussianMap(params, aux, AdamState(mu, nu, m.adam.count)), n_dropped


@jax.jit
def extend(m: GaussianMap, new_params: GaussianParams, new_mask: jax.Array,
           kf_id: int | jax.Array):
    """Append new Gaussians (extend_from_pcd, gaussian_model.py:235-258)."""
    M = new_mask.shape[0]
    kf = jnp.full((M,), kf_id, jnp.int32)
    return _scatter_new(m, new_params, new_mask, kf, jnp.zeros(M, jnp.int32))


# ---------------------------------------------------------------------------
# Densify / prune (gaussian_model.py:646-743)
# ---------------------------------------------------------------------------

def add_densification_stats(m: GaussianMap, mean2d_grad: jax.Array,
                            radii: jax.Array) -> GaussianMap:
    """Accumulate screen-space gradient norms for visible Gaussians
    (add_densification_stats, gaussian_model.py:745-749 + mapper.py:1177-1185
    max_radii2D update)."""
    vis = (radii > 0) & m.aux.alive
    gnorm = jnp.linalg.norm(mean2d_grad[:, :2], axis=-1)
    aux = m.aux._replace(
        xyz_grad_accum=m.aux.xyz_grad_accum + jnp.where(vis, gnorm, 0.0),
        denom=m.aux.denom + vis.astype(jnp.float32),
        max_radii2d=jnp.where(
            vis, jnp.maximum(m.aux.max_radii2d, radii.astype(jnp.float32)),
            m.aux.max_radii2d),
    )
    return m._replace(aux=aux)


@partial(jax.jit, static_argnames=("max_screen_size",))
def densify_and_prune(m: GaussianMap, key: jax.Array, max_grad: float,
                      min_opacity: float, extent: float,
                      max_screen_size: float | None,
                      percent_dense: float = 0.01):
    """Clone small high-grad Gaussians, split big ones, prune transparent/huge
    ones. Returns (map, n_dropped)."""
    p, aux = m.params, m.aux
    grads = jnp.where(aux.denom > 0, aux.xyz_grad_accum / aux.denom, 0.0)
    scal = get_scaling(p)
    max_scale = jnp.max(scal, axis=-1)

    clone_mask = aux.alive & (grads >= max_grad) & (
        max_scale <= percent_dense * extent)
    split_mask = aux.alive & (grads >= max_grad) & (
        max_scale > percent_dense * extent)

    # split children: xyz sampled from the Gaussian, scale / 1.6 (0.8 * N=2)
    qxyzw = get_rotation_xyzw(p)
    k1, k2 = jax.random.split(key)

    def split_child(k):
        sample = jax.random.normal(k, p.xyz.shape) * scal
        offset = jnp.einsum("nij,nj->ni", lie.quat_to_matrix(qxyzw), sample)
        child = p._replace(
            xyz=p.xyz + offset,
            scaling=jnp.log(jnp.exp(p.scaling) / 1.6),
        )
        return child

    m1, d1 = _scatter_new(m, p, clone_mask, aux.kf_id, aux.n_obs)
    m2, d2 = _scatter_new(m1, split_child(k1), split_mask, aux.kf_id, aux.n_obs)
    m3, d3 = _scatter_new(m2, split_child(k2), split_mask, aux.kf_id, aux.n_obs)

    prune = get_opacity(m3.params) < min_opacity
    if max_screen_size is not None:
        prune = prune | (m3.aux.max_radii2d > max_screen_size) | (
            jnp.max(get_scaling(m3.params), axis=-1) > 0.1 * extent)
    # split originals are removed (prune_filter, gaussian_model.py:695-703).
    # The original slots kept their positions through the scatters above.
    prune = prune | split_mask
    aux3 = m3.aux._replace(alive=m3.aux.alive & ~prune)
    return m3._replace(aux=aux3), d1 + d2 + d3


@jax.jit
def prune_points(m: GaussianMap, mask: jax.Array) -> GaussianMap:
    return m._replace(aux=m.aux._replace(alive=m.aux.alive & ~mask))


@jax.jit
def reset_opacity(m: GaussianMap, value: float = 0.01) -> GaussianMap:
    """reset_opacity (gaussian_model.py:389-393): set all opacities, zero the
    opacity group's Adam state (replace_tensor_to_optimizer)."""
    new_op = jnp.full_like(m.params.opacity, inverse_sigmoid(value))
    return m._replace(
        params=m.params._replace(opacity=new_op),
        adam=m.adam._replace(
            mu=m.adam.mu._replace(opacity=jnp.zeros_like(new_op)),
            nu=m.adam.nu._replace(opacity=jnp.zeros_like(new_op)),
        ),
    )


@jax.jit
def reset_opacity_nonvisible(m: GaussianMap, visible: jax.Array,
                             value: float = 0.4) -> GaussianMap:
    """reset_opacity_nonvisible (gaussian_model.py:395-402): clamp opacity of
    Gaussians NOT in `visible` to `value`, keep visible ones."""
    new_op = jnp.where(
        visible[:, None], m.params.opacity,
        jnp.full_like(m.params.opacity, inverse_sigmoid(value)))
    return m._replace(
        params=m.params._replace(opacity=new_op),
        adam=m.adam._replace(
            mu=m.adam.mu._replace(opacity=jnp.zeros_like(new_op)),
            nu=m.adam.nu._replace(opacity=jnp.zeros_like(new_op)),
        ),
    )


# ---------------------------------------------------------------------------
# PLY export / import (Inria layout, binary little-endian; host-side numpy)
# ---------------------------------------------------------------------------

def save_ply(m: GaussianMap, path: str) -> int:
    """Write alive Gaussians in the reference's PLY layout
    (gaussian_model.py:352-390). Returns point count."""
    alive = np.asarray(m.aux.alive)
    xyz = np.asarray(m.params.xyz)[alive]
    n = xyz.shape[0]
    normals = np.zeros_like(xyz)
    f_dc = np.asarray(m.params.f_dc)[alive].transpose(0, 2, 1).reshape(n, -1)
    f_rest = np.asarray(m.params.f_rest)[alive].transpose(0, 2, 1).reshape(n, -1)
    op = np.asarray(m.params.opacity)[alive]
    scale = np.asarray(m.params.scaling)[alive]
    rot = np.asarray(m.params.rotation)[alive]

    names = ["x", "y", "z", "nx", "ny", "nz"]
    names += [f"f_dc_{i}" for i in range(f_dc.shape[1])]
    names += [f"f_rest_{i}" for i in range(f_rest.shape[1])]
    names += ["opacity"]
    names += [f"scale_{i}" for i in range(scale.shape[1])]
    names += [f"rot_{i}" for i in range(rot.shape[1])]
    data = np.concatenate([xyz, normals, f_dc, f_rest, op, scale, rot],
                          axis=1).astype("<f4")

    try:  # native writer (wildgs_slam_tpu/native) when built
        from ..native import write_ply_native

        if write_ply_native(path, data, names):
            return n
    except Exception:
        pass
    header = ["ply", "format binary_little_endian 1.0",
              f"element vertex {n}"]
    header += [f"property float {nm}" for nm in names]
    header += ["end_header"]
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        f.write(data.tobytes())
    return n


def load_ply(path: str):
    """Read a PLY written by save_ply (or the reference). Returns dict of
    numpy arrays (xyz, f_dc, f_rest, opacity, scaling, rotation)."""
    with open(path, "rb") as f:
        props = []
        n = 0
        while True:
            line = f.readline().decode("ascii").strip()
            if line.startswith("element vertex"):
                n = int(line.split()[-1])
            elif line.startswith("property float"):
                props.append(line.split()[-1])
            elif line == "end_header":
                break
        data = np.frombuffer(f.read(n * len(props) * 4), dtype="<f4")
    data = data.reshape(n, len(props))
    col = {p: i for i, p in enumerate(props)}
    xyz = data[:, [col["x"], col["y"], col["z"]]]
    n_dc = sum(1 for p in props if p.startswith("f_dc_"))
    n_rest = sum(1 for p in props if p.startswith("f_rest_"))
    f_dc = data[:, [col[f"f_dc_{i}"] for i in range(n_dc)]]
    f_dc = f_dc.reshape(n, 3, -1).transpose(0, 2, 1)
    if n_rest:
        f_rest = data[:, [col[f"f_rest_{i}"] for i in range(n_rest)]]
        f_rest = f_rest.reshape(n, 3, -1).transpose(0, 2, 1)
    else:
        f_rest = np.zeros((n, 0, 3), np.float32)
    n_s = sum(1 for p in props if p.startswith("scale_"))
    scaling = data[:, [col[f"scale_{i}"] for i in range(n_s)]]
    rotation = data[:, [col[f"rot_{i}"] for i in range(4)]]
    opacity = data[:, [col["opacity"]]]
    return dict(xyz=xyz, f_dc=f_dc, f_rest=f_rest, opacity=opacity,
                scaling=scaling, rotation=rotation)
