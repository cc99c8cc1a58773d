"""General geometry/analysis helpers (reference: /root/reference/mrcal/utils.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from . import _xla  # noqa: F401
from .poseutils import invert_Rt


def align_procrustes_points_Rt01(p0, p1, weights=None):
    """Find Rt01 minimizing sum w_i |p0_i - (R p1_i + t)|^2
    (reference: utils.py:121; algorithm = Kabsch/umeyama without scale)."""
    p0 = jnp.asarray(p0)
    p1 = jnp.asarray(p1)
    if weights is None:
        weights = jnp.ones(p0.shape[:-1], p0.dtype)
    else:
        weights = jnp.asarray(weights)
    wsum = jnp.sum(weights, axis=-1, keepdims=True)
    w = (weights / wsum)[..., None]
    c0 = jnp.sum(p0 * w, axis=-2)
    c1 = jnp.sum(p1 * w, axis=-2)
    q0 = p0 - c0[..., None, :]
    q1 = p1 - c1[..., None, :]
    M = jnp.einsum("...ni,...nj,...n->...ij", q0, q1, weights)
    U, _, Vt = jnp.linalg.svd(M)
    # proper rotation: flip the last column if det<0
    det = jnp.linalg.det(U @ Vt)
    D = jnp.concatenate(
        [jnp.ones(det.shape + (2,), p0.dtype), det[..., None]], axis=-1)
    R = jnp.einsum("...ik,...k,...kj->...ij", U, D, Vt)
    t = c0 - jnp.einsum("...ij,...j->...i", R, c1)
    return jnp.concatenate([R, t[..., None, :]], axis=-2)


def align_procrustes_vectors_R01(v0, v1, weights=None):
    """Best-fit rotation R01 mapping directions v1 to v0
    (reference: utils.py:193)."""
    v0 = jnp.asarray(v0)
    v1 = jnp.asarray(v1)
    v0 = v0 / jnp.linalg.norm(v0, axis=-1, keepdims=True)
    v1 = v1 / jnp.linalg.norm(v1, axis=-1, keepdims=True)
    if weights is None:
        weights = jnp.ones(v0.shape[:-1], v0.dtype)
    M = jnp.einsum("...ni,...nj,...n->...ij", v0, v1, jnp.asarray(weights))
    U, _, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.concatenate(
        [jnp.ones(det.shape + (2,), v0.dtype), det[..., None]], axis=-1)
    return jnp.einsum("...ik,...k,...kj->...ij", U, D, Vt)


def sample_imager(gridn_width, gridn_height, imager_width, imager_height):
    """Regular pixel grid covering the imager (reference: utils.py:268).
    Returns (gridn_height, gridn_width, 2) of pixel coords."""
    if gridn_height is None:
        gridn_height = int(round(imager_height / imager_width * gridn_width))
    x = np.linspace(0, imager_width - 1, gridn_width)
    y = np.linspace(0, imager_height - 1, gridn_height)
    xg, yg = np.meshgrid(x, y)
    return jnp.asarray(np.stack([xg, yg], axis=-1))


def sample_imager_unproject(gridn_width, gridn_height,
                            imager_width, imager_height,
                            lensmodel, intrinsics_data, normalize=False):
    """Unproject a regular pixel grid (reference: utils.py:327).
    Returns (v, q)."""
    from .projections import unproject
    q = sample_imager(gridn_width, gridn_height, imager_width, imager_height)
    v = unproject(q, lensmodel, intrinsics_data, normalize=normalize)
    return v, q


def sorted_eig(M):
    """Eigenvalues/vectors sorted ascending (reference: utils.py:1213)."""
    l, v = jnp.linalg.eigh(jnp.asarray(M))
    return l, v


def ingest_packed_state(b_packed, **optimization_inputs):
    """Write an optimized packed state vector back into the
    optimization_inputs arrays (reference: utils.py:1103)."""
    from .optimize.layout import spec_from_inputs
    from .optimize.residuals import arrays_from_inputs, split_packed_state
    spec = spec_from_inputs(**optimization_inputs)
    arrays = arrays_from_inputs(**optimization_inputs)
    params = split_packed_state(jnp.asarray(b_packed), arrays, spec)

    def put(name, key):
        a = optimization_inputs.get(name)
        if a is not None and np.asarray(a).size:
            np.copyto(np.asarray(a), np.asarray(params[key]))

    put("intrinsics", "intrinsics")
    put("extrinsics_rt_fromref", "extrinsics")
    put("frames_rt_toref", "frames")
    put("points", "points")
    if optimization_inputs.get("calobject_warp") is not None \
            and spec.has_calobject_warp:
        np.copyto(np.asarray(optimization_inputs["calobject_warp"]),
                  np.asarray(params["calobject_warp"]))


def _R_aligned_to_vector(v):
    from .poseutils import R_aligned_to_vector
    return R_aligned_to_vector(v)
