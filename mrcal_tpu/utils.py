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


def hypothesis_board_corner_positions(icam_intrinsics=None,
                                      idx_inliers=None,
                                      **optimization_inputs):
    """Reference-frame corner positions implied by the current solution
    (reference: utils.py:440).  Returns (p_ref_all, p_ref_inliers,
    p_cam_all, p_cam_inliers) ... here: (p_cam, p_ref, indices) for the
    selected camera's observations."""
    from .optimize.layout import spec_from_inputs, normalize_inputs
    from .optimize.residuals import (arrays_from_inputs, params_from_arrays,
                                     board_points_ref)
    from .poseutils import _compose_rt2, _transform_point_rt
    kw = normalize_inputs(optimization_inputs)
    spec = spec_from_inputs(**kw)
    arrays = arrays_from_inputs(**kw)
    params = params_from_arrays(arrays)
    idx = np.asarray(arrays["indices_board"])
    obs = np.asarray(arrays["observations_board"])
    sel = np.ones(len(idx), bool)
    if icam_intrinsics is not None:
        sel = idx[:, 1] == icam_intrinsics
    idx = idx[sel]
    obs = obs[sel]
    ifr, ici, ice = idx[:, 0], idx[:, 1], idx[:, 2]
    ext_pad = jnp.concatenate(
        [jnp.zeros((1, 6)), params["extrinsics"]], axis=0)
    pts = board_points_ref(spec, params["calobject_warp"])
    p_ref = np.asarray(_transform_point_rt(
        params["frames"][ifr][:, None, None, :], pts[None]))
    rt_joint = _compose_rt2(ext_pad[ice + 1], params["frames"][ifr])
    p_cam = np.asarray(_transform_point_rt(
        jnp.asarray(rt_joint)[:, None, None, :], pts[None]))
    weights = obs[..., 2]
    return p_cam, p_ref, weights, idx


def measurements_board(optimization_inputs, *, x=None,
                       return_observations=False):
    """Board measurements from the measurement vector (reference:
    utils.py:1286).  Returns x_board (Nobs,H,W,2) [+ observations]."""
    from .optimize import optimizer_callback
    from .optimize.layout import spec_from_inputs, normalize_inputs
    kw = normalize_inputs(optimization_inputs)
    spec = spec_from_inputs(**kw)
    if x is None:
        _, x, _ = optimizer_callback(no_jacobian=True, **kw)
    H = spec.calibration_object_height_n
    W = spec.calibration_object_width_n
    xb = np.asarray(x[:spec.num_measurements_boards]).reshape(-1, H, W, 2)
    if return_observations:
        return xb, np.asarray(kw["observations_board"])
    return xb


def residuals_board(optimization_inputs, *, x=None,
                    return_observations=False):
    """Alias of measurements_board (the measurements ARE weighted residuals;
    reference: utils.py:1412)."""
    return measurements_board(optimization_inputs, x=x,
                              return_observations=return_observations)


def measurements_point(optimization_inputs, *, x=None,
                       return_observations=False):
    """Point measurements from the measurement vector (reference:
    utils.py:1429)."""
    from .optimize import optimizer_callback
    from .optimize.layout import spec_from_inputs, normalize_inputs
    kw = normalize_inputs(optimization_inputs)
    spec = spec_from_inputs(**kw)
    if x is None:
        _, x, _ = optimizer_callback(no_jacobian=True, **kw)
    i0 = spec.measurement_index_points0
    xp = np.asarray(x[i0:i0 + spec.num_measurements_points]).reshape(-1, 2)
    if return_observations:
        return xp, np.asarray(kw["observations_point"])
    return xp


def residuals_point(optimization_inputs, *, x=None,
                    return_observations=False):
    return measurements_point(optimization_inputs, x=x,
                              return_observations=return_observations)


def close_contour(c):
    """Close a polyline if not already closed (reference: utils.py:941)."""
    if c is None:
        return None
    c = np.asarray(c)
    if len(c) == 0 or np.linalg.norm(c[0] - c[-1]) < 1e-12:
        return c
    return np.concatenate([c, c[:1]], axis=0)


def polygon_difference(positive, negative):
    """Area difference of two polygons as a list of polygons (reference:
    utils.py:648; uses shapely if present, else a gridded approximation)."""
    try:
        from shapely.geometry import Polygon
        d = Polygon(np.asarray(positive)).difference(
            Polygon(np.asarray(negative)))
        geoms = getattr(d, "geoms", [d])
        return [np.asarray(g.exterior.coords) for g in geoms
                if g.exterior is not None]
    except ImportError:
        raise NotImplementedError(
            "polygon_difference requires shapely in this build")


def _splined_stereographic_domain(lensmodel):
    """The boundary of the valid domain of a splined model in normalized
    stereographic coords (reference: utils.py:587)."""
    from .lensmodels import parse_lensmodel, knots_for_splined_models
    lm = parse_lensmodel(lensmodel)
    ux, uy = knots_for_splined_models(lm)
    ux = np.asarray(ux)
    uy = np.asarray(uy)
    if lm.order == 2:
        # half-interval margins
        x0, x1 = (ux[0] + ux[1]) / 2, (ux[-2] + ux[-1]) / 2
        y0, y1 = (uy[0] + uy[1]) / 2, (uy[-2] + uy[-1]) / 2
    else:
        x0, x1 = ux[1], ux[-2]
        y0, y1 = uy[1], uy[-2]
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])


def write_point_cloud_as_ply(filename, points, *, color=None,
                             binary=True):
    """Write a 3D point cloud to a .ply file (reference: utils.py:1578)."""
    points = np.asarray(points).reshape(-1, 3)
    n = len(points)
    with open(filename, "wb" if binary else "w") as f:
        hdr = ["ply",
               "format binary_little_endian 1.0" if binary
               else "format ascii 1.0",
               f"element vertex {n}",
               "property float x", "property float y", "property float z"]
        if color is not None:
            hdr += ["property uchar red", "property uchar green",
                    "property uchar blue"]
        hdr.append("end_header")
        header = "\n".join(hdr) + "\n"
        if binary:
            f.write(header.encode())
            if color is not None:
                rec = np.zeros(n, dtype=[("xyz", np.float32, 3),
                                         ("rgb", np.uint8, 3)])
                rec["xyz"] = points.astype(np.float32)
                rec["rgb"] = np.asarray(color).reshape(-1, 3)
                rec.tofile(f)
            else:
                points.astype(np.float32).tofile(f)
        else:
            f.write(header)
            for p in points:
                f.write(f"{p[0]} {p[1]} {p[2]}\n")


def plotoptions_state_boundaries(**optimization_inputs):
    """x coordinates of the state-variable block boundaries, for annotating
    plots (reference: utils.py:1015).  Returns a dict for matplotlib axvline
    use: {'boundaries': [...], 'labels': [...]}."""
    from .optimize.layout import spec_from_inputs
    spec = spec_from_inputs(**optimization_inputs)
    bounds, labels = [], []
    for name, i in (("intrinsics", spec.state_index_intrinsics0),
                    ("extrinsics", spec.state_index_extrinsics0),
                    ("frames", spec.state_index_frames0),
                    ("points", spec.state_index_points0),
                    ("calobject_warp", spec.state_index_calobject_warp0)):
        bounds.append(i)
        labels.append(name)
    return dict(boundaries=bounds, labels=labels, Nstate=spec.Nstate)


def plotoptions_measurement_boundaries(**optimization_inputs):
    """Measurement-block boundaries (reference: utils.py:1060)."""
    from .optimize.layout import spec_from_inputs
    spec = spec_from_inputs(**optimization_inputs)
    return dict(
        boundaries=[spec.measurement_index_boards0,
                    spec.measurement_index_points0,
                    spec.measurement_index_points_triangulated0,
                    spec.measurement_index_regularization0],
        labels=["boards", "points", "triangulated", "regularization"],
        Nmeasurements=spec.Nmeasurements)


def mapping_file_framenocameraindex(*files_per_camera):
    """Map image filenames to (framenumber, icamera)
    (reference: utils.py:788): the frame number is the varying numeric
    field in each camera's filename list."""
    import re as _re
    mapping = {}
    for icam, files in enumerate(files_per_camera):
        for f in files:
            m = _re.search(r"[0-9]+", f)
            frameno = int(m.group(0)) if m else 0
            mapping[f] = (frameno, icam)
    return mapping


def apply_homography(H, v):
    """Apply a 3x3 homogeneous-coordinate homography to 2D points
    (reference: mrcal-genpywrap.py:721-760).  Broadcasts fully over both
    arguments: H (..., 3, 3), v (..., 2) -> (..., 2)."""
    import jax.numpy as jnp
    H = jnp.asarray(H)
    v = jnp.asarray(v)
    xyz = jnp.einsum("...ij,...j->...i", H[..., :, :2], v) + H[..., :, 2]
    return xyz[..., :2] / xyz[..., 2:3]
