"""Synthetic calibration scenes — the test-fixture engine.

Reference: /root/reference/mrcal/synthetic_data.py (ref_calibration_object:25,
synthesize_board_observations:236, make_perfect_observations:594).
Host-side numpy drives the random scene generation (matching the reference's
np.random usage so seeded tests behave the same way); projection goes
through the JAX kernels.
"""

import numpy as np
import jax.numpy as jnp

from . import _xla  # noqa: F401
from . import poseutils
from .projections import project


def ref_calibration_object(W=None, H=None, object_spacing=None, *,
                           optimization_inputs=None,
                           calobject_warp=None,
                           x_corner0=0, x_corner1=None, Nx=None,
                           y_corner0=0, y_corner1=None, Ny=None):
    """Calibration-object geometry (reference: synthetic_data.py:25).

    Returns (..., H, W, 3) of corner positions in board coords; z carries the
    2-parameter parabolic warp: z = kx 4 xr(1-xr) + ky 4 yr(1-yr) with
    xr = x/(W-1)."""
    if optimization_inputs is not None:
        W = optimization_inputs["observations_board"].shape[-2]
        H = optimization_inputs["observations_board"].shape[-3]
        object_spacing = optimization_inputs["calibration_object_spacing"]
        calobject_warp = optimization_inputs.get("calobject_warp")

    if x_corner1 is None:
        x_corner1 = W - 1
    if Nx is None:
        Nx = W
    if y_corner1 is None:
        y_corner1 = H - 1
    if Ny is None:
        Ny = H

    xx = np.linspace(x_corner0, x_corner1, Nx)
    yy = np.linspace(y_corner0, y_corner1, Ny)
    xg, yg = np.meshgrid(xx, yy)

    full = np.zeros((Ny, Nx, 3))
    full[..., 0] = xg * object_spacing
    full[..., 1] = yg * object_spacing

    if calobject_warp is not None:
        cw = np.asarray(calobject_warp)
        xr = xg / (W - 1)
        yr = yg / (H - 1)
        # broadcast over leading dims of calobject_warp
        if cw.ndim == 1:
            full[..., 2] = (cw[0] * 4 * xr * (1 - xr) +
                            cw[1] * 4 * yr * (1 - yr))
        else:
            z = (cw[..., 0:1, None] * 4 * xr * (1 - xr) +
                 cw[..., 1:2, None] * 4 * yr * (1 - yr))
            out = np.zeros(cw.shape[:-1] + (Ny, Nx, 3))
            out[...] = full
            out[..., 2] = z
            return out
    return full


def synthesize_board_observations(models, *,
                                  object_width_n, object_height_n,
                                  object_spacing, calobject_warp,
                                  rt_ref_boardcenter,
                                  rt_ref_boardcenter__noiseradius,
                                  Nframes,
                                  max_oblique_angle_deg=None,
                                  pcamera_nominal_ref=np.zeros(3),
                                  which='all-cameras-must-see-full-board'):
    """Random synthetic chessboard observations (reference:
    synthetic_data.py:236).  Returns (q, Rt_ref_boardref):
    q (Nframes, Ncameras, H, W, 2); Rt maps the ref_calibration_object()
    frame (corner 0 at the origin) to the reference."""
    which_valid = ('all-cameras-must-see-full-board',
                   'some-cameras-must-see-full-board',
                   'all-cameras-must-see-half-board',
                   'some-cameras-must-see-half-board')
    if which not in which_valid:
        raise Exception(f"'which' must be one of {which_valid}")

    Ncameras = len(models)
    board_center = np.array(((object_width_n - 1) * object_spacing / 2.,
                             (object_height_n - 1) * object_spacing / 2.,
                             0))
    board_reference = ref_calibration_object(
        object_width_n, object_height_n, object_spacing,
        calobject_warp=calobject_warp) - board_center
    Rt_boardref_origboardref = np.asarray(poseutils.identity_Rt())
    Rt_boardref_origboardref = Rt_boardref_origboardref.copy()
    Rt_boardref_origboardref[3, :] = -board_center

    max_cos = (np.cos(max_oblique_angle_deg * np.pi / 180)
               if max_oblique_angle_deg is not None else None)

    Rt_cam_ref_all = [np.asarray(m.Rt_cam_ref()) for m in models]
    intrinsics_all = [m.intrinsics() for m in models]
    imagersizes = [np.asarray(m.imagersize()) for m in models]

    def chunk():
        randomblock = np.random.uniform(-1.0, 1.0, size=(Nframes, 6))
        rt = np.asarray(rt_ref_boardcenter) + \
            randomblock * np.asarray(rt_ref_boardcenter__noiseradius)
        Rt_ref_boardref = np.asarray(poseutils.Rt_from_rt(rt))
        boards_ref = np.asarray(poseutils.transform_point_Rt(
            Rt_ref_boardref[:, None, None], board_reference))
        qs = []
        for i in range(Ncameras):
            p_cam = np.asarray(poseutils.transform_point_Rt(
                Rt_cam_ref_all[i], boards_ref))
            qs.append(np.asarray(project(p_cam, *intrinsics_all[i])))
        q = np.stack(qs, axis=1)        # (Nframes, Ncam, H, W, 2)
        return q, Rt_ref_boardref

    def cull(q, Rt_ref_boardref):
        if max_cos is not None:
            npos = Rt_ref_boardref[..., 3, :] - pcamera_nominal_ref
            npos = npos / np.linalg.norm(npos, axis=-1, keepdims=True)
            nori = Rt_ref_boardref[..., :3, 2]
            costh = np.abs(np.sum(npos * nori, axis=-1))
            keep = costh > max_cos
            q = q[keep]
            Rt_ref_boardref = Rt_ref_boardref[keep]
        mask = (q[..., 0] >= 0) & (q[..., 1] >= 0)
        for i in range(Ncameras):
            Wpx, Hpx = imagersizes[i]
            mask[:, i] &= (q[:, i, ..., 0] <= Wpx - 1) & \
                          (q[:, i, ..., 1] <= Hpx - 1)
        Nvis = np.count_nonzero(mask, axis=(-1, -2))
        Npt = object_width_n * object_height_n
        if which == 'all-cameras-must-see-full-board':
            keep = np.all(Nvis == Npt, axis=-1)
        elif which == 'some-cameras-must-see-full-board':
            keep = np.any(Nvis == Npt, axis=-1)
        elif which == 'all-cameras-must-see-half-board':
            keep = np.all(Nvis > Npt // 2, axis=-1)
        else:
            keep = np.any(Nvis > Npt // 2, axis=-1)
        return q[keep], Rt_ref_boardref[keep]

    q_all = np.zeros((0, Ncameras, object_height_n, object_width_n, 2))
    Rt_all = np.zeros((0, 4, 3))
    while True:
        q, Rt = cull(*chunk())
        q_all = np.concatenate([q_all, q], axis=0)
        Rt_all = np.concatenate([Rt_all, Rt], axis=0)
        if q_all.shape[0] >= Nframes:
            q_all = q_all[:Nframes]
            Rt_all = Rt_all[:Nframes]
            break

    return q_all, np.asarray(
        poseutils.compose_Rt(Rt_all, Rt_boardref_origboardref))


def make_perfect_observations(optimization_inputs, *,
                              observed_pixel_uncertainty=None):
    """Overwrite the observations in optimization_inputs with perfect
    reprojections of the current solution, optionally adding gaussian pixel
    noise (reference: synthetic_data.py:594)."""
    from .optimize.layout import spec_from_inputs
    from .optimize.residuals import (arrays_from_inputs, params_from_arrays,
                                     residuals_board, residuals_point,
                                     board_points_ref)
    from .lensmodels import project_core
    from .poseutils import _compose_rt2, _transform_point_rt

    spec = spec_from_inputs(**optimization_inputs)
    arrays = arrays_from_inputs(**optimization_inputs)
    params = params_from_arrays(arrays)

    if spec.Nobservations_board:
        obs = np.asarray(optimization_inputs["observations_board"])
        idx = np.asarray(
            optimization_inputs["indices_frame_camintrinsics_camextrinsics"])
        ifr, ici, ice = idx[:, 0], idx[:, 1], idx[:, 2]
        ext = np.concatenate([np.zeros((1, 6)),
                              np.asarray(params["extrinsics"])], axis=0)
        rt_joint = np.asarray(_compose_rt2(
            jnp.asarray(ext[ice + 1]), params["frames"][ifr]))
        pts = board_points_ref(spec, params["calobject_warp"])
        p_cam = np.asarray(_transform_point_rt(
            jnp.asarray(rt_joint)[:, None, None, :], pts[None]))
        q = np.asarray(project_core(
            jnp.asarray(p_cam),
            params["intrinsics"][ici][:, None, None, :], spec.lensmodel))
        obs[..., :2] = q
        if observed_pixel_uncertainty:
            obs[..., :2] += np.random.randn(*q.shape) * \
                observed_pixel_uncertainty

    if spec.Nobservations_point:
        obs = np.asarray(optimization_inputs["observations_point"])
        idx = np.asarray(
            optimization_inputs["indices_point_camintrinsics_camextrinsics"])
        ipt, ici, ice = idx[:, 0], idx[:, 1], idx[:, 2]
        ext = np.concatenate([np.zeros((1, 6)),
                              np.asarray(params["extrinsics"])], axis=0)
        p_cam = np.asarray(_transform_point_rt(
            jnp.asarray(ext[ice + 1]), params["points"][ipt]))
        q = np.asarray(project_core(
            jnp.asarray(p_cam), params["intrinsics"][ici], spec.lensmodel))
        obs[:, :2] = q
        if observed_pixel_uncertainty:
            obs[:, :2] += np.random.randn(*q.shape) * \
                observed_pixel_uncertainty


def make_tracks(model, *,
                Rt_NED_cam0=None,
                R_cam_camnext=None,
                t_cam_camnext__world=None,
                Nobservations_total=1000,
                track_length=4,
                Nobservations_image=50,
                gridn=10,
                Npoint_observations_min=4,
                Ncam_observing_min=4):
    """Synthesize SfM feature tracks: a camera moving over a ground plane
    (z=0 in the world/NED frame) observing persistent ground features
    (reference: synthetic_data.py:759).

    Returns (observations (N,2 pixel coords), indices (N,2) of
    [ipoint, icam], points (Npoints,3 world coords),
    Rt_NED_cam (Ncameras,4,3))."""
    from . import poseutils
    from .projections import project, unproject

    W, H = model.imagersize()
    if Rt_NED_cam0 is None:
        # camera 100m up (NED: z down), looking down: camera +z (forward)
        # maps to NED +z, so the identity rotation looks at the ground
        Rt_NED_cam0 = np.concatenate([np.eye(3), [[0., 0., -100.]]], axis=0)
    if R_cam_camnext is None:
        R_cam_camnext = np.eye(3)
    if t_cam_camnext__world is None:
        t_cam_camnext__world = np.array([20.0, 0.0, 0.0])

    Ncameras = max(2, int(np.ceil(Nobservations_total /
                                  max(Nobservations_image, 1))))
    Rt_NED_cam = np.zeros((Ncameras, 4, 3))
    Rt_NED_cam[0] = Rt_NED_cam0
    for i in range(1, Ncameras):
        Rt_NED_cam[i, :3] = Rt_NED_cam[i - 1, :3] @ R_cam_camnext
        Rt_NED_cam[i, 3] = Rt_NED_cam[i - 1, 3] + t_cam_camnext__world

    # ground features: sample pixel grids from each camera, intersect with
    # the ground plane, dedup by grid binning
    points = []
    for i in range(0, Ncameras, max(1, track_length // 2)):
        qx = np.linspace(0.05 * W, 0.95 * W, gridn)
        qy = np.linspace(0.05 * H, 0.95 * H, gridn)
        qg = np.stack(np.meshgrid(qx, qy), axis=-1).reshape(-1, 2)
        vcam = np.asarray(unproject(qg, *model.intrinsics()))
        vw = vcam @ Rt_NED_cam[i, :3].T
        pc = Rt_NED_cam[i, 3]
        with np.errstate(divide="ignore", invalid="ignore"):
            d = -pc[2] / vw[:, 2]
        ok = np.isfinite(d) & (d > 0)
        points.append(pc + d[ok, None] * vw[ok])
    points = np.concatenate(points, axis=0)
    # dedup on a world grid
    key = np.round(points[:, :2] / 5.0).astype(int)
    _, uniq = np.unique(key, axis=0, return_index=True)
    points = points[np.sort(uniq)]

    observations = []
    indices = []
    for ip, p in enumerate(points):
        seen = []
        for ic in range(Ncameras):
            p_cam = np.asarray(poseutils.transform_point_Rt(
                np.asarray(poseutils.invert_Rt(Rt_NED_cam[ic])), p))
            if p_cam[2] <= 0:
                continue
            q = np.asarray(project(p_cam, *model.intrinsics()))
            if 0 <= q[0] <= W - 1 and 0 <= q[1] <= H - 1:
                seen.append((ic, q))
            if len(seen) >= track_length:
                break
        if len(seen) >= max(2, min(Npoint_observations_min,
                                   Ncam_observing_min)):
            for ic, q in seen:
                observations.append(q)
                indices.append((ip, ic))
        if len(observations) >= Nobservations_total:
            break

    return (np.array(observations), np.array(indices, dtype=np.int32),
            points, Rt_NED_cam)
