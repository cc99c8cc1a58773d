"""Stereo rectification + ranging, TPU-native.

Reference: /root/reference/stereo.c (C fast path) and
/root/reference/mrcal/stereo.py (python reference impls; rectified_system
:486, rectified_resolution :118, rectification_maps :821, stereo_range :978).
Here everything is jnp: the rectification maps are a pure batched
unproject->rotate->project pipeline, and disparity->range is closed-form.
"""

import numpy as np
import jax.numpy as jnp

from . import _xla  # noqa: F401
from . import poseutils
from .projections import (project, unproject, unproject_latlon,
                          unproject_pinhole, project_latlon, project_pinhole)


def rectified_resolution(model0, *, az_fov_deg, el_fov_deg,
                         az0_deg, el0_deg, R_cam0_rect0,
                         pixels_per_deg_az=-1., pixels_per_deg_el=-1.,
                         rectification_model='LENSMODEL_LATLON'):
    """Resolution for the rectified system (reference: stereo.py:118).
    pixels_per_deg < 0 means 'that scale factor of the input resolution at
    the rectified center'."""
    if pixels_per_deg_az < 0 or pixels_per_deg_el < 0:
        azel0 = np.array((az0_deg, el0_deg)) * np.pi / 180.
        if rectification_model == 'LENSMODEL_LATLON':
            vrect, dvrect_dazel = unproject_latlon(azel0, get_gradients=True)
        elif rectification_model == 'LENSMODEL_LONLAT':
            from .projections import unproject_lonlat
            vrect, dvrect_dazel = unproject_lonlat(azel0, get_gradients=True)
        elif rectification_model == 'LENSMODEL_PINHOLE':
            qn = np.tan(azel0)
            vrect, dv_dqn = unproject_pinhole(qn, get_gradients=True)
            cos_azel0 = np.cos(azel0)
            dvrect_dazel = np.asarray(dv_dqn) / (cos_azel0 * cos_azel0)
        else:
            raise Exception("Unsupported rectification model")
        v0 = np.asarray(R_cam0_rect0) @ np.asarray(vrect)
        dv0_dazel = np.asarray(R_cam0_rect0) @ np.asarray(dvrect_dazel)
        _, dq_dv0, _ = project(v0, *model0.intrinsics(), get_gradients=True)
        dq_dazel = np.asarray(dq_dv0) @ dv0_dazel
        if pixels_per_deg_az < 0:
            have = np.linalg.norm(dq_dazel[:, 0]) * np.pi / 180.
            pixels_per_deg_az = -pixels_per_deg_az * have
        if pixels_per_deg_el < 0:
            have = np.linalg.norm(dq_dazel[:, 1]) * np.pi / 180.
            pixels_per_deg_el = -pixels_per_deg_el * have

    if rectification_model in ('LENSMODEL_LATLON', 'LENSMODEL_LONLAT'):
        # fit integer pixel counts in the fov
        Naz = round(az_fov_deg * pixels_per_deg_az)
        Nel = round(el_fov_deg * pixels_per_deg_el)
        pixels_per_deg_az = Naz / az_fov_deg
        pixels_per_deg_el = Nel / el_fov_deg
    return pixels_per_deg_az, pixels_per_deg_el


def rectified_system(models, *, az_fov_deg, el_fov_deg,
                     az0_deg=None, el0_deg=0,
                     az_edge_margin_deg=10.,
                     pixels_per_deg_az=-1., pixels_per_deg_el=-1.,
                     rectification_model='LENSMODEL_LATLON',
                     return_metadata=False):
    """Build the epipolar-aligned rectified camera pair (reference:
    stereo.py:486 _rectified_system_python / stereo.c:390)."""
    from .cameramodel import cameramodel
    if rectification_model not in ('LENSMODEL_LATLON', 'LENSMODEL_PINHOLE'):
        raise Exception(f"Unsupported rectification model "
                        f"'{rectification_model}'")
    if len(models) != 2:
        raise Exception("I need exactly 2 camera models")
    if az_fov_deg is None or el_fov_deg is None or \
       az_fov_deg <= 0 or el_fov_deg <= 0:
        raise Exception("az_fov_deg, el_fov_deg must be > 0")

    Rt01 = np.asarray(poseutils.compose_Rt(models[0].Rt_cam_ref(),
                                           models[1].Rt_ref_cam()))

    # rectified axes in cam0 coords: right = baseline direction, forward =
    # mean optical axis orthogonalized, down completes
    right = Rt01[3, :].copy()
    baseline = np.linalg.norm(right)
    right /= baseline
    forward0 = np.array((0, 0, 1.))
    forward1 = Rt01[:3, 2]
    forward01 = forward0 + forward1
    forward01_proj_right = np.dot(forward01, right)
    forward = forward01 - forward01_proj_right * right
    forward /= np.linalg.norm(forward)
    down = np.cross(forward, right)
    R_rect0_cam0 = np.stack([right, down, forward], axis=0)

    margin_loose = az_edge_margin_deg - 1e-3
    if az0_deg is not None:
        az0 = az0_deg * np.pi / 180.
        if not (az0_deg - az_fov_deg / 2. > -90. + margin_loose and
                az0_deg + az_fov_deg / 2. < 90. - margin_loose):
            raise Exception("rectified view looks along the baseline; "
                            "reduce az_fov_deg or adjust az0_deg")
    else:
        az0 = np.arcsin(forward01_proj_right / np.linalg.norm(forward01))
        az0_deg = az0 * 180. / np.pi
        if not (az0_deg - az_fov_deg / 2. > -90. + margin_loose and
                az0_deg + az_fov_deg / 2. < 90. - margin_loose):
            if az_fov_deg > 180. - 2. * az_edge_margin_deg:
                raise Exception("az_fov_deg too large to avoid the baseline")
            if not (az0_deg - az_fov_deg / 2. > -90. + margin_loose):
                az0_deg = -90. + az_edge_margin_deg + az_fov_deg / 2.
            else:
                az0_deg = 90. - az_edge_margin_deg - az_fov_deg / 2.
            az0 = az0_deg / 180. * np.pi
    el0 = el0_deg * np.pi / 180.

    pixels_per_deg_az, pixels_per_deg_el = rectified_resolution(
        models[0], az_fov_deg=az_fov_deg, el_fov_deg=el_fov_deg,
        az0_deg=az0_deg, el0_deg=el0_deg,
        R_cam0_rect0=R_rect0_cam0.T,
        pixels_per_deg_az=pixels_per_deg_az,
        pixels_per_deg_el=pixels_per_deg_el,
        rectification_model=rectification_model)

    fxycxy = np.array((pixels_per_deg_az / np.pi * 180.,
                       pixels_per_deg_el / np.pi * 180., 0., 0.))
    if rectification_model == 'LENSMODEL_LATLON':
        Naz = round(az_fov_deg * pixels_per_deg_az)
        Nel = round(el_fov_deg * pixels_per_deg_el)
        fxycxy[2:] = (np.array(((Naz - 1.) / 2., (Nel - 1.) / 2.)) -
                      np.array((az0, el0)) * fxycxy[:2])
    else:
        # pinhole rectification (reference: stereo.py:684-716)
        cos_az0 = np.cos(az0)
        cos_el0 = np.cos(el0)
        fxycxy[0] *= cos_az0 * cos_az0
        fxycxy[1] *= cos_el0 * cos_el0

        def cxy(fxy, tanazel0, fov_deg):
            cosfov = np.cos(fov_deg * np.pi / 180.)
            cos2fov = cosfov * cosfov
            K = 2. * tanazel0
            C = np.roots([(cos2fov - 1),
                          2. * K * (cos2fov - 1),
                          cos2fov * K * K + 2. * cos2fov - K * K + 2,
                          2. * K * (cos2fov + 1),
                          cos2fov * (K * K + 1.) - 1])
            C = np.real(C)
            C = C[cosfov * (1 - K * C - C * C) >= -1e-9]
            C = C[(tanazel0 * fxy + C * fxy) * 2. + 1 > 0]
            if len(C) == 0:
                raise Exception("Couldn't compute the rectified pinhole "
                                "center pixel")
            return C[np.argmax(cosfov * (1 - K * C - C * C))] * fxy

        tanaz0 = np.tan(az0)
        tanel0 = np.tan(el0)
        fxycxy[2] = cxy(fxycxy[0], tanaz0, az_fov_deg)
        fxycxy[3] = cxy(fxycxy[1], tanel0, el_fov_deg)
        Naz = round((tanaz0 * fxycxy[0] + fxycxy[2]) * 2.) + 1
        Nel = round((tanel0 * fxycxy[1] + fxycxy[3]) * 2.) + 1
    if Nel <= 0:
        raise Exception(f"Nonsensical rectified geometry: Nel={Nel}")

    Rt_rect0_cam0 = np.concatenate([R_rect0_cam0, np.zeros((1, 3))], axis=0)
    Rt_rect0_ref = np.asarray(poseutils.compose_Rt(
        Rt_rect0_cam0, models[0].Rt_cam_ref()))
    R_rect1_cam1 = R_rect0_cam0 @ Rt01[:3, :]
    Rt_rect1_cam1 = np.concatenate([R_rect1_cam1, np.zeros((1, 3))], axis=0)
    Rt_rect1_ref = np.asarray(poseutils.compose_Rt(
        Rt_rect1_cam1, models[1].Rt_cam_ref()))

    models_rectified = (
        cameramodel(intrinsics=(rectification_model, fxycxy),
                    imagersize=(int(Naz), int(Nel)),
                    rt_cam_ref=np.asarray(
                        poseutils.rt_from_Rt(Rt_rect0_ref))),
        cameramodel(intrinsics=(rectification_model, fxycxy),
                    imagersize=(int(Naz), int(Nel)),
                    rt_cam_ref=np.asarray(
                        poseutils.rt_from_Rt(Rt_rect1_ref))))
    if not return_metadata:
        return models_rectified
    metadata = dict(az_fov_deg=az_fov_deg, el_fov_deg=el_fov_deg,
                    az0_deg=az0 * 180. / np.pi, el0_deg=el0_deg,
                    pixels_per_deg_az=pixels_per_deg_az,
                    pixels_per_deg_el=pixels_per_deg_el,
                    baseline=baseline)
    return models_rectified, metadata


def _validate_rectification(models, models_rectified):
    lm = models_rectified[0].intrinsics()[0]
    if lm not in ('LENSMODEL_LATLON', 'LENSMODEL_PINHOLE'):
        raise Exception("rectified models must be LATLON or PINHOLE")
    i0 = models_rectified[0].intrinsics()[1]
    i1 = models_rectified[1].intrinsics()[1]
    if not np.allclose(i0, i1):
        raise Exception("rectified models must share intrinsics")
    return lm


def rectification_maps(models, models_rectified):
    """Pixel maps for remapping raw images to the rectified space
    (reference: stereo.py:821 / stereo.c:824).  Returns
    (rectification_maps (2, Nel, Naz, 2))."""
    _validate_rectification(models, models_rectified)
    lm_rect, intr_rect = models_rectified[0].intrinsics()
    Naz, Nel = models_rectified[0].imagersize()

    # rectified pixel grid
    qx = np.arange(Naz)
    qy = np.arange(Nel)
    qxg, qyg = np.meshgrid(qx, qy)
    q_rect = jnp.asarray(np.stack([qxg, qyg], axis=-1), dtype=jnp.float64)

    maps = []
    for i in range(2):
        v_rect = unproject(q_rect, lm_rect, intr_rect)
        R_cam_rect = np.asarray(poseutils.compose_Rt(
            models[i].Rt_cam_ref(),
            models_rectified[i].Rt_ref_cam()))[:3, :]
        v_cam = jnp.einsum("ij,...j->...i", jnp.asarray(R_cam_rect), v_rect)
        q_cam = project(v_cam, *models[i].intrinsics())
        maps.append(np.asarray(q_cam, dtype=np.float32))
    return np.array(maps)


def stereo_range(disparity, models_rectified, *,
                 disparity_scale=1, disparity_min=None, disparity_scaled_min=None,
                 disparity_max=None, disparity_scaled_max=None,
                 qrect0=None):
    """Convert disparity (pixels, possibly scaled) to ranges (reference:
    stereo.py:978 / stereo.c:1263-1417).

    For LENSMODEL_LATLON: range = baseline cos(az1) / sin(az0 - az1)."""
    lm = _validate_rectification(models_rectified, models_rectified)
    intr = models_rectified[0].intrinsics()[1]
    fx, fy, cx, cy = intr[:4]
    Rt01 = np.asarray(poseutils.compose_Rt(
        models_rectified[0].Rt_cam_ref(),
        models_rectified[1].Rt_ref_cam()))
    baseline = np.linalg.norm(Rt01[3, :])

    disparity = jnp.asarray(disparity)
    d = disparity / disparity_scale        # pixels

    W = int(models_rectified[0].imagersize()[0])
    if qrect0 is None:
        qx = jnp.arange(disparity.shape[-1], dtype=d.dtype)
        qx = jnp.broadcast_to(qx, disparity.shape)
    else:
        qx = jnp.asarray(qrect0)[..., 0]

    valid = d > 0
    if disparity_min is not None:
        valid = valid & (d >= disparity_min)
    if disparity_scaled_min is not None:
        valid = valid & (disparity >= disparity_scaled_min)
    if disparity_max is not None:
        valid = valid & (d <= disparity_max)
    if disparity_scaled_max is not None:
        valid = valid & (disparity <= disparity_scaled_max)

    if lm == 'LENSMODEL_LATLON':
        az0 = (qx - cx) / fx
        az1 = az0 - d / fx
        r = baseline * jnp.cos(az1) / jnp.sin(jnp.maximum(az0 - az1, 1e-12))
    else:
        tanaz0 = (qx - cx) / fx
        tanaz1 = tanaz0 - d / fx
        az0 = jnp.arctan(tanaz0)
        az1 = jnp.arctan(tanaz1)
        r = baseline * jnp.cos(az1) / jnp.sin(jnp.maximum(az0 - az1, 1e-12))
    return jnp.where(valid, r, 0.0)


def stereo_unproject(disparity, models_rectified, *,
                     ranges=None, disparity_scale=1, qrect0=None):
    """Unproject rectified pixels + disparity to 3D points in the rect0 frame
    (reference: stereo.py:1453)."""
    lm, intr = models_rectified[0].intrinsics()
    if ranges is None:
        ranges = stereo_range(disparity, models_rectified,
                              disparity_scale=disparity_scale, qrect0=qrect0)
    if qrect0 is None:
        H, W = np.asarray(ranges).shape[-2:]
        qx, qy = np.meshgrid(np.arange(W), np.arange(H))
        qrect0 = jnp.asarray(np.stack([qx, qy], axis=-1), dtype=jnp.float64)
    v = unproject(qrect0, lm, intr, normalize=True)
    return v * jnp.asarray(ranges)[..., None]


def match_feature(image0, image1, q0, *,
                  search_radius1=20,
                  template_size1=17,
                  q1_estimate=None,
                  H10=None,
                  method=None,
                  visualize=False,
                  **kwargs):
    """Find the position in image1 of the feature at q0 in image0
    (reference: stereo.py:1609).  Normalized cross-correlation over a
    search window, with subpixel refinement by quadratic fit.  The whole
    search is one vectorized gather+reduction (TPU-friendly).

    Returns (q1, diagnostics_dict);  q1 is None if the match failed."""
    import jax
    image0 = jnp.asarray(image0, dtype=jnp.float64)
    image1 = jnp.asarray(image1, dtype=jnp.float64)
    q0 = np.asarray(q0, dtype=np.float64)
    if q1_estimate is None:
        if H10 is not None:
            H10 = np.asarray(H10)
            qh = H10 @ np.array([q0[0], q0[1], 1.0])
            q1_estimate = qh[:2] / qh[2]
        else:
            q1_estimate = q0
    q1_estimate = np.asarray(q1_estimate, dtype=np.float64)

    t = template_size1 // 2
    dy, dx = np.mgrid[-t:t + 1, -t:t + 1]

    def sample(im, center):
        rows = center[1] + dy
        cols = center[0] + dx
        return jax.scipy.ndimage.map_coordinates(
            im, [jnp.asarray(rows, jnp.float64),
                 jnp.asarray(cols, jnp.float64)], order=1, mode="nearest")

    templ = sample(image0, q0)
    templ = templ - jnp.mean(templ)
    tnorm = jnp.sqrt(jnp.sum(templ * templ))

    r = search_radius1
    offs = np.mgrid[-r:r + 1, -r:r + 1].reshape(2, -1).T    # (N,2) (dy,dx)

    def score_one(off):
        patch = sample(image1, q1_estimate + off[::-1])
        patch = patch - jnp.mean(patch)
        pnorm = jnp.sqrt(jnp.sum(patch * patch))
        return jnp.sum(patch * templ) / (pnorm * tnorm + 1e-12)

    scores = jax.vmap(score_one)(jnp.asarray(offs, jnp.float64))
    scores2d = np.asarray(scores).reshape(2 * r + 1, 2 * r + 1)
    iy, ix = np.unravel_index(np.argmax(scores2d), scores2d.shape)
    if iy in (0, 2 * r) or ix in (0, 2 * r):
        return None, dict(matchoutput_image=scores2d)
    # subpixel: quadratic fit around the peak
    def subpix(sm1, s0, sp1):
        denom = sm1 - 2 * s0 + sp1
        return 0.0 if abs(denom) < 1e-12 else 0.5 * (sm1 - sp1) / denom
    ddx = subpix(scores2d[iy, ix - 1], scores2d[iy, ix],
                 scores2d[iy, ix + 1])
    ddy = subpix(scores2d[iy - 1, ix], scores2d[iy, ix],
                 scores2d[iy + 1, ix])
    q1 = q1_estimate + np.array([ix - r + ddx, iy - r + ddy])
    return q1, dict(matchoutput_image=scores2d,
                    score=float(scores2d[iy, ix]))


def stereo_matching_ncc(rectified0, rectified1, *,
                        disparity_min=0, disparity_max=64,
                        block_size=9):
    """TPU-native dense stereo block matching: zero-mean NCC over a sliding
    window, computed as one batched reduction over disparities (the
    libelas/SGBM-equivalent slot, reference: stereo-matching-libelas.cc).

    Returns float disparity (H,W); invalid pixels get 0."""
    import jax
    im0 = jnp.asarray(rectified0, jnp.float32)
    im1 = jnp.asarray(rectified1, jnp.float32)
    H, W = im0.shape
    b = block_size // 2
    kernel = jnp.ones((block_size, block_size), jnp.float32)

    def boxsum(x):
        # separable box filter via cumsum
        return jax.scipy.signal.convolve2d(x, kernel, mode="same")

    sum0 = boxsum(im0)
    sum00 = boxsum(im0 * im0)
    n = block_size * block_size
    mean0 = sum0 / n
    var0 = sum00 / n - mean0 * mean0

    def score_at(d):
        im1s = jnp.roll(im1, d, axis=1)
        sum1 = boxsum(im1s)
        sum11 = boxsum(im1s * im1s)
        sum01 = boxsum(im0 * im1s)
        mean1 = sum1 / n
        var1 = sum11 / n - mean1 * mean1
        cov = sum01 / n - mean0 * mean1
        return cov / jnp.sqrt(jnp.maximum(var0 * var1, 1e-6))

    ds = jnp.arange(disparity_min, disparity_max + 1)
    scores = jax.vmap(score_at)(ds)              # (Nd, H, W)
    best = jnp.argmax(scores, axis=0)
    smax = jnp.max(scores, axis=0)
    disp = (best + disparity_min).astype(jnp.float32)
    # subpixel parabola fit
    i = jnp.clip(best, 1, scores.shape[0] - 2)
    sm1 = jnp.take_along_axis(scores, (i - 1)[None], axis=0)[0]
    s0 = jnp.take_along_axis(scores, i[None], axis=0)[0]
    sp1 = jnp.take_along_axis(scores, (i + 1)[None], axis=0)[0]
    denom = sm1 - 2 * s0 + sp1
    sub = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (sm1 - sp1) / denom, 0.0)
    disp = disp + jnp.where(best == i, sub, 0.0)
    # texture/score validity
    valid = (smax > 0.3) & (var0 > 1.0)
    return np.asarray(jnp.where(valid, disp, 0.0))
