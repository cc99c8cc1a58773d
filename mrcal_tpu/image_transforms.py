"""Image reprojection between lens models (reference:
/root/reference/mrcal/image_transforms.py).  cv2.remap is replaced by
jax.scipy.ndimage.map_coordinates — the remap becomes one vectorized gather
that XLA pipelines from HBM."""

import numpy as np
import jax
import jax.numpy as jnp

from . import _xla  # noqa: F401
from . import poseutils
from .projections import project, unproject


def scale_focal__best_pinhole_fit(model, fit):
    """The focal-length scale fitting the requested view into a pinhole
    reprojection (reference: image_transforms.py:24).

    fit: None, 'corners', 'centers-horizontal', 'centers-vertical', or an
    (N,2) array of pixel points to fit."""
    if fit is None:
        return 1.0
    W, H = model.imagersize()
    if isinstance(fit, str):
        if fit == "corners":
            q = np.array(((0., 0.), (0., H - 1.),
                          (W - 1., 0.), (W - 1., H - 1.)))
        elif fit == "centers-horizontal":
            q = np.array(((0., (H - 1.) / 2.), (W - 1., (H - 1.) / 2.)))
        elif fit == "centers-vertical":
            q = np.array((((W - 1.) / 2., 0.), ((W - 1.) / 2., H - 1.)))
        else:
            raise Exception(f"Unknown fit='{fit}'")
    else:
        q = np.asarray(fit)

    lensmodel, intrinsics_data = model.intrinsics()
    v = np.asarray(unproject(q, lensmodel, intrinsics_data))
    # check that the center pixel coords fit all observation vectors at the
    # scaled focal length; find the minimal scale
    fx, fy, cx, cy = intrinsics_data[:4]
    W, H = model.imagersize()
    # normalized pinhole coords of the fit points
    xy = v[..., :2] / v[..., 2:3]
    # x*f*scale + cx in [0, W-1] for all points -> scale bound per point
    scales = []
    for (x, y) in xy:
        if x < 0:
            scales.append((0 - cx) / (x * fx))
        else:
            scales.append((W - 1 - cx) / (x * fx))
        if y < 0:
            scales.append((0 - cy) / (y * fy))
        else:
            scales.append((H - 1 - cy) / (y * fy))
    scales = [s for s in scales if s > 0]
    return float(min(scales)) if scales else 1.0


def pinhole_model_for_reprojection(model_from, fit=None, *,
                                   scale_focal=None, scale_image=None):
    """A pinhole model for reprojecting images from model_from
    (reference: image_transforms.py:150)."""
    from .cameramodel import cameramodel
    lensmodel, intrinsics_data = model_from.intrinsics()
    if scale_focal is None:
        scale_focal = scale_focal__best_pinhole_fit(model_from, fit)
    fx, fy, cx, cy = intrinsics_data[:4]
    intrinsics_pinhole = np.array([fx * scale_focal, fy * scale_focal,
                                   cx, cy])
    imagersize = np.array(model_from.imagersize())
    if scale_image is not None:
        imagersize = (imagersize.astype(float) * scale_image + 0.5).astype(int)
        intrinsics_pinhole *= scale_image
    return cameramodel(
        intrinsics=("LENSMODEL_PINHOLE", intrinsics_pinhole),
        imagersize=imagersize,
        rt_cam_ref=model_from.extrinsics_rt_fromref())


def image_transformation_map(model_from, model_to, *,
                             intrinsics_only=False,
                             distance=None,
                             plane_n=None, plane_d=None,
                             mask_valid_intrinsics_region_from=False):
    """The pixel map transforming images captured by model_from into the view
    of model_to (reference: image_transforms.py:276).  Returns
    (H, W, 2) float32 of source pixel coords per destination pixel."""
    W, H = model_to.imagersize()
    qx = np.arange(W)
    qy = np.arange(H)
    qxg, qyg = np.meshgrid(qx, qy)
    q_to = jnp.asarray(np.stack([qxg, qyg], axis=-1), dtype=jnp.float64)

    v_to = unproject(q_to, *model_to.intrinsics(),
                     normalize=distance is not None)

    if not intrinsics_only:
        Rt_to_ref = model_to.Rt_cam_ref()
        Rt_ref_from = model_from.Rt_ref_cam()
        Rt_to_from = np.asarray(poseutils.compose_Rt(Rt_to_ref, Rt_ref_from))
        Rt_from_to = np.asarray(poseutils.invert_Rt(jnp.asarray(Rt_to_from)))
        if plane_n is not None:
            # points on a plane n.p = d in the 'to' camera coords
            n = jnp.asarray(plane_n, dtype=v_to.dtype)
            d = plane_d
            k = d / jnp.einsum("...i,i->...", v_to, n)
            p_to = v_to * k[..., None]
            v_from = poseutils.transform_point_Rt(jnp.asarray(Rt_from_to),
                                                  p_to)
        elif distance is not None:
            p_to = v_to * distance
            v_from = poseutils.transform_point_Rt(jnp.asarray(Rt_from_to),
                                                  p_to)
        else:
            v_from = poseutils.rotate_point_R(
                jnp.asarray(Rt_from_to[:3, :]), v_to)
    else:
        v_from = v_to

    q_from = project(v_from, *model_from.intrinsics())
    out = np.asarray(q_from, dtype=np.float32)
    if mask_valid_intrinsics_region_from:
        from .model_analysis import is_within_valid_intrinsics_region
        mask = is_within_valid_intrinsics_region(out, model_from)
        if mask is not None:
            out[~mask] = -1.0
    return out


def transform_image(image, mapxy, *, out=None, interpolation=None):
    """Remap an image through a pixel map (reference:
    image_transforms.py:514, a cv2.remap wrapper; here:
    jax.scipy.ndimage.map_coordinates, bilinear)."""
    image = jnp.asarray(image)
    mapxy = jnp.asarray(mapxy)
    coords = [mapxy[..., 1], mapxy[..., 0]]     # row, col
    if image.ndim == 3:
        chans = [jax.scipy.ndimage.map_coordinates(
            image[..., c], coords, order=1, mode="constant", cval=0.0)
            for c in range(image.shape[-1])]
        res = jnp.stack(chans, axis=-1)
    else:
        res = jax.scipy.ndimage.map_coordinates(
            image, coords, order=1, mode="constant", cval=0.0)
    res = np.asarray(res)
    if image.dtype == np.uint8:
        res = np.clip(res, 0, 255).astype(np.uint8)
    elif image.dtype == np.uint16:
        res = np.clip(res, 0, 65535).astype(np.uint16)
    if out is not None:
        np.copyto(out, res)
        return out
    return res
