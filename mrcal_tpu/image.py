"""Image I/O + colormaps (reference: /root/reference/image.c N13).

The reference wraps stb_image/libpng/libjpeg in C; here PIL covers the
formats (8/16-bit gray, color, PNM) and the colormap is a vectorized jnp op.
"""

import numpy as np

from . import _xla  # noqa: F401


def load_image(filename, *, bits_per_pixel=None, channels=None):
    """Load an image into a numpy array (reference: mrcal.load_image).

    bits_per_pixel/channels request a specific output format:
    (8,1) uint8 gray, (16,1) uint16 gray, (24,3) uint8 bgr."""
    from PIL import Image
    im = Image.open(filename)
    arr = np.asarray(im)

    if channels == 1 or (channels is None and arr.ndim == 2):
        if arr.ndim == 3:
            # rgb -> gray (ITU-R 601 luma, matching stb's conversion)
            arr = (0.299 * arr[..., 0] + 0.587 * arr[..., 1]
                   + 0.114 * arr[..., 2])
        if bits_per_pixel == 16:
            if arr.dtype != np.uint16:
                arr = (arr.astype(np.float64)
                       * (65535.0 / 255.0)).round().astype(np.uint16) \
                    if arr.dtype == np.uint8 else arr.astype(np.uint16)
        else:
            if arr.dtype == np.uint16:
                arr = (arr >> 8).astype(np.uint8)
            elif arr.dtype != np.uint8:
                arr = np.clip(arr, 0, 255).astype(np.uint8)
        return np.ascontiguousarray(arr)

    # color: return BGR like the reference (mrcal_image_bgr_t)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    if arr.shape[-1] == 4:
        arr = arr[..., :3]
    return np.ascontiguousarray(arr[..., ::-1])


def save_image(filename, array):
    """Save an image (uint8 gray / uint16 gray / uint8 bgr)."""
    from PIL import Image
    array = np.asarray(array)
    if array.ndim == 3:
        im = Image.fromarray(array[..., ::-1])    # bgr -> rgb
    elif array.dtype == np.uint16:
        im = Image.fromarray(array, mode="I;16")
    else:
        im = Image.fromarray(array)
    im.save(filename)


def apply_color_map(image, *, a_min=None, a_max=None,
                    function_red=None, function_green=None,
                    function_blue=None):
    """Colormap a scalar image to BGR (reference: mrcal_apply_color_map,
    mrcal.h:892-929).  Default: the reference's jet-like map."""
    import jax.numpy as jnp
    image = np.asarray(image, dtype=np.float64)
    if a_min is None:
        a_min = np.nanmin(image)
    if a_max is None:
        a_max = np.nanmax(image)
    x = np.clip((image - a_min) / max(a_max - a_min, 1e-30), 0.0, 1.0)
    # jet-style piecewise map
    r = np.clip(1.5 - np.abs(4 * x - 3), 0, 1)
    g = np.clip(1.5 - np.abs(4 * x - 2), 0, 1)
    b = np.clip(1.5 - np.abs(4 * x - 1), 0, 1)
    out = np.stack([b, g, r], axis=-1)   # BGR
    return (out * 255).astype(np.uint8)
