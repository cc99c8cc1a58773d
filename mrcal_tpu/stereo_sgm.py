"""TPU-native dense stereo matching: census cost volume + semi-global
matching (SGM), replacing the reference's libelas/OpenCV-SGBM dependency
(reference capability: stereo-matching-libelas.cc, elas-genpywrap.py).

Design for TPU:
  - census transform: bit-packed 5x5 neighborhood comparisons (int32),
    computed with static shifts — no gathers;
  - matching cost: Hamming distance via XOR + lax.population_count, one
    (D, H, W) volume built by a vmap over the disparity axis;
  - SGM path aggregation: the scanline recurrence
        L(d,x) = C(d,x) + min(L(d,x-1), L(d+-1,x-1)+P1, minL+P2) - minL
    is a lax.scan along the path direction whose body is elementwise over
    the (rows, D) plane — wide VPU vectors, no host round-trips.  4 paths
    (left/right/up/down), like most production SGM implementations;
  - winner-take-all + parabola subpixel + left-right consistency check.

Everything is jit-compiled; the whole pipeline is one XLA computation.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp


def census_transform(im, window=5):
    """Bit-packed census descriptor per pixel: bit k set iff neighbor k is
    brighter than the center.  window=5 -> 24 bits in an int32."""
    im = jnp.asarray(im, jnp.float32)
    H, W = im.shape
    r = window // 2
    pad = jnp.pad(im, r, mode="edge")
    bits = []
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            if dy == 0 and dx == 0:
                continue
            bits.append(pad[r + dy:r + dy + H, r + dx:r + dx + W] > im)
    out = jnp.zeros((H, W), jnp.int32)
    for k, b in enumerate(bits):
        out = out | (b.astype(jnp.int32) << k)
    return out


def _hamming(a, b):
    return jax.lax.population_count(
        jnp.bitwise_xor(a, b).astype(jnp.uint32)).astype(jnp.float32)


def census_cost_volume(census0, census1, disparity_min, disparity_max):
    """(D, H, W) Hamming cost: cost[d, y, x] = ham(c0[y,x], c1[y,x-d]).
    Out-of-frame comparisons get the max cost (all bits differ)."""
    H, W = census0.shape
    D = disparity_max - disparity_min + 1
    maxcost = 24.0

    def cost_at(d):
        shifted = jnp.roll(census1, d, axis=1)
        c = _hamming(census0, shifted)
        x = jnp.arange(W)
        return jnp.where(x[None, :] >= d, c, maxcost)

    return jax.vmap(cost_at)(jnp.arange(disparity_min, disparity_max + 1))


def _aggregate_scan(cost_paths, P1, P2):
    """One SGM pass over the LAST axis of cost_paths (R, D, X): the scan
    runs along X, the body is elementwise over (R, D).  Returns aggregated
    costs of the same shape."""
    R, D, X = cost_paths.shape

    def step(Lprev, c_x):
        # Lprev, c_x: (R, D)
        minL = jnp.min(Lprev, axis=-1, keepdims=True)       # (R, 1)
        up = jnp.concatenate(
            [Lprev[:, :1] + P1, Lprev[:, :-1] + P1], axis=-1)
        dn = jnp.concatenate(
            [Lprev[:, 1:] + P1, Lprev[:, -1:] + P1], axis=-1)
        L = c_x + jnp.minimum(jnp.minimum(Lprev, jnp.minimum(up, dn)),
                              minL + P2) - minL
        return L, L

    c0 = cost_paths[..., 0]
    _, Ls = jax.lax.scan(step, c0, jnp.moveaxis(cost_paths[..., 1:], -1, 0))
    return jnp.concatenate([c0[None], Ls], axis=0).transpose(1, 2, 0)


@functools.partial(jax.jit, static_argnames=("disparity_min",
                                             "disparity_max"))
def _sgm_aggregate(cost, P1, P2, disparity_min, disparity_max):
    """4-path SGM aggregation of a (D, H, W) cost volume."""
    D, H, W = cost.shape
    # left->right and right->left: paths are ROWS; vector plane (H, D)
    lr = jnp.transpose(cost, (1, 0, 2))                      # (H, D, W)
    acc = jnp.transpose(_aggregate_scan(lr, P1, P2), (1, 0, 2))
    rl = lr[..., ::-1]
    acc = acc + jnp.transpose(
        _aggregate_scan(rl, P1, P2)[..., ::-1], (1, 0, 2))
    # top->down and bottom->up: paths are COLUMNS; vector plane (W, D)
    td = jnp.transpose(cost, (2, 0, 1))                      # (W, D, H)
    acc = acc + jnp.transpose(_aggregate_scan(td, P1, P2), (1, 2, 0))
    bu = td[..., ::-1]
    acc = acc + jnp.transpose(
        _aggregate_scan(bu, P1, P2)[..., ::-1], (1, 2, 0))
    return acc


@functools.partial(jax.jit, static_argnames=("disparity_min",
                                             "disparity_max",
                                             "lr_consistency_threshold"))
def _sgm_disparity(im0, im1, disparity_min, disparity_max,
                   P1, P2, lr_consistency_threshold):
    census0 = census_transform(im0)
    census1 = census_transform(im1)
    cost = census_cost_volume(census0, census1,
                              disparity_min, disparity_max)   # (D,H,W)
    agg = _sgm_aggregate(cost, P1, P2, disparity_min, disparity_max)

    D, H, W = agg.shape
    best = jnp.argmin(agg, axis=0)                            # (H, W)
    # parabola subpixel refinement on the aggregated costs
    ib = jnp.clip(best, 1, D - 2)
    y0 = jnp.take_along_axis(agg, (ib - 1)[None], axis=0)[0]
    y1 = jnp.take_along_axis(agg, ib[None], axis=0)[0]
    y2 = jnp.take_along_axis(agg, (ib + 1)[None], axis=0)[0]
    denom = y0 - 2 * y1 + y2
    denom_safe = jnp.where(jnp.abs(denom) > 1e-9, denom, 1.0)
    frac = jnp.where(jnp.abs(denom) > 1e-9,
                     0.5 * (y0 - y2) / denom_safe, 0.0)
    frac = jnp.clip(frac, -0.5, 0.5)
    displ = best + disparity_min + jnp.where(best == ib, frac, 0.0)

    # left-right consistency: build the right image's WTA disparity from
    # the SAME aggregated volume: aggR[d, y, x] = agg[d, y, x + d]
    x = jnp.arange(W)
    d = jnp.arange(D)
    xs = jnp.clip(x[None, None, :] + d[:, None, None] + disparity_min,
                  0, W - 1)
    aggR = jnp.take_along_axis(agg, xs, axis=2)
    bestR = jnp.argmin(aggR, axis=0)                          # (H, W)
    # check |dispL(x) - dispR(x - dispL(x))| <= threshold
    xl = jnp.clip(x[None, :] - (best + disparity_min), 0, W - 1)
    dR_at = jnp.take_along_axis(bestR, xl, axis=1)
    consistent = jnp.abs((best + disparity_min) -
                         (dR_at + disparity_min)) <= lr_consistency_threshold
    valid = consistent & (best > 0) & (best < D - 1)
    return jnp.where(valid, displ, 0.0).astype(jnp.float32)


def stereo_matching_sgm(rectified0, rectified1, *,
                        disparity_min=0, disparity_max=127,
                        P1=6.0, P2=96.0, lr_consistency_threshold=1):
    """Dense disparity map from a rectified stereo pair via census+SGM —
    the TPU-native replacement for mrcal.stereo_matching_libelas
    (reference: stereo-matching-libelas.cc).

    rectified0/1: (H, W) grayscale images (any numeric dtype).
    Returns float32 (H, W) disparity in pixels; invalid/inconsistent
    pixels are 0 (same convention as the reference's invalid output).

    P1/P2: SGM smoothness penalties against the 24-bit census Hamming
    cost (P1 small-slant penalty, P2 discontinuity penalty)."""
    im0 = jnp.asarray(rectified0, jnp.float32)
    im1 = jnp.asarray(rectified1, jnp.float32)
    if im0.ndim == 3:
        im0 = jnp.mean(im0, axis=-1)
    if im1.ndim == 3:
        im1 = jnp.mean(im1, axis=-1)
    return _sgm_disparity(im0, im1, int(disparity_min), int(disparity_max),
                          jnp.float32(P1), jnp.float32(P2),
                          int(lr_consistency_threshold))
