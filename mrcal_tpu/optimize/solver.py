"""Trust-region Levenberg-Marquardt with Schur-complement block elimination.

This replaces the reference's libdogleg + CHOLMOD stack (mrcal.c:6180-6624)
with a TPU-native design:

  - Per-observation dense Jacobian blocks from AD (no global CSR assembly;
    the sparsity lives in the BLOCK structure).
  - Normal equations assembled with batched einsum (MXU) + segment-sums.
  - Frame (6x6) and point (3x3) blocks eliminated with batched Cholesky;
    the reduced camera system (intrinsics+extrinsics+warp) solved densely.
  - Classic lambda-LM trust region control (gain-ratio), same convergence
    thresholds as the reference (update_threshold=1e-7, max 300 iterations,
    mrcal.c:6296-6299).
  - The outlier-rejection outer loop re-runs the same jitted solve with
    updated weights (shapes never change; mrcal.c:3979-4386 semantics).

The observation axis shards over a device mesh: every segment-sum/einsum
here commutes with psum over shards (see mrcal_tpu.parallel.sharded_solve).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .. import _xla
from ..lensmodels import project_core
from ..poseutils import _compose_rt2, _transform_point_rt
from . import layout as _layout
from .layout import ProblemSpec, spec_from_inputs
from .residuals import (arrays_from_inputs, params_from_arrays,
                        board_points_ref, residuals_regularization,
                        residuals_board, residuals_point, residuals_full,
                        pack_params, split_packed_state)

_seg = jax.ops.segment_sum


# ----------------------------------------------------------------------------
# camera-system ("c") layout: [intrinsics-state | extrinsics | warp], packed
# ----------------------------------------------------------------------------

class _CLayout:
    def __init__(self, spec: ProblemSpec):
        self.Nip = spec.Nintrinsics_state_per_cam
        self.Nci = spec.Ncameras_intrinsics
        self.Nce = spec.Ncameras_extrinsics
        self.i0 = 0
        self.e0 = self.Nip * self.Nci
        self.w0 = self.e0 + 6 * self.Nce
        self.Nc = self.w0 + 2  # warp slots always allocated (zero if unused)

    def coli(self, ci):
        return self.i0 + ci * self.Nip

    def cole(self, ce):
        return self.e0 + 6 * ce


def _intr_scales(spec: ProblemSpec):
    """packing scales for the per-camera intrinsics STATE block."""
    s = []
    if spec.Ncore_state:
        s += [_layout.SCALE_INTRINSICS_FOCAL_LENGTH] * 2
        s += [_layout.SCALE_INTRINSICS_CENTER_PIXEL] * 2
    if spec.selections.do_optimize_intrinsics_distortions:
        s += [_layout.SCALE_DISTORTION] * spec.Ndistortions
    return np.asarray(s)


_EXT_SCALES = np.array([_layout.SCALE_ROTATION_CAMERA] * 3 +
                       [_layout.SCALE_TRANSLATION_CAMERA] * 3)
_FRAME_SCALES = np.array([_layout.SCALE_ROTATION_FRAME] * 3 +
                         [_layout.SCALE_TRANSLATION_FRAME] * 3)
_WARP_SCALES = np.array([_layout.SCALE_CALOBJECT_WARP] * 2)
_POINT_SCALES = np.array([_layout.SCALE_POSITION_POINT] * 3)


def _merge_intrinsics(intr_state, intr_fixed, spec):
    """Combine the packed per-camera intrinsics state block with the fixed
    (non-optimized) parts into a full intrinsics vector (real units)."""
    dt = intr_fixed.dtype
    scales = jnp.asarray(_intr_scales(spec), dt)
    full = intr_fixed
    if spec.Nintrinsics_state_per_cam == 0:
        return full
    st = intr_state * scales
    j = 0
    if spec.Ncore_state:
        full = jnp.concatenate([st[..., :4], full[..., 4:]], axis=-1)
        j = 4
    if spec.selections.do_optimize_intrinsics_distortions:
        full = jnp.concatenate([full[..., :spec.Ncore], st[..., j:]], axis=-1)
    return full


# ----------------------------------------------------------------------------
# per-observation residual functions (packed block args -> residual row block)
# ----------------------------------------------------------------------------

def _make_board_fn(spec: ProblemSpec):
    s = spec.selections

    def fn(blocks, obs, intr_fixed, warp_fixed):
        # blocks: dict(intr (Nip,), ext (6,), frame (6,), warp (2,)) packed
        dt = intr_fixed.dtype
        intr = _merge_intrinsics(blocks["intr"], intr_fixed, spec)
        rt_cam = blocks["ext"] * jnp.asarray(_EXT_SCALES, dt)
        rt_frame = blocks["frame"] * jnp.asarray(_FRAME_SCALES, dt)
        if spec.has_calobject_warp:
            warp = blocks["warp"] * jnp.asarray(_WARP_SCALES, dt)
        else:
            warp = warp_fixed
        rt_joint = _compose_rt2(rt_cam, rt_frame)
        pts = board_points_ref(spec, warp, dtype=dt)          # (H,W,3)
        p_cam = _transform_point_rt(rt_joint, pts)
        q = project_core(p_cam, intr, spec.lensmodel)          # (H,W,2)
        w = jnp.maximum(obs[..., 2], 0.0)
        r = (q - obs[..., :2]) * w[..., None]
        return r.reshape(-1)                                   # (2*H*W,)

    return fn


def _make_board_corner_fn(spec: ProblemSpec):
    """Single-CORNER board residual: (blocks, corner grid xy, one observed
    corner) -> (2,).  Same math as _make_board_fn restricted to one grid
    point (board_points_ref for a single (x,y); mrcal.c:2792-2818 warp).

    Why it exists: the per-observation Jacobian needs jacfwd with
    Nip+14 (~26) tangents riding every op of the projection chain — on
    TPU those [Nobs, 26, H, W] intermediates dominate the whole LM
    iteration (round-5 xprof: 62% of device time, in (1,128)-tiled
    elementwise fusions at ~11% lane utilization).  Per-corner jacrev
    needs only TWO cotangents, and the flat corner axis vectorizes on
    the 128-lane VPU."""
    s = spec.selections
    H = spec.calibration_object_height_n
    W = spec.calibration_object_width_n
    sp = spec.calibration_object_spacing

    def fn(blocks, cxy, obs_c, intr_fixed, warp_fixed):
        # blocks: dict(intr (Nip,), ext (6,), frame (6,), warp (2,)) packed
        # cxy: (2,) grid indices (x, y) as floats; obs_c: (3,) x,y,weight
        dt = intr_fixed.dtype
        intr = _merge_intrinsics(blocks["intr"], intr_fixed, spec)
        rt_cam = blocks["ext"] * jnp.asarray(_EXT_SCALES, dt)
        rt_frame = blocks["frame"] * jnp.asarray(_FRAME_SCALES, dt)
        if spec.has_calobject_warp:
            warp = blocks["warp"] * jnp.asarray(_WARP_SCALES, dt)
        else:
            warp = warp_fixed
        rt_joint = _compose_rt2(rt_cam, rt_frame)
        xr = cxy[0] / (W - 1)
        yr = cxy[1] / (H - 1)
        z = (warp[0] * 4.0 * xr * (1.0 - xr) +
             warp[1] * 4.0 * yr * (1.0 - yr))
        pt = jnp.stack([cxy[0] * sp, cxy[1] * sp, z])
        p_cam = _transform_point_rt(rt_joint, pt)
        q = project_core(p_cam, intr, spec.lensmodel)
        w = jnp.maximum(obs_c[2], 0.0)
        return (q - obs_c[:2]) * w                             # (2,)

    return fn


def _use_corner_jacobian(spec: ProblemSpec):
    """Per-corner vjp board Jacobian (2 cotangents) instead of
    per-observation jacfwd (Nip+14 tangents).  Identical values; the
    corner-flat layout is ~3x faster on TPU (round-5 measurements) and
    no slower on CPU.  MRCAL_TPU_BOARD_CORNER_J=0 restores the old
    path."""
    return _os.environ.get("MRCAL_TPU_BOARD_CORNER_J", "1") != "0"


def _make_point_fn(spec: ProblemSpec):
    def fn(blocks, obs, intr_fixed):
        # blocks: dict(intr (Nip,), ext (6,), point (3,)) packed
        dt = intr_fixed.dtype
        intr = _merge_intrinsics(blocks["intr"], intr_fixed, spec)
        rt_cam = blocks["ext"] * jnp.asarray(_EXT_SCALES, dt)
        p_ref = blocks["point"] * jnp.asarray(_POINT_SCALES, dt)
        p_cam = _transform_point_rt(rt_cam, p_ref)
        q = project_core(p_cam, intr, spec.lensmodel)
        w = jnp.where(obs[2] > 0.0, obs[2], 0.0)
        return (q - obs[:2]) * w                               # (2,)

    return fn


# ----------------------------------------------------------------------------
# normal-equation assembly
# ----------------------------------------------------------------------------

def _zero_if(flag, x):
    return x if flag else jnp.zeros_like(x)


def _distinct_pairs(idx_np):
    """Static list of distinct (ici, ice) pairs with observation id lists."""
    pairs = {}
    for i, (ci, ce) in enumerate(idx_np):
        pairs.setdefault((int(ci), int(ce)), []).append(i)
    return [(k, np.asarray(v)) for k, v in sorted(pairs.items())]


def _pair_block(Pa, Pb, Ja, Jb):
    """sum_o Pa[o,a] Pb[o,b] (Ja[o]^T Jb[o]) assembled as ONE dense
    (A*na, B*nb) block: the per-obs (na,nb) outer blocks are contracted
    against the joint (a,b) one-hot — two MXU matmuls — and the caller
    places the result with a single static slice.  Shared by the
    sharded SPMD assembly (ids are shard-local data, so static per-pair
    grouping is unavailable) and, for many-camera rigs, the unsharded
    build: the one-hot contraction measured FASTER than the static
    per-pair slice loop on the v5e once the pair count grows (rig16cam
    local NE 0.98 vs 1.26 ms/iter, round-5 probe).  Out-of-range ids
    (e.g. ice=-1, camera at the reference) one-hot to zero rows and
    drop out exactly."""
    o, A = Pa.shape
    B = Pb.shape[1]
    na, nb = Ja.shape[-1], Jb.shape[-1]
    blk = jnp.einsum("omi,omj->oij", Ja, Jb).reshape(o, na * nb)
    Pab = (Pa[:, :, None] * Pb[:, None, :]).reshape(o, A * B)
    S = Pab.T @ blk                                       # (A*B, na*nb)
    return (S.reshape(A, B, na, nb).transpose(0, 2, 1, 3)
            .reshape(A * na, B * nb))


def _pair_gvec(Pa, Ja, r):
    """sum_o Pa[o,a] (Ja[o]^T r[o]) flattened to (A*na,)."""
    return (Pa.T @ jnp.einsum("omi,om->oi", Ja, r)).reshape(-1)


def _use_pair_onehot(spec: ProblemSpec):
    """One-hot pair-contraction assembly for the UNSHARDED NE build
    (MRCAL_TPU_PAIR_ONEHOT=1 enables; parity vs the per-pair loop is
    pinned to 1e-12 in tests/test_onehot_assembly.py).

    Measured on the v5e (round 5): +19-21% SUSTAINED f32 it/s on the
    multi-camera rigs (4cam 1357 -> 1615, rig16 717 -> 871; identical
    E) — but OFF by default: the f32 rounding differences shift the
    rig16 trajectory enough that its f32 phase small-step-exits at 13
    iterations instead of ~25, handing the 9x-costlier f64 polish a
    worse point (16 -> 64 polish iterations, convergence wall 1.1 ->
    3.5 s, reproducible across seeds; final rms actually 0.0001 BETTER
    — the early-exit old path quits a whisker sooner).  Until the f32
    phase's exit criteria are made robust to that reordering, the
    sustained win is not worth the wall regression.  The SHARDED
    assembly (parallel/sharding.py) always uses the one-hot
    contraction — shard-local ids leave it no static alternative, and
    at mesh>=1 it is strictly faster there."""
    env = _os.environ.get("MRCAL_TPU_PAIR_ONEHOT")
    if env is not None:
        return env != "0"
    return False


def build_normal_equations(spec: ProblemSpec, arrays, static_idx):
    """Returns a jitted-friendly pure function
        f(b) -> (E, g_c, g_f, g_p, Hcc, Hff, Cf, Hpp, Cp, x_board, x_point)
    where b is the packed state; H/C are the block normal-equation pieces in
    packed coordinates.  static_idx carries numpy copies of the index arrays
    (used for static pair grouping at trace time)."""
    if _use_splined_sparse(spec):
        # splined models: sparse spline-window assembly (verified equal to
        # the generic path to machine precision).  The generic path's
        # jacrev of a whole board observation materializes a
        # (Nobs, HW, 2HW, R^2*2) cross-corner intermediate — 8 GB for the
        # canonical 30x18 scene, which OOMs HBM inside the device-resident
        # while_loop.
        return build_normal_equations_splined(spec, arrays, static_idx)

    s = spec.selections
    cl = _CLayout(spec)
    Nf = spec.Nframes
    Npv = spec.Npoints_variable

    board_fn = _make_board_fn(spec)
    point_fn = _make_point_fn(spec)

    idxb_np = static_idx["board"]            # (Nobs,3) numpy
    idxp_np = static_idx["point"]
    pairs_b = _distinct_pairs(idxb_np[:, 1:3]) if len(idxb_np) else []
    pairs_p = _distinct_pairs(idxp_np[:, 1:3]) if len(idxp_np) else []

    use_fwd = (spec.Nintrinsics_state_per_cam + 14) < \
        2 * spec.calibration_object_width_n * spec.calibration_object_height_n
    jacf = jax.jacrev if not use_fwd else jax.jacfwd
    corner_jac = _use_corner_jacobian(spec) and spec.Nobservations_board
    if corner_jac:
        corner_fn = _make_board_corner_fn(spec)
        Hn = spec.calibration_object_height_n
        Wn = spec.calibration_object_width_n
        _xg, _yg = np.meshgrid(np.arange(Wn, dtype=np.float64),
                               np.arange(Hn, dtype=np.float64))
        cxy_np = np.stack([_xg, _yg], axis=-1).reshape(-1, 2)  # (HW,2)

    def f(b, arrays):
        dt = b.dtype
        params = split_packed_state(b, arrays, spec)
        intr_full = params["intrinsics"]                   # (Nci, Nintr) real
        iscales = jnp.asarray(_intr_scales(spec), dt)

        # packed per-camera blocks
        def intr_state_packed(intr_row):
            cols = []
            if spec.Ncore_state:
                cols.append(intr_row[..., :4])
            if s.do_optimize_intrinsics_distortions:
                cols.append(intr_row[..., spec.Ncore:])
            if not cols:
                return jnp.zeros(intr_row.shape[:-1] + (0,), dt)
            return jnp.concatenate(cols, axis=-1) / iscales

        intr_packed = intr_state_packed(intr_full)         # (Nci, Nip)
        ext_packed = params["extrinsics"] / jnp.asarray(_EXT_SCALES, dt)
        ext_pad = jnp.concatenate([jnp.zeros((1, 6), dt), ext_packed], axis=0)
        frames_packed = params["frames"] / jnp.asarray(_FRAME_SCALES, dt)
        warp_packed = params["calobject_warp"] / jnp.asarray(_WARP_SCALES, dt)
        points_packed = params["points"] / jnp.asarray(_POINT_SCALES, dt)

        Nc = cl.Nc
        g_c = jnp.zeros(Nc, dt)
        Hcc = jnp.zeros((Nc, Nc), dt)
        g_f = jnp.zeros((max(Nf, 1), 6), dt)
        Hff = jnp.zeros((max(Nf, 1), 6, 6), dt)
        Cf = jnp.zeros((max(Nf, 1), 6, Nc), dt)
        g_p = jnp.zeros((max(Npv, 1), 3), dt)
        Hpp = jnp.zeros((max(Npv, 1), 3, 3), dt)
        Cp = jnp.zeros((max(Npv, 1), 3, Nc), dt)
        E = jnp.zeros((), dt)
        x_board = jnp.zeros((0,), dt)
        x_point = jnp.zeros((0,), dt)

        # ---------------- board observations ----------------
        if spec.Nobservations_board:
            # indices are problem STRUCTURE: bake them as compile-time
            # constants (static gathers fold much better than dynamic ones)
            idx = jnp.asarray(idxb_np)
            ifr, ici, ice = idx[:, 0], idx[:, 1], idx[:, 2]
            blocks = dict(
                intr=intr_packed[ici],           # (Nobs, Nip)
                ext=ext_pad[ice + 1],            # (Nobs, 6)
                frame=frames_packed[ifr],        # (Nobs, 6)
                warp=jnp.broadcast_to(warp_packed,
                                      (len(idxb_np), 2)),
            )
            obs = arrays["observations_board"]
            ifx = intr_full[ici]

            if corner_jac:
                # residual + Jacobian in ONE vjp per corner: 2 cotangents
                # instead of jacfwd's Nip+14 tangents, and the flat corner
                # axis (instead of the (H,W) grid) tiles the 128-lane VPU
                cxy_all = jnp.asarray(cxy_np, dt)              # (HW,2)

                def obs_rj(blk, ob, ifx1, wf):
                    obs_flat = ob.reshape(-1, 3)               # (HW,3)

                    def per_corner(cxy, oc):
                        rr, pull = jax.vjp(
                            lambda bl: corner_fn(bl, cxy, oc, ifx1, wf),
                            blk)
                        (Jd,) = jax.vmap(pull)(jnp.eye(2, dtype=rr.dtype))
                        return rr, Jd                          # (2,), dict

                    return jax.vmap(per_corner)(cxy_all, obs_flat)

                r2, J2 = jax.vmap(obs_rj, in_axes=(0, 0, 0, None))(
                    blocks, obs, ifx, params["calobject_warp"])
                Nob = len(idxb_np)
                M = r2.shape[1] * 2                            # 2*H*W
                r = r2.reshape(Nob, M)
                J = {k: v.reshape(Nob, M, v.shape[-1])
                     for k, v in J2.items()}
            else:
                r = jax.vmap(board_fn, in_axes=(0, 0, 0, None))(
                    blocks, obs, ifx, params["calobject_warp"])  # (Nobs, M)
                J = jax.vmap(jacf(board_fn), in_axes=(0, 0, 0, None))(
                    blocks, obs, ifx, params["calobject_warp"])
            Ji = _zero_if(spec.Nintrinsics_state_per_cam > 0, J["intr"])
            Je = _zero_if(s.do_optimize_extrinsics, J["ext"])
            Jf = _zero_if(s.do_optimize_frames, J["frame"])
            Jw = _zero_if(spec.has_calobject_warp, J["warp"])
            # camera at reference: no extrinsics gradient
            Je = Je * (ice >= 0)[:, None, None].astype(dt)

            x_board = r.reshape(-1)
            E = E + jnp.sum(r * r)

            # gradients
            gi = jnp.einsum("omi,om->oi", Ji, r)
            ge = jnp.einsum("omi,om->oi", Je, r)
            gf = jnp.einsum("omi,om->oi", Jf, r)
            gw = jnp.einsum("omi,om->i", Jw, r)
            g_c = g_c.at[cl.w0:cl.w0 + 2].add(gw)
            g_f = g_f.at[:Nf].add(_seg(gf, ifr, num_segments=Nf)) \
                if Nf else g_f
            # frame self blocks
            if Nf:
                Hff = Hff.at[:Nf].add(
                    _seg(jnp.einsum("omi,omj->oij", Jf, Jf), ifr,
                         num_segments=Nf))
            # warp self + warp-frame cross
            Hcc = Hcc.at[cl.w0:cl.w0 + 2, cl.w0:cl.w0 + 2].add(
                jnp.einsum("omi,omj->ij", Jw, Jw))
            if Nf:
                Cf = Cf.at[:, :, cl.w0:cl.w0 + 2].add(
                    _seg(jnp.einsum("omi,omj->oij", Jf, Jw), ifr,
                         num_segments=Nf))

            if _use_pair_onehot(spec):
                # many distinct camera blocks: one-hot pair contraction
                # (MXU matmuls + one static placement per block type)
                # instead of the per-pair slice loop below — same math,
                # measured faster on the v5e for multi-camera rigs
                Nob_ = r.shape[0]
                Pi = jax.nn.one_hot(ici, max(cl.Nci, 1), dtype=dt)
                Pe = jax.nn.one_hot(ice, max(cl.Nce, 1), dtype=dt)
                P1 = jnp.ones((Nob_, 1), dt)
                if cl.Nip:
                    g_c = g_c.at[:cl.e0].add(_pair_gvec(Pi, Ji, r))
                    Hcc = Hcc.at[:cl.e0, :cl.e0].add(
                        _pair_block(Pi, Pi, Ji, Ji))
                    Biw = _pair_block(Pi, P1, Ji, Jw)
                    Hcc = Hcc.at[:cl.e0, cl.w0:cl.w0 + 2].add(Biw)
                    Hcc = Hcc.at[cl.w0:cl.w0 + 2, :cl.e0].add(Biw.T)
                    if cl.Nce:
                        Bie = _pair_block(Pi, Pe, Ji, Je)
                        Hcc = Hcc.at[:cl.e0, cl.e0:cl.w0].add(Bie)
                        Hcc = Hcc.at[cl.e0:cl.w0, :cl.e0].add(Bie.T)
                if cl.Nce:
                    g_c = g_c.at[cl.e0:cl.w0].add(_pair_gvec(Pe, Je, r))
                    Hcc = Hcc.at[cl.e0:cl.w0, cl.e0:cl.w0].add(
                        _pair_block(Pe, Pe, Je, Je))
                    Bew = _pair_block(Pe, P1, Je, Jw)
                    Hcc = Hcc.at[cl.e0:cl.w0, cl.w0:cl.w0 + 2].add(Bew)
                    Hcc = Hcc.at[cl.w0:cl.w0 + 2, cl.e0:cl.w0].add(Bew.T)
                if Nf:
                    # cross rows: column block expanded by the camera
                    # one-hot, ONE segment-sum over the frame axis
                    def cf_block(JB, PB):
                        blk = jnp.einsum("omi,omj->oij", Jf, JB)
                        ex = (PB[:, None, :, None] *
                              blk[:, :, None, :]).reshape(Nob_, 6, -1)
                        return _seg(ex, ifr, num_segments=Nf)

                    if cl.Nip:
                        Cf = Cf.at[:, :, :cl.e0].add(cf_block(Ji, Pi))
                    if cl.Nce:
                        Cf = Cf.at[:, :, cl.e0:cl.w0].add(cf_block(Je, Pe))
            else:
                # per distinct (ici,ice) pair: static column placement
                for (ci, ce), oids in pairs_b:
                    oid = jnp.asarray(oids)
                    Ji_p, Je_p, Jf_p, Jw_p = (Ji[oid], Je[oid],
                                              Jf[oid], Jw[oid])
                    i0 = cl.coli(ci)
                    g_c = g_c.at[i0:i0 + cl.Nip].add(
                        jnp.sum(gi[oid], axis=0))
                    Hcc = Hcc.at[i0:i0 + cl.Nip, i0:i0 + cl.Nip].add(
                        jnp.einsum("omi,omj->ij", Ji_p, Ji_p))
                    # intr-warp cross
                    Hiw = jnp.einsum("omi,omj->ij", Ji_p, Jw_p)
                    Hcc = Hcc.at[i0:i0 + cl.Nip, cl.w0:cl.w0 + 2].add(Hiw)
                    Hcc = Hcc.at[cl.w0:cl.w0 + 2, i0:i0 + cl.Nip].add(Hiw.T)
                    if Nf:
                        Cf = Cf.at[:, :, i0:i0 + cl.Nip].add(
                            _seg(jnp.einsum("omi,omj->oij", Jf_p, Ji_p),
                                 ifr[oid], num_segments=Nf))
                    if ce >= 0:
                        e0 = cl.cole(ce)
                        g_c = g_c.at[e0:e0 + 6].add(
                            jnp.sum(ge[oid], axis=0))
                        Hcc = Hcc.at[e0:e0 + 6, e0:e0 + 6].add(
                            jnp.einsum("omi,omj->ij", Je_p, Je_p))
                        Hie = jnp.einsum("omi,omj->ij", Ji_p, Je_p)
                        Hcc = Hcc.at[i0:i0 + cl.Nip, e0:e0 + 6].add(Hie)
                        Hcc = Hcc.at[e0:e0 + 6, i0:i0 + cl.Nip].add(Hie.T)
                        Hew = jnp.einsum("omi,omj->ij", Je_p, Jw_p)
                        Hcc = Hcc.at[e0:e0 + 6, cl.w0:cl.w0 + 2].add(Hew)
                        Hcc = Hcc.at[cl.w0:cl.w0 + 2, e0:e0 + 6].add(Hew.T)
                        if Nf:
                            Cf = Cf.at[:, :, e0:e0 + 6].add(
                                _seg(jnp.einsum("omi,omj->oij",
                                                Jf_p, Je_p),
                                     ifr[oid], num_segments=Nf))

        # ---------------- point observations ----------------
        if spec.Nobservations_point:
            idx = jnp.asarray(idxp_np)
            ipt, ici, ice = idx[:, 0], idx[:, 1], idx[:, 2]
            # variable-point packed positions; fixed points pass real/scale
            blocks = dict(
                intr=intr_packed[ici],
                ext=ext_pad[ice + 1],
                point=points_packed[ipt],
            )
            obs = arrays["observations_point"]
            ifx = intr_full[ici]
            r = jax.vmap(point_fn)(blocks, obs, ifx)           # (Nobs,2)
            J = jax.vmap(jax.jacrev(point_fn))(blocks, obs, ifx)
            Ji = _zero_if(spec.Nintrinsics_state_per_cam > 0, J["intr"])
            Je = _zero_if(s.do_optimize_extrinsics, J["ext"])
            Jp = _zero_if(s.do_optimize_frames and Npv > 0, J["point"])
            Je = Je * (ice >= 0)[:, None, None].astype(dt)
            # fixed points get no gradient
            Jp = Jp * (ipt < Npv)[:, None, None].astype(dt)

            x_point = r.reshape(-1)
            E = E + jnp.sum(r * r)

            gi = jnp.einsum("omi,om->oi", Ji, r)
            ge = jnp.einsum("omi,om->oi", Je, r)
            gp = jnp.einsum("omi,om->oi", Jp, r)
            if Npv:
                ipt_c = jnp.clip(ipt, 0, Npv - 1)
                g_p = g_p.at[:Npv].add(_seg(gp, ipt_c, num_segments=Npv))
                Hpp = Hpp.at[:Npv].add(
                    _seg(jnp.einsum("omi,omj->oij", Jp, Jp), ipt_c,
                         num_segments=Npv))
            if _use_pair_onehot(spec):
                Nop_ = r.shape[0]
                Pi = jax.nn.one_hot(ici, max(cl.Nci, 1), dtype=dt)
                Pe = jax.nn.one_hot(ice, max(cl.Nce, 1), dtype=dt)
                if cl.Nip:
                    g_c = g_c.at[:cl.e0].add(_pair_gvec(Pi, Ji, r))
                    Hcc = Hcc.at[:cl.e0, :cl.e0].add(
                        _pair_block(Pi, Pi, Ji, Ji))
                    if cl.Nce:
                        Bie = _pair_block(Pi, Pe, Ji, Je)
                        Hcc = Hcc.at[:cl.e0, cl.e0:cl.w0].add(Bie)
                        Hcc = Hcc.at[cl.e0:cl.w0, :cl.e0].add(Bie.T)
                if cl.Nce:
                    g_c = g_c.at[cl.e0:cl.w0].add(_pair_gvec(Pe, Je, r))
                    Hcc = Hcc.at[cl.e0:cl.w0, cl.e0:cl.w0].add(
                        _pair_block(Pe, Pe, Je, Je))
                if Npv:
                    ipt_cc = jnp.clip(ipt, 0, Npv - 1)

                    def cp_block(JB, PB):
                        blk = jnp.einsum("omi,omj->oij", Jp, JB)
                        ex = (PB[:, None, :, None] *
                              blk[:, :, None, :]).reshape(Nop_, 3, -1)
                        return _seg(ex, ipt_cc, num_segments=Npv)

                    if cl.Nip:
                        Cp = Cp.at[:, :, :cl.e0].add(cp_block(Ji, Pi))
                    if cl.Nce:
                        Cp = Cp.at[:, :, cl.e0:cl.w0].add(cp_block(Je, Pe))
            else:
                for (ci, ce), oids in pairs_p:
                    oid = jnp.asarray(oids)
                    i0 = cl.coli(ci)
                    g_c = g_c.at[i0:i0 + cl.Nip].add(
                        jnp.sum(gi[oid], axis=0))
                    Hcc = Hcc.at[i0:i0 + cl.Nip, i0:i0 + cl.Nip].add(
                        jnp.einsum("omi,omj->ij", Ji[oid], Ji[oid]))
                    if Npv:
                        Cp = Cp.at[:, :, i0:i0 + cl.Nip].add(
                            _seg(jnp.einsum("omi,omj->oij",
                                            Jp[oid], Ji[oid]),
                                 jnp.clip(ipt[oid], 0, Npv - 1),
                                 num_segments=Npv))
                    if ce >= 0:
                        e0 = cl.cole(ce)
                        g_c = g_c.at[e0:e0 + 6].add(
                            jnp.sum(ge[oid], axis=0))
                        Hcc = Hcc.at[e0:e0 + 6, e0:e0 + 6].add(
                            jnp.einsum("omi,omj->ij", Je[oid], Je[oid]))
                        Hie = jnp.einsum("omi,omj->ij", Ji[oid], Je[oid])
                        Hcc = Hcc.at[i0:i0 + cl.Nip, e0:e0 + 6].add(Hie)
                        Hcc = Hcc.at[e0:e0 + 6, i0:i0 + cl.Nip].add(Hie.T)
                        if Npv:
                            Cp = Cp.at[:, :, e0:e0 + 6].add(
                                _seg(jnp.einsum("omi,omj->oij",
                                                Jp[oid], Je[oid]),
                                     jnp.clip(ipt[oid], 0, Npv - 1),
                                     num_segments=Npv))

        # ---------------- triangulated-point pairs ----------------
        x_tri = jnp.zeros((0,), dt)
        if spec.num_measurements_points_triangulated:
            # per-PAIR vjp (one scalar cotangent) instead of jacfwd over
            # the whole extrinsics vector (6*Nce tangents): each pair
            # touches only its two cameras' rt blocks.  The 42-tangent
            # jacfwd chain (gathers + [Npairs, Nstate, 6] tangent
            # intermediates) was ~40% of the sfm bench iteration.
            from ..poseutils import _rotate_point_r
            from ..triangulation import _triangulated_error
            from .layout import triangulated_pair_indices

            i0_np, i1_np = triangulated_pair_indices(
                spec.triangulated_set_sizes)          # static structure
            i0 = jnp.asarray(np.asarray(i0_np))
            i1 = jnp.asarray(np.asarray(i1_np))
            px = arrays["px_triangulated"].astype(dt)
            wtri = arrays["observations_point_triangulated"][:, 2] \
                .astype(dt)
            ice_tri = arrays["indices_triangulated"][:, 2]
            ie0 = ice_tri[i0] + 1                     # ext_pad row ids
            ie1 = ice_tri[i1] + 1

            def pair_fn(rt0p, rt1p, v0p, v1p):
                # packed rt blocks -> scalar ray-divergence (same math as
                # residuals_triangulated, mrcal.c:5196-5654)
                rt0 = rt0p * jnp.asarray(_EXT_SCALES, dt)
                rt1 = rt1p * jnp.asarray(_EXT_SCALES, dt)
                v0_ref = _rotate_point_r(rt0[:3], v0p, inverted=True)
                t_r0 = -_rotate_point_r(rt0[:3], rt0[3:], inverted=True)
                v0_cam1 = _rotate_point_r(rt1[:3], v0_ref)
                t_10 = _rotate_point_r(rt1[:3], t_r0) + rt1[3:]
                return _triangulated_error(v1p, v0_cam1, t_10)

            def pair_rj(rt0p, rt1p, v0p, v1p):
                err, pull = jax.vjp(pair_fn, rt0p, rt1p, v0p, v1p)
                J0, J1, _, _ = pull(jnp.ones((), err.dtype))
                return err, J0, J1

            rt0_all = ext_pad[ie0]
            rt1_all = ext_pad[ie1]
            err, J0, J1 = jax.vmap(pair_rj)(rt0_all, rt1_all,
                                            px[i0], px[i1])
            valid = (wtri[i0] > 0) & (wtri[i1] > 0)
            # where, not multiply: an outlier pair's err/J may be NaN
            x_tri = jnp.where(valid, err, 0.0)
            J0 = jnp.where(valid[:, None], J0, 0.0)
            J1 = jnp.where(valid[:, None], J1, 0.0)
            E = E + jnp.sum(x_tri * x_tri)
            if s.do_optimize_extrinsics and spec.Ncameras_extrinsics:
                Nce1 = spec.Ncameras_extrinsics + 1
                # dense per-pair J rows via ONE-HOT outer products (MXU
                # matmuls; segment_sum scatter-adds measured 5x slower on
                # the v5e for this shape — same lesson as the splined
                # one-hot assembly)
                O0 = jax.nn.one_hot(ie0, Nce1, dtype=dt)   # (Np,Nce1)
                O1 = jax.nn.one_hot(ie1, Nce1, dtype=dt)
                Jrow = (O0[:, :, None] * J0[:, None, :]
                        + O1[:, :, None] * J1[:, None, :]).reshape(
                    x_tri.shape[0], 6 * Nce1)[:, 6:]       # drop ref cam
                Hcc = Hcc.at[cl.e0:cl.w0, cl.e0:cl.w0].add(Jrow.T @ Jrow)
                g_c = g_c.at[cl.e0:cl.w0].add(Jrow.T @ x_tri)

        # ---------------- regularization ----------------
        x_reg = jnp.zeros((0,), dt)
        if spec.num_measurements_regularization:
            # per-camera reg rows depend on that camera's intrinsics state;
            # plus optionally one unity_cam01 row on extrinsics 0
            def reg_fn_cam(intr_state_1, intr_fixed_1, target_1):
                intr1 = _merge_intrinsics(intr_state_1, intr_fixed_1, spec)
                # distortion+centerpixel terms are per-camera independent
                return _reg_per_camera(intr1, spec, dt, target_1)

            targets = jnp.asarray(
                [[(w - 1) * 0.5, (h - 1) * 0.5] for w, h in spec.imagersizes]
                or np.zeros((spec.Ncameras_intrinsics, 2)), dt)
            rreg = jax.vmap(reg_fn_cam)(intr_packed, intr_full, targets)
            Jreg = jax.vmap(jax.jacrev(reg_fn_cam))(intr_packed, intr_full,
                                                    targets)
            x_reg_cams = rreg  # ordering handled below
            E = E + jnp.sum(rreg * rreg)
            for ci in range(spec.Ncameras_intrinsics):
                i0 = cl.coli(ci)
                if cl.Nip:
                    g_c = g_c.at[i0:i0 + cl.Nip].add(Jreg[ci].T @ rreg[ci])
                    Hcc = Hcc.at[i0:i0 + cl.Nip, i0:i0 + cl.Nip].add(
                        Jreg[ci].T @ Jreg[ci])
            # interleave: reference emits ALL distortion terms for all
            # cameras, then ALL centerpixel terms (mrcal.c:5707-5900)
            ndist_terms = (spec.Ndistortions
                           if (s.do_apply_regularization
                               and s.do_optimize_intrinsics_distortions)
                           else 0)
            x_reg = jnp.concatenate([
                x_reg_cams[:, :ndist_terms].reshape(-1),
                x_reg_cams[:, ndist_terms:].reshape(-1)])

            if (s.do_apply_regularization_unity_cam01
                    and s.do_optimize_extrinsics
                    and spec.Ncameras_extrinsics > 0):
                def unity_fn(ext0_packed):
                    t0 = ext0_packed[3:] * _layout.SCALE_TRANSLATION_CAMERA
                    return (0.1 / 0.01) * (jnp.sum(t0 * t0) - 1.0)
                ru = unity_fn(ext_packed[0])
                Ju = jax.grad(unity_fn)(ext_packed[0])
                E = E + ru * ru
                e0 = cl.cole(0)
                g_c = g_c.at[e0:e0 + 6].add(Ju * ru)
                Hcc = Hcc.at[e0:e0 + 6, e0:e0 + 6].add(jnp.outer(Ju, Ju))
                x_reg = jnp.concatenate([x_reg, ru[None]])

        return dict(E=E, g_c=g_c, g_f=g_f, g_p=g_p, Hcc=Hcc, Hff=Hff,
                    Cf=Cf, Hpp=Hpp, Cp=Cp,
                    x_board=x_board, x_point=x_point, x_tri=x_tri,
                    x_reg=x_reg)

    return f


def _reg_per_camera(intr_row, spec: ProblemSpec, dt, target=None):
    """Single-camera regularization residuals (distortion then centerpixel),
    same math as residuals_regularization."""
    s = spec.selections
    parts = []
    nominal_pixel_error = 0.1
    if s.do_apply_regularization and s.do_optimize_intrinsics_distortions \
            and spec.Ndistortions > 0:
        if spec.is_splined:
            from .residuals import _knot_direction_weights
            scale = nominal_pixel_error / 10.0
            Nx, Ny = spec.lensmodel.Nx, spec.lensmodel.Ny
            du = intr_row[4:].reshape(Ny, Nx, 2)
            ux, uy, extra = _knot_direction_weights(spec, dt)
            err_rad = scale * (du[..., 0] * ux + du[..., 1] * uy)
            err_tan = scale * extra * (du[..., 0] * uy - du[..., 1] * ux)
            parts.append(jnp.stack([err_rad, err_tan], axis=-1).reshape(-1))
        else:
            scale = nominal_pixel_error / 1.0
            sh = np.full(spec.Ndistortions, scale)
            if (spec.lensmodel.family.startswith("LENSMODEL_OPENCV")
                    and spec.Nintrinsics >= 12):
                sh[5:8] = scale * 5.0
            parts.append(intr_row[spec.Ncore:] * jnp.asarray(sh, dt))
    if s.do_apply_regularization and spec.has_core \
            and s.do_optimize_intrinsics_core:
        # NOTE: the reference scales by camera0's width for ALL cameras
        # (mrcal.c:5858 uses ctx->imagersizes[0]) but targets per camera
        W0 = spec.imagersizes[0][0]
        scale = nominal_pixel_error / (W0 * 0.1)
        if target is None:
            w, h = spec.imagersizes[0]
            target = jnp.asarray([(w - 1) * 0.5, (h - 1) * 0.5], dt)
        parts.append(scale * (intr_row[2:4] - target))
    if not parts:
        return jnp.zeros((0,), dt)
    return jnp.concatenate(parts)


# ----------------------------------------------------------------------------
# Schur-reduced damped step
# ----------------------------------------------------------------------------

import os as _os

_USE_PALLAS_CHOLESKY = bool(_os.environ.get("MRCAL_TPU_PALLAS"))


def _block_solve(A, rhs):
    """Batched small-SPD solve: Pallas kernel when MRCAL_TPU_PALLAS=1 on an
    accelerator, otherwise the UNROLLED elementwise Cholesky (factored
    once, solves reuse the factor).  XLA's own batched Cholesky lowers
    tiny blocks to loop-carried scalar code — on the canonical splined
    problem the 6x6 frame elimination measured 3.5 ms/iter via
    jnp.linalg.cholesky+cho_solve vs ~0.3 ms unrolled (round-4 probes).
    Returns (L, solve_fn) where solve_fn solves further RHS with the
    same factor."""
    if _USE_PALLAS_CHOLESKY and jax.default_backend() != "cpu":
        from ..ops.batched_cholesky import batched_cholesky_solve_pallas

        def solve(r):
            return batched_cholesky_solve_pallas(A, r)
        return None, solve
    from ..ops.batched_cholesky import (unrolled_cholesky_factor,
                                        unrolled_cholesky_solve_factored)
    n = A.shape[-1]
    Lf = unrolled_cholesky_factor(A, n)

    def solve(r):
        return unrolled_cholesky_solve_factored(Lf, r, n)
    return None, solve


# lambda is RELATIVE (it multiplies the Marquardt diag scaling), so this
# floor still leaves the step effectively Gauss-Newton — but it suppresses
# the near-gauge-direction step blowup that otherwise forms a lambda limit
# cycle at convergence (accepts at rho~1 shrink lam geometrically until a
# near-null-space step explodes, rejects pump it back: |db| never falls
# under update_threshold and the polish grinds to max_iterations)
_LAM_FLOOR = 1e-11


def _damping_diag(A):
    """Marquardt scaling diagonal for a (batched) SPD block: diag(A)
    clamped below by a relative floor, so barely-observed states (e.g.
    spline knots outside the view) still get positive damping.  Plain
    lam*I damping NaN'd the f32 Cholesky on the canonical splined problem:
    its packed Hcc diagonal spans ~12 orders of magnitude."""
    d = jnp.diagonal(A, axis1=-2, axis2=-1)
    floor = 1e-12 * jnp.max(d) + 1e-30
    return jnp.maximum(d, floor)


def _damped(A, lam, dd):
    n = A.shape[-1]
    return A + (lam * dd)[..., None] * jnp.eye(n, dtype=A.dtype)


def schur_step(ne, lam, spec: ProblemSpec):
    """Solve (JtJ + lam D) delta = -g exactly via block elimination of
    frame and point blocks, D = Marquardt diag(JtJ) scaling.  Returns
    (delta_c, delta_f, delta_p, pred) where pred is the model's predicted
    decrease of E: pred = -g.d + lam d.D.d (derivation: E(b+d) ~ E + 2g.d
    + d.H.d with H d = -g - lam D d).

    The H blocks may carry a LOWER precision than the gradient (the
    splined f64-on-TPU scheme stores H in f32): the factorization and
    solves then run in H's dtype — inexact-Newton with an exact gradient
    still converges to the exact optimum — and delta/pred are returned in
    the gradient's dtype.

    MRCAL_TPU_SCHUR_F64=1 additionally upcasts the whole Schur step of
    f32 solves to f64.  It removes the last few state-dependent
    NaN-rejects the damping floor (below) does not catch (4cam f32: 96
    iterations with ~10 NaN rejects at floor-only vs 112 with zero at
    f64-Schur), but the emulated-f64 step measured 2x+ slower per
    iteration on small parametric bodies (opencv8_1cam sustained 1187
    -> 526 it/s), so it is OFF by default — a NaN trial just rejects
    and pumps lambda, which is cheaper than paying f64 every
    iteration."""
    dt = ne["g_c"].dtype
    if ne["Hcc"].dtype == jnp.float32:
        # f32-ASSEMBLED H: its diag carries ~eps32 relative noise, so
        # H_red + lam*diag(H) goes indefinite (Cholesky -> NaN) once
        # lam < ~2e-7 REGARDLESS of the factorization precision.
        # Saturate the EFFECTIVE damping at a few eps32: the LM
        # control's lam may keep shrinking, but the factorization never
        # enters the noise regime.  This kills the accept/NaN-reject
        # limit cycle (4cam bench config: 160 -> ~100 f32 iterations)
        # and the splined-polish NaN crawl the round-3 notes describe.
        # MRCAL_TPU_F32_LAM_FLOOR overrides (0 disables).
        lam = jnp.maximum(jnp.asarray(lam, dt),
                          float(_os.environ.get("MRCAL_TPU_F32_LAM_FLOOR",
                                                4e-7)))
    upcast = (dt == jnp.float32
              and _os.environ.get("MRCAL_TPU_SCHUR_F64") == "1")
    if upcast:
        f64 = jnp.float64
        ne64 = {k: (v.astype(f64) if k[0] in "gHC" else v)
                for k, v in ne.items()}
        dc, df, dp, pred = schur_step(ne64, jnp.asarray(lam, f64), spec)
        return (dc.astype(dt), df.astype(dt), dp.astype(dt),
                pred.astype(dt))
    hdt = ne["Hcc"].dtype
    lam_h = jnp.asarray(lam, hdt)
    Nf = spec.Nframes
    Npv = spec.Npoints_variable
    dd_c = _damping_diag(ne["Hcc"])
    Hcc = _damped(ne["Hcc"], lam_h, dd_c)
    g_red = ne["g_c"].astype(hdt)
    H_red = Hcc

    if Nf:
        dd_f = _damping_diag(ne["Hff"][:Nf])
        Af = _damped(ne["Hff"][:Nf], lam_h, dd_f)
        Cf = ne["Cf"][:Nf]                                 # (Nf,6,Nc)
        gf = ne["g_f"][:Nf]
        gf_h = gf.astype(hdt)
        _, solve_f = _block_solve(Af, Cf)
        AinvC = solve_f(Cf)
        Ainvg = solve_f(gf_h[..., None])[..., 0]
        H_red = H_red - jnp.einsum("fic,fid->cd", Cf, AinvC)
        g_red = g_red - jnp.einsum("fic,fi->c", Cf, Ainvg)
    if Npv:
        dd_p = _damping_diag(ne["Hpp"][:Npv])
        Ap = _damped(ne["Hpp"][:Npv], lam_h, dd_p)
        Cp = ne["Cp"][:Npv]
        gp = ne["g_p"][:Npv]
        gp_h = gp.astype(hdt)
        _, solve_p = _block_solve(Ap, Cp)
        AinvCp = solve_p(Cp)
        Ainvgp = solve_p(gp_h[..., None])[..., 0]
        H_red = H_red - jnp.einsum("fic,fid->cd", Cp, AinvCp)
        g_red = g_red - jnp.einsum("fic,fi->c", Cp, Ainvgp)

    Lc = jnp.linalg.cholesky(H_red)
    delta_c = -jax.scipy.linalg.cho_solve((Lc, True), g_red)
    delta_c = delta_c.astype(dt)

    pred = -jnp.dot(ne["g_c"], delta_c) \
        + lam * jnp.dot(delta_c, dd_c.astype(dt) * delta_c)
    delta_f = jnp.zeros((max(Nf, 1), 6), dt)
    if Nf:
        rhs = -(gf_h + jnp.einsum("fic,c->fi", Cf,
                                  delta_c.astype(hdt)))
        delta_f = solve_f(rhs[..., None])[..., 0].astype(dt)
        pred = pred - jnp.sum(gf * delta_f) \
            + lam * jnp.sum(delta_f * (dd_f.astype(dt) * delta_f))
    delta_p = jnp.zeros((max(Npv, 1), 3), dt)
    if Npv:
        rhs = -(gp_h + jnp.einsum("fic,c->fi", Cp,
                                  delta_c.astype(hdt)))
        delta_p = solve_p(rhs[..., None])[..., 0].astype(dt)
        pred = pred - jnp.sum(gp * delta_p) \
            + lam * jnp.sum(delta_p * (dd_p.astype(dt) * delta_p))
    return delta_c, delta_f, delta_p, pred


def _delta_to_b(delta_c, delta_f, delta_p, spec: ProblemSpec):
    """Map the block step onto the packed state vector layout."""
    cl = _CLayout(spec)
    parts = []
    if spec.num_states_intrinsics:
        parts.append(delta_c[:cl.e0])
    if spec.num_states_extrinsics:
        parts.append(delta_c[cl.e0:cl.w0])
    if spec.num_states_frames:
        parts.append(delta_f[:spec.Nframes].reshape(-1))
    if spec.num_states_points:
        parts.append(delta_p[:spec.Npoints_variable].reshape(-1))
    if spec.num_states_calobject_warp:
        parts.append(delta_c[cl.w0:cl.w0 + 2])
    if not parts:
        return jnp.zeros((0,))
    return jnp.concatenate(parts)


def _g_to_b(ne, spec: ProblemSpec):
    cl = _CLayout(spec)
    parts = []
    if spec.num_states_intrinsics:
        parts.append(ne["g_c"][:cl.e0])
    if spec.num_states_extrinsics:
        parts.append(ne["g_c"][cl.e0:cl.w0])
    if spec.num_states_frames:
        parts.append(ne["g_f"][:spec.Nframes].reshape(-1))
    if spec.num_states_points:
        parts.append(ne["g_p"][:spec.Npoints_variable].reshape(-1))
    if spec.num_states_calobject_warp:
        parts.append(ne["g_c"][cl.w0:cl.w0 + 2])
    if not parts:
        return jnp.zeros((0,))
    return jnp.concatenate(parts)


# ----------------------------------------------------------------------------
# LM driver
# ----------------------------------------------------------------------------

def _cast_arrays(arrays, dtype):
    """Cast the float arrays of the problem to `dtype` (ints unchanged)."""
    def cast(x):
        return x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x
    return {k: cast(v) for k, v in arrays.items()}


def _effective_threshold(update_threshold, dtype, quiet=False):
    """f32 cannot resolve packed-state updates below ~1e-5 (unit-scale state,
    ~1e-7 eps, damped steps): honoring the reference's 1e-7 threshold would
    spin until max_iterations.  Clamp, and tell the caller unless this is
    the mixed-precision pipeline's internal f32 phase (whose f64 polish
    restores the full 1e-7 convergence; quiet=True there)."""
    if update_threshold == 0.0:
        # explicit 0 = no step-size termination at all (benchmark mode)
        return 0.0
    if dtype == jnp.float32 and update_threshold < 1e-5:
        if not quiet:
            import warnings
            warnings.warn(
                f"f32 solve: raising update_threshold {update_threshold:g}"
                " -> 1e-5 (f32 cannot resolve smaller packed-state steps)."
                " Use mixed_precision=True (f32 phase + f64 polish) for"
                " full-precision convergence.", stacklevel=3)
        return 1e-5
    return update_threshold


def lm_solve(spec: ProblemSpec, arrays, b0,
             max_iterations=300, update_threshold=1e-7, verbose=False,
             dtype=None, quiet=False, lam0=1e-4, ftol=None):
    """Levenberg-Marquardt to convergence.  Host loop over jitted device
    steps.  Returns (b, E, niter, ne_last).

    dtype: run the iteration in this precision (mixed-precision pipelines
    run an f32 phase for speed, then an f64 polish; the packing scales keep
    the problem well-conditioned enough for f32 normal equations)."""
    static_idx = dict(board=np.asarray(arrays["indices_board"]),
                      point=np.asarray(arrays["indices_point"]))
    if dtype is not None:
        arrays = _cast_arrays(arrays, dtype)
        b0 = jnp.asarray(b0, dtype)
    ne_fn = jax.jit(build_normal_equations(spec, arrays, static_idx))
    step_fn = jax.jit(partial(schur_step, spec=spec))

    b = jnp.asarray(b0)
    eff_threshold = _effective_threshold(update_threshold, b.dtype, quiet)
    if ftol is None:
        ftol = 1e-5 if b.dtype == jnp.float32 else 1e-6
    ne = ne_fn(b, arrays)
    E = float(ne["E"])
    lam = lam0
    nu = 2.0
    E_ref, it_ref = E, 0
    niter = 0
    for it in range(max_iterations):
        niter = it + 1
        dc, df, dp, pred_d = step_fn(ne, lam)
        db = _delta_to_b(dc, df, dp, spec)
        b_new = b + db
        ne_new = ne_fn(b_new, arrays)
        E_new = float(ne_new["E"])
        pred = float(pred_d)
        rho = (E - E_new) / pred if pred > 0 else -1.0
        if verbose:
            print(f"iter {it}: E={E:.6e} Enew={E_new:.6e} lam={lam:.2e} "
                  f"rho={rho:.3f} |db|={float(jnp.max(jnp.abs(db))):.2e}")
        # small AND non-worsening (see lm_solve_device's while_loop body)
        step_small = (float(jnp.max(jnp.abs(db))) < eff_threshold
                      and E_new <= E and np.isfinite(E_new)) \
            if db.size else True
        if E_new < E and np.isfinite(E_new):
            b, ne, E = b_new, ne_new, E_new
            lam = lam * max(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3) \
                if rho > 0 else lam / 2.0
            lam = max(lam, _LAM_FLOOR)
            nu = 2.0
        else:
            lam *= nu
            nu *= 2.0
        # converged when the PROPOSED step is small (accepted or not), a
        # 16-iteration window passes with total relative improvement below
        # 16*ftol (precision floor), or the trust region has collapsed
        plateaued = False
        if niter - it_ref >= 16:
            plateaued = (E_ref - E) <= ftol * 16.0 * E
            E_ref, it_ref = E, niter
        if step_small or plateaued or lam > 1e12:
            break
    return b, E, niter, ne


def _mark_outliers(spec: ProblemSpec, obs_board_np, x_board,
                   obs_tri_np=None, x_tri=None, px_tri=None, idx_tri=None,
                   extrinsics=None, verbose=False):
    """Reference markOutliers semantics (mrcal.c:3979-4386): estimate the
    residual variance from current inliers (board AND triangulated
    measurements pooled, mrcal.c:4259); if any inlier component exceeds
    5 sigma, flip the weight sign of every component above 4 sigma.

    Triangulated-point handling (mrcal.c:4131-4260, 4358-4386):
      - pairs whose leecivera-mid2 triangulation is DIVERGENT under the
        current extrinsics are outliers unconditionally (both observations
        of the pair are marked; mrcal.c:4222-4230);
      - the per-pair scalar ray-divergence residuals participate in the
        same k0/k1 sigma thresholds as the board residuals.

    Mutates obs_board_np (weight sign = outlier bit, column 2) and
    obs_tri_np likewise.  Returns (found_new, Noutliers_board,
    Noutliers_triangulated)."""
    k0, k1 = 4.0, 5.0
    found = False
    var_sum = 0.0
    denom = 0

    have_board = obs_board_np is not None and obs_board_np.size
    if have_board:
        W = spec.calibration_object_width_n
        H = spec.calibration_object_height_n
        w = obs_board_np[..., 2]                    # (Nobs,H,W)
        r = np.asarray(x_board).reshape(-1, H, W, 2)
        inlier_b = w > 0.0
        Nout_b = int(np.sum(~inlier_b))
        var_sum += float(np.sum(r[inlier_b] ** 2))
        denom += 2 * int(np.sum(inlier_b))
    else:
        Nout_b = 0

    Nout_t = 0
    have_tri = obs_tri_np is not None and len(obs_tri_np)
    if have_tri:
        from .layout import triangulated_pair_indices
        from ..poseutils import _rotate_point_r
        from ..triangulation import _leecivera_mid2
        i0, i1 = (np.asarray(a) for a in
                  triangulated_pair_indices(spec.triangulated_set_sizes))
        # divergent triangulations are DEFINITELY outliers (mrcal.c:4171)
        ext = np.asarray(extrinsics, np.float64).reshape(-1, 6)
        ext_pad = np.vstack([np.zeros((1, 6)), ext])
        ice = np.asarray(idx_tri)[:, 2]
        px = np.asarray(px_tri, np.float64)
        rt0 = ext_pad[ice[i0] + 1]
        rt1 = ext_pad[ice[i1] + 1]
        v0_ref = np.asarray(_rotate_point_r(rt0[:, :3], px[i0],
                                            inverted=True))
        t_r0 = -np.asarray(_rotate_point_r(rt0[:, :3], rt0[:, 3:],
                                           inverted=True))
        v0_cam1 = np.asarray(_rotate_point_r(rt1[:, :3], v0_ref))
        t_10 = np.asarray(_rotate_point_r(rt1[:, :3], t_r0)) + rt1[:, 3:]
        m = np.asarray(_leecivera_mid2(px[i1], v0_cam1, t_10))
        divergent = np.all(m == 0.0, axis=-1)

        w_t = obs_tri_np[:, 2]
        pair_inlier = (w_t[i0] > 0) & (w_t[i1] > 0)
        new_div = divergent & pair_inlier
        if np.any(new_div):
            bad_obs = np.zeros(len(w_t), bool)
            bad_obs[i0[new_div]] = True
            bad_obs[i1[new_div]] = True
            flip = bad_obs & (w_t > 0)
            obs_tri_np[flip, 2] *= -1.0
            found = True
            if verbose:
                print(f"marked {int(np.sum(new_div))} divergent "
                      "triangulated pairs as outliers")
        w_t = obs_tri_np[:, 2]
        pair_inlier = (w_t[i0] > 0) & (w_t[i1] > 0)
        Nout_t = int(np.sum(~pair_inlier))
        xt = np.asarray(x_tri).reshape(-1)
        var_sum += float(np.sum(xt[pair_inlier] ** 2))
        denom += int(np.sum(pair_inlier))

    if denom == 0:
        return found, Nout_b, Nout_t
    var = var_sum / denom

    # any inlier measurement past the k1 trigger? (skipped if divergence
    # already forces a re-solve, mrcal.c:4268 loop conditions)
    trigger = found
    if not trigger and have_board:
        trigger = bool(np.any((r ** 2 > (k1 * k1) * var)
                              & inlier_b[..., None]))
    if not trigger and have_tri:
        trigger = bool(np.any(pair_inlier & (xt ** 2 > (k1 * k1) * var)))
    if not trigger:
        return False, Nout_b, Nout_t

    # cull everything past k0 (margin to make the re-solve the last one)
    if have_board:
        mark = np.any(r ** 2 > (k0 * k0) * var, axis=-1) & inlier_b
        obs_board_np[..., 2][mark] *= -1.0
        Nout_b += int(np.sum(mark))
        if verbose and np.any(mark):
            print(f"marked {int(np.sum(mark))} new board outliers "
                  f"(total {Nout_b})")
    if have_tri:
        bad_pair = pair_inlier & (xt ** 2 > (k0 * k0) * var)
        if np.any(bad_pair):
            w_t = obs_tri_np[:, 2]
            bad_obs = np.zeros(len(w_t), bool)
            bad_obs[i0[bad_pair]] = True
            bad_obs[i1[bad_pair]] = True
            flip = bad_obs & (w_t > 0)
            obs_tri_np[flip, 2] *= -1.0
            if verbose:
                print(f"marked {int(np.sum(bad_pair))} new triangulated "
                      "pair outliers")
        w_t = obs_tri_np[:, 2]
        Nout_t = int(np.sum(~((w_t[i0] > 0) & (w_t[i1] > 0))))
    return True, Nout_b, Nout_t


def _fd_column_errors(spec, arrays, b, cols, step=1e-5, J=None):
    """AD-Jacobian column vs central finite difference, per state column.
    The SHARED comparator behind optimize(check_gradient=True) and
    tests/test_gradients.py.  J: an optional precomputed sparse Jacobian
    (any scipy format); built from the CSR assembly if omitted.  Yields
    (j, err, scale) — err = max |J_ad - J_fd| in column j, scale the
    1+max|J_fd| normalizer.  Columns come from the CSC as O(nnz_col)
    slices; the dense matrix is never formed (the canonical splined J is
    34k x 1.6k)."""
    from .residuals import _sparse_jacobian, residuals_from_packed
    b = np.asarray(b)
    if J is None:
        J = _sparse_jacobian(jnp.asarray(b), arrays, spec)
    J = J.tocsc()

    def resid(bb):
        return np.asarray(residuals_from_packed(jnp.asarray(bb), arrays,
                                                spec))

    for j in cols:
        bp = b.copy()
        bp[j] += step
        bm = b.copy()
        bm[j] -= step
        dnum = (resid(bp) - resid(bm)) / (2 * step)
        Jcol = J[:, [int(j)]].toarray().ravel()
        err = float(np.max(np.abs(dnum - Jcol)))
        scale = 1.0 + float(np.max(np.abs(dnum)))
        yield int(j), err, scale


def _check_gradient_report(spec, arrays, b, ncols_max=250, step=1e-5,
                           verbose=False):
    """optimize(check_gradient=True) body: AD-block Jacobian vs central
    finite differences per state column (reference mrcal.c:6601
    dogleg_testGradient loop).  Returns a stats dict with the worst
    per-column error."""
    cols = np.arange(spec.Nstate)
    if spec.Nstate > ncols_max:
        cols = np.random.default_rng(0).permutation(
            spec.Nstate)[:ncols_max]
    worst = 0.0
    worst_col = -1
    for j, err, scale in _fd_column_errors(spec, arrays, b, cols,
                                           step=step):
        if verbose:
            print(f"check_gradient: ivar {j}: max |J_ad - J_num| = "
                  f"{err:.3e} (relative {err / scale:.3e})")
        if err / scale > worst:
            worst, worst_col = err / scale, j
    return dict(check_gradient=True,
                ncols_checked=len(cols),
                worst_relative_error=worst,
                worst_ivar=worst_col)


def _fetch_solution_np(spec: ProblemSpec, b, ne, E):
    """ONE fused device->host readback of everything optimize() needs on
    the host: packed state, residual vectors, E.  Each separate
    np.asarray(<device array>) costs a full round-trip over the device
    tunnel (~25 ms); a warm production solve used to spend ~0.35 s in
    10-12 of them — more than the entire device LM loop."""
    # transfer in the SOLVE dtype (an f32 phase's residuals carry no f64
    # information; halving the payload matters on a ~5 GB/s-effective
    # tunnel), convert on host
    dt = jnp.asarray(b).dtype
    pieces = [jnp.asarray(b, dt).ravel(),
              jnp.asarray(ne["x_board"], dt).ravel(),
              jnp.asarray(ne["x_point"], dt).ravel(),
              jnp.asarray(ne["x_tri"], dt).ravel(),
              jnp.asarray(ne["x_reg"], dt).ravel(),
              jnp.asarray(E, dt).reshape(1)]
    sizes = [int(p.shape[0]) for p in pieces]
    flat = np.asarray(jnp.concatenate(pieces), np.float64)
    out = {}
    off = 0
    for name, n in zip(("b", "x_board", "x_point", "x_tri", "x_reg", "E"),
                       sizes):
        out[name] = flat[off:off + n]
        off += n
    out["E"] = float(out["E"][0])
    return out


def _unpack_state_np(b_np, spec: ProblemSpec):
    """Host-side (numpy) unpack of the packed state into the OPTIMIZED
    parameter blocks (same slicing as split_packed_state, without the
    non-optimized fill-ins — the caller's arrays already hold those)."""
    s = spec.selections
    bu = np.asarray(b_np, np.float64) * np.asarray(spec.scales(),
                                                   np.float64)
    out = {}
    i = 0
    n = spec.num_states_intrinsics
    if n:
        out["intrinsics_state"] = bu[i:i + n].reshape(
            spec.Ncameras_intrinsics, spec.Nintrinsics_state_per_cam)
        i += n
    n = spec.num_states_extrinsics
    if n:
        out["extrinsics"] = bu[i:i + n].reshape(-1, 6)
        i += n
    n = spec.num_states_frames
    if n:
        out["frames"] = bu[i:i + n].reshape(-1, 6)
        i += n
    n = spec.num_states_points
    if n:
        out["points"] = bu[i:i + n].reshape(-1, 3)
        i += n
    if spec.num_states_calobject_warp:
        out["calobject_warp"] = bu[i:i + 2]
        i += 2
    assert i == spec.Nstate
    return out


def optimize(**kw):
    """Full solve: mrcal.optimize equivalent (mrcal.c:6180 mrcal_optimize).

    Mutates the input numpy arrays (intrinsics, extrinsics_rt_fromref,
    frames_rt_toref, points, calobject_warp, and observation weights for
    outlier marking) like the reference does, and returns a stats dict.

    The production solve is DEVICE-RESIDENT: the entire trust-region LM
    loop runs as one lax.while_loop (lm_solve_device) — zero host
    round-trips per iteration.  On accelerator backends mixed_precision
    defaults on (f32 device phase + short f64 polish; f64 is ~9x slower
    software emulation on TPU v5e and tests/test_mixed_precision.py shows
    <1e-6 px parity with pure f64).  On CPU it defaults off.  Both are
    overridable: optimize(..., mixed_precision=..., device_loop=...)."""
    from .. import profiling
    _timer = profiling._SolveTimer()
    kw = _layout.normalize_inputs(kw)
    verbose = bool(kw.get("verbose", False))
    # iteration controls: the reference hardcodes these (mrcal.c:6296-6299);
    # we accept overrides (benchmarks force long solves with threshold=0)
    max_iterations = int(kw.get("max_iterations", 300))
    update_threshold = float(kw.get("update_threshold", 1e-7))
    spec = spec_from_inputs(**kw)

    # mutable numpy views of the caller's arrays
    np_obs_board = np.asarray(kw["observations_board"]) \
        if kw.get("observations_board") is not None else None
    np_obs_tri = np.asarray(kw["observations_point_triangulated"]) \
        if kw.get("observations_point_triangulated") is not None else None
    if np_obs_tri is not None and not len(np_obs_tri):
        np_obs_tri = None

    with _timer.phase("pack"):
        arrays = arrays_from_inputs(**kw)
        params = params_from_arrays(arrays)
        b = pack_params(params, spec)

    # host copies of the (static) index arrays, so the device solver never
    # has to read them back over the tunnel
    def _idx_np(name):
        a = kw.get(name)
        return (np.zeros((0, 3), np.int32) if a is None
                else np.asarray(a, np.int32).reshape(-1, 3))
    static_idx_np = dict(
        board=_idx_np("indices_frame_camintrinsics_camextrinsics"),
        point=_idx_np("indices_point_camintrinsics_camextrinsics"))

    if kw.get("check_gradient"):
        # reference semantics (mrcal.c:6601-6605): verify the Jacobian
        # column-by-column against finite differences and RETURN without
        # solving.  Here: the sparse AD-block Jacobian vs central
        # differences of the residual function, on every state column
        # (or a random subset for large problems).
        return _check_gradient_report(spec, arrays, b, verbose=verbose)

    # precision: 'mixed' (f32 device phase + f64 polish; accelerator
    # default), 'f64' (CPU default), or 'f32' (single-precision only — for
    # benchmarks and uncertainty-tolerant bulk solves).  The legacy
    # mixed_precision=True/False flag maps to 'mixed'/'f64'.
    precision = kw.get("precision")
    if precision is None:
        mp = kw.get("mixed_precision")
        if mp is not None:
            precision = "mixed" if mp else "f64"
        else:
            precision = ("mixed" if jax.default_backend() != "cpu"
                         else "f64")
    if precision not in ("mixed", "f32", "f64"):
        raise ValueError(f"unknown precision={precision!r}")
    ftol = kw.get("ftol")
    # verbose needs per-iteration host prints -> host loop
    device_loop = bool(kw.get("device_loop", True)) and not verbose

    # multi-chip: optimize(..., mesh=<jax.sharding.Mesh | int | "auto">)
    # shards the observation axis over the mesh and runs the SAME
    # device-resident while_loop with a psum'd normal-equation evaluation
    # (parallel/sharding.py sharded_lm_solve_device).  Splined models
    # shard through the same MXU spline-window assembly as the single-chip
    # path (each device assembles rows for its observation shard and the
    # blocks are psum'd), so the canonical 30x18 splined scene runs on a
    # mesh too.
    mesh = kw.get("mesh")
    if mesh is not None:
        from ..parallel.sharding import make_mesh
        if isinstance(mesh, str):                  # "auto"
            mesh = make_mesh()
        elif isinstance(mesh, int):
            mesh = make_mesh(mesh)

    def solve(b, **solve_kw):
        solve_kw.setdefault("max_iterations", max_iterations)
        solve_kw.setdefault("update_threshold", update_threshold)
        if ftol is not None:
            solve_kw.setdefault("ftol", ftol)
        # MRCAL_TPU_PROFILE=<logdir> dumps an XLA device trace per solve
        with profiling.trace():
            if mesh is not None:
                from ..parallel.sharding import sharded_lm_solve_device
                return sharded_lm_solve_device(spec, arrays, b, mesh,
                                               **solve_kw)
            if device_loop:
                return lm_solve_device(spec, arrays, b, defer_host=True,
                                       static_idx=static_idx_np,
                                       **solve_kw)
            return lm_solve(spec, arrays, b, verbose=verbose, **solve_kw)

    total_niter = 0
    niter_polish = 0
    Noutliers = 0
    Noutliers_tri = 0
    while True:
        if precision == "f32":
            with _timer.phase("solve_f32"):
                b32, E, niter, ne = solve(b, dtype=jnp.float32, quiet=True)
            b = b32     # stays f32: re-solves cast anyway, and the fused
            #             readback below ships half the bytes
        elif precision == "mixed":
            # fast f32 phase to (approximate) convergence, f64 polish after.
            # The polish is also device-resident when device_loop is on: a
            # handful of f64 while_loop iterations from a near-converged
            # start (the f64 graph compiles once and lands in the
            # persistent .jax_cache).  lam0 stays at the default 1e-4:
            # packed-state Hessian diagonals are huge, so this is
            # effectively undamped Gauss-Newton already, and a TINY lam0
            # invites a reject-cascade (nu-compounding shoots lambda
            # through the useful range in ~12 iterations) whenever the f32
            # point isn't squarely in the quadratic basin.
            f32_kw = {}
            if kw.get("ftol_f32") is not None:
                # early-handoff knob: a LOOSER plateau ftol for the f32
                # phase only — quit the f32 crawl earlier and let the
                # f64 polish finish (see bench_valley_4cam.py for the
                # measured trade on the 4-camera joint problem)
                f32_kw["ftol"] = float(kw["ftol_f32"])
            with _timer.phase("solve_f32"):
                b32, _, niter32, _ = solve(b, dtype=jnp.float32,
                                           quiet=True, **f32_kw)
            b = jnp.asarray(b32, jnp.float64)
            with _timer.phase("solve_polish_f64"):
                b, E, niter, ne = solve(b, max_iterations=300,
                                        update_threshold=update_threshold)
            niter_polish += niter
            niter += niter32
        else:
            with _timer.phase("solve_f64"):
                b, E, niter, ne = solve(b)
        total_niter += niter
        # ONE fused device->host readback per solve pass (b, residual
        # vectors, E): the outlier check and the final writeback/stats all
        # work from this host copy — no further device syncs
        with _timer.phase("fetch"):
            sol = _fetch_solution_np(spec, b, ne, E)
        blocks_np = _unpack_state_np(sol["b"], spec)
        if not (spec.selections.do_apply_outlier_rejection
                and (spec.Nobservations_board or np_obs_tri is not None)):
            break
        ext_now = blocks_np.get("extrinsics") \
            if np_obs_tri is not None else None
        with _timer.phase("outlier_rejection"):
            found, Noutliers, Noutliers_tri = _mark_outliers(
                spec, np_obs_board, sol["x_board"],
                obs_tri_np=np_obs_tri, x_tri=sol["x_tri"],
                px_tri=arrays.get("px_triangulated"),
                idx_tri=(np.asarray(arrays["indices_triangulated"])
                         if np_obs_tri is not None else None),
                extrinsics=ext_now, verbose=verbose)
        if not found:
            break
        if np_obs_board is not None:
            arrays["observations_board"] = jnp.asarray(
                np_obs_board, dtype=arrays["observations_board"].dtype)
        if np_obs_tri is not None:
            arrays["observations_point_triangulated"] = jnp.asarray(
                np_obs_tri,
                dtype=arrays["observations_point_triangulated"].dtype)

    # write back the solution (host copies from the fused readback; only
    # the OPTIMIZED slices — the rest of the caller's arrays never moved)
    if "intrinsics_state" in blocks_np and kw.get("intrinsics") is not None:
        intr_np = np.asarray(kw["intrinsics"])
        blk = blocks_np["intrinsics_state"]
        j = 0
        if spec.Ncore_state:
            intr_np[:, :4] = blk[:, :4]
            j = 4
        if spec.selections.do_optimize_intrinsics_distortions:
            intr_np[:, spec.Ncore:] = blk[:, j:]
    for name, key in (("extrinsics_rt_fromref", "extrinsics"),
                      ("frames_rt_toref", "frames")):
        a = kw.get(name)
        if key in blocks_np and a is not None and np.asarray(a).size:
            np.copyto(np.asarray(a), blocks_np[key])
    if "points" in blocks_np and kw.get("points") is not None \
            and np.asarray(kw["points"]).size:
        np.asarray(kw["points"])[:spec.Npoints_variable] = \
            blocks_np["points"]
    if "calobject_warp" in blocks_np \
            and kw.get("calobject_warp") is not None:
        np.copyto(np.asarray(kw["calobject_warp"]),
                  blocks_np["calobject_warp"])

    x = np.concatenate([sol["x_board"], sol["x_point"],
                        sol["x_tri"], sol["x_reg"]])
    stats = dict(
        rms_reproj_error__pixels=float(
            np.sqrt(sol["E"] / max(spec.Nmeasurements, 1))),
        Noutliers=Noutliers,
        Noutliers_board=Noutliers,
        Noutliers_triangulated_point=Noutliers_tri,
        niterations=total_niter,
        niterations_polish=niter_polish,
        time_s={k: round(v, 6) for k, v in _timer.t.items()},
        b_packed=sol["b"],
        x=x,
    )
    return stats


# ----------------------------------------------------------------------------
# fully device-resident LM (lax.while_loop: zero host round-trips)
# ----------------------------------------------------------------------------

_DEVICE_SOLVER_CACHE = {}


_LAZY_H_GRAD_KEYS = ("E", "g_c", "g_f", "g_p",
                     "x_board", "x_point", "x_tri", "x_reg")


def _make_grad_fn(spec: ProblemSpec):
    """E/gradient/residuals in ONE reverse pass: g = J^T x via
    value_and_grad of 0.5||x(b)||^2 through the full residual function,
    split into the solver's block layout.  Used as the lazy-Hessian
    gradient branch for PARAMETRIC models, where the backward pass has
    no gather/scatter pathology — for splined models the coeff-gather
    backward is a scatter-add and measured 4x slower than the one-hot
    rows path, so they use the DCE-based branch instead."""
    from .residuals import residuals_from_packed
    cl = _CLayout(spec)
    Nf = spec.Nframes
    Npv = spec.Npoints_variable
    nb = spec.num_measurements_boards
    npt = spec.num_measurements_points
    nt = spec.num_measurements_points_triangulated

    def fn(b, arrays):
        def half_sq(bb):
            x = residuals_from_packed(bb, arrays, spec)
            return 0.5 * jnp.sum(x * x), x

        (E2, x), gb = jax.value_and_grad(half_sq, has_aux=True)(b)
        dt = b.dtype
        g_c = jnp.zeros(cl.Nc, dt)
        i = 0
        if spec.num_states_intrinsics:
            g_c = g_c.at[:cl.e0].set(gb[i:i + cl.e0])
            i += cl.e0
        if spec.num_states_extrinsics:
            g_c = g_c.at[cl.e0:cl.w0].set(gb[i:i + cl.w0 - cl.e0])
            i += cl.w0 - cl.e0
        g_f = jnp.zeros((max(Nf, 1), 6), dt)
        if spec.num_states_frames:
            g_f = g_f.at[:Nf].set(gb[i:i + 6 * Nf].reshape(Nf, 6))
            i += 6 * Nf
        g_p = jnp.zeros((max(Npv, 1), 3), dt)
        if spec.num_states_points:
            g_p = g_p.at[:Npv].set(gb[i:i + 3 * Npv].reshape(Npv, 3))
            i += 3 * Npv
        if spec.num_states_calobject_warp:
            g_c = g_c.at[cl.w0:cl.w0 + 2].set(gb[i:i + 2])
        return dict(E=2.0 * E2, g_c=g_c, g_f=g_f, g_p=g_p,
                    x_board=x[:nb], x_point=x[nb:nb + npt],
                    x_tri=x[nb + npt:nb + npt + nt],
                    x_reg=x[nb + npt + nt:])

    return fn


def _make_device_lm(spec: ProblemSpec, ne_fn, lazy_K=0, grad_fn=None):
    """The full trust-region LM loop as ONE jitted computation around an
    arbitrary normal-equations function ne_fn(b, arrays) -> ne dict.  The
    single-chip solver passes the generic/splined assembly; the sharded
    solver passes a shard_map'd psum-reduced assembly (the while_loop body
    is IDENTICAL — collectives ride inside ne_fn).

    lazy_K > 0 enables LAZY-HESSIAN mode: the H blocks (Hcc/Hff/Cf/...)
    refresh only every K-th ACCEPTED step, while E/gradient/residuals are
    exact every iteration (inexact Newton with a stale quadratic model —
    the gain-ratio control absorbs the model error, and XLA's dead-code
    elimination makes the gradient-only branch skip the H assembly
    automatically).  Used for the splined f32 phase, where the H
    assembly is most of the iteration.

    Returns a callable solve(b0, arrays, max_iterations, update_threshold,
    lam0, ftol) -> (b, ne, niter), which ALSO exposes solve.start /
    solve.run for segmented execution: run(state, ...) continues the loop
    from a carried LM state, so the host can split a long solve into
    bounded-duration device dispatches (the axon TPU worker kills
    executions that run too long in one dispatch — see
    _run_device_lm_chunked)."""

    @jax.jit
    def start(b0, arrays, lam0):
        ne0 = ne_fn(b0, arrays)
        dt = b0.dtype
        return (b0, ne0, jnp.asarray(lam0, dt), jnp.asarray(2.0, dt),
                jnp.asarray(0, jnp.int32), ne0["E"],
                jnp.asarray(0, jnp.int32), jnp.asarray(False),
                jnp.asarray(0, jnp.int32))

    @jax.jit
    def run(state0, arrays, max_iterations, update_threshold, ftol):
        def cond(state):
            return (~state[7]) & (state[4] < max_iterations)

        def body(state):
            # carried `ne` = normal equations AT b: one NE eval/iteration
            # (H blocks possibly STALE in lazy mode; age counts accepted
            # steps since the last H refresh)
            b, ne, lam, nu, it, E_ref, it_ref, done, age = state
            dc, df, dp, pred = schur_step(ne, lam, spec)
            db = _delta_to_b(dc, df, dp, spec)
            b_try = b + db
            if lazy_K:
                def eval_full(b_):
                    return ne_fn(b_, arrays)

                def eval_grad(b_):
                    # grad_fn: one reverse pass (parametric); otherwise
                    # the ne_fn subset — XLA DCEs the H assembly
                    new = (grad_fn(b_, arrays) if grad_fn is not None
                           else ne_fn(b_, arrays))
                    out = dict(ne)           # stale H blocks
                    out.update({k: new[k] for k in _LAZY_H_GRAD_KEYS})
                    return out

                # age counts accepted steps since the last refresh: up
                # to K accepted steps ride the stale H, the (K+1)-th
                # trial is evaluated in full.  (Tightening this to
                # K-1 — refresh one step earlier — was tried and
                # measured WORSE on the canonical splined convergence,
                # 62 -> 80 iterations / 2.4 -> 3.9 s: the refresh
                # phase shift interacts with the plateau window.)
                refresh = age >= lazy_K
                ne_try = jax.lax.cond(refresh, eval_full, eval_grad,
                                      b_try)
            else:
                ne_try = ne_fn(b_try, arrays)
            E = ne["E"]
            E_try = ne_try["E"]
            rho = jnp.where(pred > 0, (E - E_try) / pred, -1.0)
            accept = (E_try < E) & jnp.isfinite(E_try)
            # converged when the proposed step is below the threshold AND
            # non-worsening.  (With Marquardt lam*diag damping, a REJECT
            # cascade's huge lam shrinks the proposed step below the
            # threshold while far from the optimum — the old accept-or-not
            # test fired there.  An equal-E tiny step still terminates:
            # at the exact optimum E_try == E and accept is False.)
            small = (jnp.max(jnp.abs(db)) < update_threshold) & \
                (E_try <= E) & jnp.isfinite(E_try)

            b = jnp.where(accept, b_try, b)
            ne = jax.tree.map(lambda new, old: jnp.where(accept, new, old),
                              ne_try, ne)
            lam_up = lam * nu
            lam_down = jnp.maximum(
                lam * jnp.maximum(1.0 / 3.0,
                                  1.0 - (2.0 * rho - 1.0) ** 3), _LAM_FLOOR)
            lam = jnp.where(accept,
                            jnp.where(rho > 0, lam_down, lam / 2.0), lam_up)
            nu = jnp.where(accept, 2.0, nu * 2.0)
            lam = jnp.minimum(lam, 1e20)    # benchmark mode: no overflow
            # ftol over a WINDOW: if 16 iterations pass with total relative
            # E improvement below 16*ftol, we are grinding at the dtype's
            # precision floor.  (Per-step or short-streak tests fire on
            # transient LM stalls and quit at the wrong optimum.)
            E_now = jnp.where(accept, E_try, E)
            window = (it + 1 - it_ref) >= 16
            plateaued = window & ((E_ref - E_now) <= ftol * 16.0 * E_now)
            E_ref = jnp.where(window, E_now, E_ref)
            it_ref = jnp.where(window, it + 1, it_ref)
            # benchmark mode (both thresholds exactly 0): run the full
            # max_iterations — no plateau or trust-region-collapse exits
            benchmark = (update_threshold <= 0.0) & (ftol <= 0.0)
            done = small | ((plateaued | (lam > 1e12)) & ~benchmark)
            if lazy_K:
                # schedule-only refresh.  A refresh-on-trouble variant
                # (force fresh H after rejects / rho far from 1) was
                # tried and measured WORSE everywhere (splined conv
                # 2.38 -> 3.86 s, sustained 201 -> 169 it/s; 4cam
                # sustained 1385 -> 626): the benchmark/plateau regimes
                # reject often enough that it degenerates to eager H.
                age = jnp.where(accept,
                                jnp.where(refresh, 0, age + 1), age)
            return (b, ne, lam, nu, it + 1, E_ref, it_ref, done, age)

        return jax.lax.while_loop(cond, body, state0)

    def solve(b0, arrays, max_iterations, update_threshold, lam0, ftol):
        state = start(b0, arrays, lam0)
        state = run(state, arrays, max_iterations, update_threshold, ftol)
        return state[0], state[1], state[4]

    solve.start = start
    solve.run = run
    return solve


def _run_device_lm_chunked(solve, b0, arrays, max_iterations,
                           update_threshold, lam0, ftol, chunk0=64,
                           target_s=4.0):
    """Run the device-resident LM loop as a sequence of bounded-duration
    dispatches: the full LM state (b, ne, lam, nu, it, plateau refs, done)
    is carried on device between segments, so the math is IDENTICAL to one
    long while_loop — only the host reads back two scalars per segment
    (~25 ms over the device tunnel).

    Why: the axon TPU worker crashes ('kernel fault') when a single
    execution runs for tens of seconds (empirically: the canonical splined
    solve at 2000 iterations ~16 s died; 300 iterations ~2.4 s is fine).
    Segment duration is adapted toward target_s from the measured
    iteration rate; the measured rate is REMEMBERED on the solver object,
    so repeat solves of the same problem (benchmark sustained runs,
    outlier-rejection re-solves) size their first segment right and
    usually finish in ONE dispatch."""
    import time as _time
    dt = b0.dtype
    thr = jnp.asarray(update_threshold, dt)
    ftol_d = jnp.asarray(ftol, dt)
    state = solve.start(b0, arrays, jnp.asarray(lam0, dt))
    rate_known = getattr(solve, "_it_rate", {}).get(str(dt))
    if rate_known:
        seg = int(min(max(rate_known * target_s, chunk0), 200_000))
    else:
        seg = int(chunk0)
    it_done = 0
    while True:
        stop_at = min(int(max_iterations), it_done + seg)
        t0 = _time.perf_counter()
        state = solve.run(state, arrays,
                          jnp.asarray(stop_at, jnp.int32), thr, ftol_d)
        # ONE device->host readback per segment: (niter, done) together.
        # Separate int(state[4]) + bool(state[7]) reads each cost a full
        # ~25 ms round-trip over the device tunnel.
        it_new, done_flag = (int(v) for v in np.asarray(
            jnp.stack([state[4], state[7].astype(jnp.int32)])))
        dt_seg = _time.perf_counter() - t0
        ran = max(it_new - it_done, 1)
        it_done = it_new
        rate = ran / max(dt_seg, 1e-3)
        if ran >= 32 and dt_seg > 0.05:
            # a long-enough measured segment: remember the rate (skip
            # compile-dominated first calls via the dt_seg floor... those
            # UNDER-estimate, which is safe but slow; overwrite freely)
            if not hasattr(solve, "_it_rate"):
                solve._it_rate = {}
            solve._it_rate[str(dt)] = rate
        if done_flag or it_done >= int(max_iterations):
            break
        # adapt: keep a single dispatch near target_s (first segment's
        # rate includes compile time -> conservative, self-corrects)
        seg = int(min(max(chunk0, rate * target_s), 200_000))
    return state[0], state[1], state[4]


def _lazy_h_K(spec: ProblemSpec, dtype):
    """Lazy-Hessian refresh interval for the f32 phase.  Default ON for
    SPLINED models only (measured ~1.7x sustained it/s at identical
    converged rms and a slightly better convergence wall).  Parametric
    models keep the exact model by default: lazy measured 1cam/4cam
    sustained 1239->1610 / 578->1385 it/s but the 4cam CONVERGENCE wall
    went 1.5 -> 5.0 s (the stale-H f32 phase hands the f64 polish a
    worse point: 16 -> 80 polish iterations) — a bad trade for real
    solves.  MRCAL_TPU_LAZY_H=<K> overrides (0 disables)."""
    env = _os.environ.get("MRCAL_TPU_LAZY_H")
    if env is not None:
        return int(env)
    if spec.is_splined and dtype == jnp.float32 \
            and jax.default_backend() != "cpu":
        # K=4 with the separable out-of-loop gradient (round-5 v5e A/B):
        # K=8 let the stale-H f32 phase drift enough to double the f64
        # polish (conv 3.4 s / 32 polish iters); K=4 keeps polish at 16
        # and the best convergence wall while sustained throughput stays
        # within noise of K=8 (417 vs 420 it/s).  K=0: sustained 237.
        return 4
    return 0


def _trace_env_key(spec: ProblemSpec):
    """Env knobs that BAKE INTO the compiled solver at trace time; they
    must participate in the solver cache keys or changing them mid-
    process would be silently ignored."""
    return (_use_splined_sparse(spec),
            _use_corner_jacobian(spec),
            _use_pair_onehot(spec),
            _os.environ.get("MRCAL_TPU_F32_LAM_FLOOR", "4e-7"),
            _os.environ.get("MRCAL_TPU_SCHUR_F64"),
            _os.environ.get("MRCAL_TPU_SPLINED_F64_H32", "1"),
            _os.environ.get("MRCAL_TPU_SPLINED_CHUNK", "4096"),
            _os.environ.get("MRCAL_TPU_SPLINED_SEP_G", "1"))


def _get_device_solver(spec: ProblemSpec, static_idx_key, static_idx, dtype):
    """Compile (once per problem shape) the full device-resident LM loop.
    max_iterations/update_threshold are DYNAMIC inputs so one compilation
    serves every call."""
    lazy_K = _lazy_h_K(spec, dtype)
    key = (spec, static_idx_key, str(dtype), lazy_K, _trace_env_key(spec))
    if key in _DEVICE_SOLVER_CACHE:
        return _DEVICE_SOLVER_CACHE[key]
    # parametric models get the one-reverse-pass gradient branch;
    # splined ones rely on DCE of the ne_fn (see _make_grad_fn)
    grad_fn = None if spec.is_splined else _make_grad_fn(spec)
    solve = _make_device_lm(spec, build_normal_equations(spec, None,
                                                         static_idx),
                            lazy_K=lazy_K, grad_fn=grad_fn)
    _DEVICE_SOLVER_CACHE[key] = solve
    return solve


def lm_solve_device(spec: ProblemSpec, arrays, b0,
                    max_iterations=300, update_threshold=1e-7,
                    dtype=None, quiet=False, lam0=1e-4, ftol=None,
                    defer_host=False, static_idx=None):
    """The whole trust-region LM loop as ONE jitted computation
    (jax.lax.while_loop): normal equations, Schur step, trial evaluation and
    the gain-ratio lambda control all run on device.  This removes the
    per-iteration host round-trip of lm_solve() — the difference between
    dispatch-bound and compute-bound on TPU.  One compilation serves all
    calls with the same problem shape (iteration bounds are dynamic).

    Returns (b, E, niter, ne) — ne is the normal-equation dict at the
    solution (residual vectors x_board/x_point/x_tri/x_reg included), same
    as lm_solve()."""
    if static_idx is None:
        # np.asarray on a DEVICE index array is a ~25 ms tunnel
        # round-trip each; optimize() passes host copies in instead
        static_idx = dict(board=np.asarray(arrays["indices_board"]),
                          point=np.asarray(arrays["indices_point"]))
    if dtype is not None:
        arrays = _cast_arrays(arrays, dtype)
        b0 = jnp.asarray(b0, dtype)
    b0 = jnp.asarray(b0)
    eff_threshold = _effective_threshold(update_threshold, b0.dtype, quiet)
    static_idx_key = (static_idx["board"].tobytes(),
                      static_idx["point"].tobytes())
    if ftol is None:
        # f32 grinds at its ~1e-7 relative-E precision floor; f64 at
        # roundoff.  Terminate when accepted improvements fall below it.
        ftol = 1e-5 if b0.dtype == jnp.float32 else 1e-6
    solve = _get_device_solver(spec, static_idx_key, static_idx, b0.dtype)
    with _matmul_precision_ctx(b0.dtype, spec):
        if _use_chunked_dispatch():
            b, ne, it = _run_device_lm_chunked(
                solve, b0, arrays, max_iterations, eff_threshold, lam0,
                ftol,
                chunk0=int(_os.environ.get("MRCAL_TPU_DEVICE_CHUNK")
                           or 64))
        else:
            b, ne, it = solve(b0, arrays,
                              jnp.asarray(max_iterations, jnp.int32),
                              jnp.asarray(eff_threshold, b0.dtype),
                              jnp.asarray(lam0, b0.dtype),
                              jnp.asarray(ftol, b0.dtype))
    # defer_host: keep E on device (optimize() folds it into its single
    # fused readback; a lone float(E) costs a ~25 ms tunnel round-trip)
    return b, (ne["E"] if defer_host else float(ne["E"])), int(it), ne


# ----------------------------------------------------------------------------
# batched solves: many same-structure problems in ONE device program
# ----------------------------------------------------------------------------

_BATCH_SOLVER_CACHE = {}


def _get_batched_solver(spec, static_idx_key, static_idx, dtype, axes):
    """vmap of the device-resident LM over a problem batch: float arrays
    carry a leading batch axis, the (structure-defining) index arrays are
    shared.  JAX's while_loop batching rule freezes finished problems
    (state = select(cond, body(state), state)), so the batch runs until
    the slowest problem converges."""
    key = (spec, static_idx_key, str(dtype), tuple(sorted(axes.items())),
           _trace_env_key(spec))
    if key in _BATCH_SOLVER_CACHE:
        return _BATCH_SOLVER_CACHE[key]
    base = _get_device_solver(spec, static_idx_key, static_idx, dtype)

    start_b = jax.jit(jax.vmap(base.start, in_axes=(0, axes, None)))
    run_b = jax.jit(jax.vmap(base.run, in_axes=(0, axes, None, None, None)))

    def solve(b0, arrays, max_iterations, update_threshold, lam0, ftol):
        state = start_b(b0, arrays, lam0)
        state = run_b(state, arrays, max_iterations, update_threshold,
                      ftol)
        return state[0], state[1], state[4]

    solve.start = start_b
    solve.run = run_b
    _BATCH_SOLVER_CACHE[key] = solve
    return solve


def _run_batch_chunked(solve, b0, arrays, max_iterations,
                       update_threshold, lam0, ftol, chunk0=64,
                       target_s=4.0):
    """Bounded-duration dispatch loop for the BATCHED solver (see
    _run_device_lm_chunked): per-problem iteration counters / done flags
    are vectors, the host reads their max/all."""
    import time as _time
    dt = b0.dtype
    thr = jnp.asarray(update_threshold, dt)
    ftol_d = jnp.asarray(ftol, dt)
    state = solve.start(b0, arrays, jnp.asarray(lam0, dt))
    rate_known = getattr(solve, "_it_rate", {}).get(str(dt))
    seg = (int(min(max(rate_known * target_s, chunk0), 200_000))
           if rate_known else int(chunk0))
    it_done = 0
    while True:
        stop_at = min(int(max_iterations), it_done + seg)
        t0 = _time.perf_counter()
        state = solve.run(state, arrays,
                          jnp.asarray(stop_at, jnp.int32), thr, ftol_d)
        it_new = int(np.max(np.asarray(state[4])))
        dt_seg = _time.perf_counter() - t0
        ran = max(it_new - it_done, 1)
        it_done = it_new
        rate = ran / max(dt_seg, 1e-3)
        if ran >= 32 and dt_seg > 0.05:
            if not hasattr(solve, "_it_rate"):
                solve._it_rate = {}
            solve._it_rate[str(dt)] = rate
        if bool(np.all(np.asarray(state[7]))) \
                or it_done >= int(max_iterations):
            break
        seg = int(min(max(chunk0, rate * target_s), 200_000))
    return state[0], state[1], state[4]


def _float_axes(arrays):
    return {k: (0 if jnp.issubdtype(v.dtype, jnp.floating) else None)
            for k, v in arrays.items()}


def lm_solve_device_batch(spec: ProblemSpec, arrays_b, b0_b,
                          max_iterations=300, update_threshold=1e-7,
                          dtype=None, quiet=False, lam0=1e-4, ftol=None):
    """Batched lm_solve_device: arrays_b's FLOAT leaves carry a leading
    problem axis (index arrays shared — the problems must have identical
    structure).  Returns (b (B,Nstate), E (B,), niter (B,), ne with
    leading batch axes)."""
    static_idx = dict(board=np.asarray(arrays_b["indices_board"]),
                      point=np.asarray(arrays_b["indices_point"]))
    if dtype is not None:
        arrays_b = _cast_arrays(arrays_b, dtype)
        b0_b = jnp.asarray(b0_b, dtype)
    b0_b = jnp.asarray(b0_b)
    eff_threshold = _effective_threshold(update_threshold, b0_b.dtype,
                                         quiet)
    if ftol is None:
        ftol = 1e-5 if b0_b.dtype == jnp.float32 else 1e-6
    static_idx_key = (static_idx["board"].tobytes(),
                      static_idx["point"].tobytes())
    axes = _float_axes(arrays_b)
    solve = _get_batched_solver(spec, static_idx_key, static_idx,
                                b0_b.dtype, axes)
    with _matmul_precision_ctx(b0_b.dtype, spec):
        if _use_chunked_dispatch():
            b, ne, it = _run_batch_chunked(
                solve, b0_b, arrays_b, max_iterations, eff_threshold,
                lam0, ftol)
        else:
            b, ne, it = solve(b0_b, arrays_b,
                              jnp.asarray(max_iterations, jnp.int32),
                              jnp.asarray(eff_threshold, b0_b.dtype),
                              jnp.asarray(lam0, b0_b.dtype),
                              jnp.asarray(ftol, b0_b.dtype))
    return b, np.asarray(ne["E"]), np.asarray(it), ne


def optimize_batch(problems, **common_kw):
    """Solve MANY same-structure calibration problems as ONE batched
    device program — the TPU serving mode.  A single small problem is
    latency-limited on the accelerator; batching B problems runs their
    LM loops in lockstep (finished problems freeze while the rest
    iterate), multiplying aggregate throughput.

    problems: list of mrcal-style optimization_inputs dicts.  Every
    problem must share the same lensmodel, counts and observation-index
    structure (e.g. a fleet of single-camera calibrations from the same
    rig design); the float inputs (observations, initial geometry)
    differ per problem.  common_kw: max_iterations, update_threshold,
    precision ('mixed'|'f32'|'f64', same defaults as optimize()).

    Like optimize(), MUTATES each problem's arrays with its solution
    and runs the outlier-rejection outer loop (host-side per problem,
    batched re-solves).  Returns a list of per-problem stats dicts."""
    if not problems:
        return []
    kws = [_layout.normalize_inputs(dict(p)) for p in problems]
    specs = [spec_from_inputs(**kw) for kw in kws]
    spec = specs[0]
    for s in specs[1:]:
        if s != spec:
            raise ValueError("optimize_batch needs identical problem "
                             "structure across the batch")
    arrays_list = [arrays_from_inputs(**kw) for kw in kws]
    idx0 = {k: np.asarray(arrays_list[0][k])
            for k in ("indices_board", "indices_point")}
    for a in arrays_list[1:]:
        for k, v in idx0.items():
            if not np.array_equal(np.asarray(a[k]), v):
                raise ValueError("optimize_batch needs identical "
                                 f"'{k}' across the batch")

    max_iterations = int(common_kw.get("max_iterations", 300))
    update_threshold = float(common_kw.get("update_threshold", 1e-7))
    ftol = common_kw.get("ftol")
    precision = common_kw.get("precision")
    if precision is None:
        precision = ("mixed" if jax.default_backend() != "cpu" else "f64")

    def stack(arrays_list):
        out = dict(arrays_list[0])
        for k, v in arrays_list[0].items():
            if jnp.issubdtype(v.dtype, jnp.floating):
                out[k] = jnp.stack([a[k] for a in arrays_list])
        return out

    B = len(problems)
    np_obs = [np.asarray(kw["observations_board"])
              if kw.get("observations_board") is not None else None
              for kw in kws]

    def _np_or_none(kw, key):
        a = kw.get(key)
        if a is None or not np.asarray(a).size:
            return None
        return np.asarray(a)

    np_obs_tri = [_np_or_none(kw, "observations_point_triangulated")
                  for kw in kws]
    from .. import profiling
    _timer = profiling._SolveTimer()
    niter_polish = np.zeros(B, int)
    total_niter = np.zeros(B, int)
    Nout_tri = np.zeros(B, int)

    while True:
        arrays_b = stack(arrays_list)
        b0 = jnp.stack([pack_params(params_from_arrays(a), spec)
                        for a in arrays_list])
        if precision == "f32":
            with _timer.phase("solve_f32"):
                b, E, it, ne = lm_solve_device_batch(
                    spec, arrays_b, b0, max_iterations=max_iterations,
                    update_threshold=update_threshold, dtype=jnp.float32,
                    quiet=True, ftol=ftol)
            b = jnp.asarray(b, jnp.float64)
        elif precision == "mixed":
            with _timer.phase("solve_f32"):
                b32, _, it32, _ = lm_solve_device_batch(
                    spec, arrays_b, b0, max_iterations=max_iterations,
                    update_threshold=update_threshold, dtype=jnp.float32,
                    quiet=True, ftol=ftol)
            with _timer.phase("solve_polish_f64"):
                b, E, it, ne = lm_solve_device_batch(
                    spec, arrays_b, jnp.asarray(b32, jnp.float64),
                    max_iterations=300,
                    update_threshold=update_threshold)
            niter_polish += np.asarray(it, int)
            it = it + it32
        else:
            with _timer.phase("solve_f64"):
                b, E, it, ne = lm_solve_device_batch(
                    spec, arrays_b, b0, max_iterations=max_iterations,
                    update_threshold=update_threshold)
        total_niter += np.asarray(it, int)

        # write the solutions back into each problem's arrays
        for i, (kw, arrays) in enumerate(zip(kws, arrays_list)):
            params = split_packed_state(b[i], arrays, spec)
            for name, key in (("intrinsics", "intrinsics"),
                              ("extrinsics_rt_fromref", "extrinsics"),
                              ("frames_rt_toref", "frames"),
                              ("points", "points")):
                a = kw.get(name)
                if a is not None and np.asarray(a).size:
                    np.copyto(np.asarray(a), np.asarray(params[key]))
            if kw.get("calobject_warp") is not None \
                    and spec.has_calobject_warp:
                np.copyto(np.asarray(kw["calobject_warp"]),
                          np.asarray(params["calobject_warp"]))

        if not (spec.selections.do_apply_outlier_rejection
                and (spec.Nobservations_board
                     or any(o is not None for o in np_obs_tri))):
            break
        # batched host fetch of the residual vectors (one transfer per
        # leaf for the WHOLE batch, not per problem)
        xb_all = np.asarray(ne["x_board"])
        xt_all = (np.asarray(ne["x_tri"])
                  if any(o is not None for o in np_obs_tri) else None)
        b_np_all = np.asarray(b)
        found_any = False
        with _timer.phase("outlier_rejection"):
            for i in range(B):
                if np_obs[i] is None and np_obs_tri[i] is None:
                    continue
                ext_i = (_unpack_state_np(b_np_all[i], spec)
                         .get("extrinsics")
                         if np_obs_tri[i] is not None else None)
                found, _, nt = _mark_outliers(
                    spec,
                    np_obs[i],
                    (xb_all[i].reshape(-1) if np_obs[i] is not None
                     else None),
                    obs_tri_np=np_obs_tri[i],
                    x_tri=(xt_all[i].reshape(-1) if xt_all is not None
                           else None),
                    px_tri=(arrays_list[i].get("px_triangulated")
                            if np_obs_tri[i] is not None else None),
                    idx_tri=(np.asarray(
                        arrays_list[i]["indices_triangulated"])
                        if np_obs_tri[i] is not None else None),
                    extrinsics=ext_i)
                Nout_tri[i] = nt
                if found:
                    found_any = True
                    if np_obs[i] is not None:
                        arrays_list[i]["observations_board"] = \
                            jnp.asarray(np_obs[i], dtype=arrays_list[i]
                                        ["observations_board"].dtype)
                    if np_obs_tri[i] is not None:
                        arrays_list[i][
                            "observations_point_triangulated"] = \
                            jnp.asarray(
                                np_obs_tri[i], dtype=arrays_list[i]
                                ["observations_point_triangulated"]
                                .dtype)
        if not found_any:
            break
        # refresh geometry arrays from the written-back kws so the
        # re-solve starts from the current solutions
        arrays_list = [arrays_from_inputs(**kw) for kw in kws]

    # full per-problem stats, same contract as optimize()
    xb_all = np.asarray(ne["x_board"])
    xp_all = np.asarray(ne["x_point"])
    xt_all = np.asarray(ne["x_tri"])
    xr_all = np.asarray(ne["x_reg"])

    def _row(a, i):
        return (a[i].reshape(-1) if a.ndim > 1
                else a.reshape(-1))        # unbatched empty leaves

    stats = []
    time_s = {k: round(v, 6) for k, v in _timer.t.items()}
    for i in range(B):
        Nout = (int(np.sum(np_obs[i][..., 2] <= 0))
                if np_obs[i] is not None else 0)
        x = np.concatenate([_row(xb_all, i), _row(xp_all, i),
                            _row(xt_all, i), _row(xr_all, i)])
        stats.append(dict(
            rms_reproj_error__pixels=float(
                np.sqrt(float(E[i]) / max(spec.Nmeasurements, 1))),
            niterations=int(total_niter[i]),
            niterations_polish=int(niter_polish[i]),
            Noutliers=Nout, Noutliers_board=Nout,
            Noutliers_triangulated_point=int(Nout_tri[i]),
            time_s=dict(time_s),           # batch-shared wall phases
            x=x,
            b_packed=np.asarray(b[i])))
    return stats


def pad_problems_to_common_structure(problems):
    """Make a HETEROGENEOUS fleet batchable by optimize_batch.

    optimize_batch requires identical observation-index structure across
    the batch (the indices bake into the compiled program).  Real fleets
    share a rig DESIGN (same cameras, frames, lensmodel) but differ in
    per-unit visibility: some units miss some board views or point
    observations.  This helper builds the UNION of the board/point index
    rows across the batch and returns adjusted copies of the problems
    where every unit carries the same index arrays; rows a unit lacks
    are padded with weight=-1 observations (the outlier idiom: weight<=0
    zeroes the residual AND the Jacobian rows, so padding contributes
    nothing to the solve — same contract as the shard-padding rows in
    parallel/sharding.py).

    Padding rows count as outliers in the returned stats' Noutliers
    (weight<=0); subtract the per-unit pad count if the distinction
    matters.  Triangulated-point sets are not padded (their set/last
    structure is positional): problems carrying DIFFERING triangulated
    sets raise.

    Returns a new list of optimization_inputs dicts (inputs unchanged;
    observation arrays are fresh copies, other arrays shared)."""
    kws = [_layout.normalize_inputs(dict(p)) for p in problems]

    tri0 = kws[0].get(
        "indices_point_triangulated_camintrinsics_camextrinsics")
    for kw in kws[1:]:
        t = kw.get(
            "indices_point_triangulated_camintrinsics_camextrinsics")
        if (t is None) != (tri0 is None) or \
                (t is not None and not np.array_equal(
                    np.asarray(t), np.asarray(tri0))):
            raise ValueError("pad_problems_to_common_structure: "
                             "triangulated-point sets must already be "
                             "identical across the batch")

    def union_rows(key):
        rows = set()
        for kw in kws:
            idx = kw.get(key)
            if idx is not None:
                rows.update(map(tuple, np.asarray(idx, np.int32)))
        return np.asarray(sorted(rows), np.int32).reshape(-1, 3) \
            if rows else None

    ub = union_rows("indices_frame_camintrinsics_camextrinsics")
    up = union_rows("indices_point_camintrinsics_camextrinsics")

    out = []
    for kw in kws:
        kw = dict(kw)
        if ub is not None:
            obs = kw.get("observations_board")
            tail = (np.asarray(obs).shape[1:] if obs is not None
                    else None)
            if tail is None:
                raise ValueError("board indices without observations")
            new = np.zeros((len(ub),) + tail)
            new[..., 2] = -1.0                     # padding = outlier
            pos = {tuple(r): i for i, r in enumerate(
                np.asarray(kw["indices_frame_camintrinsics_"
                              "camextrinsics"], np.int32))}
            for j, r in enumerate(map(tuple, ub)):
                if r in pos:
                    new[j] = np.asarray(obs)[pos[r]]
            kw["observations_board"] = new
            kw["indices_frame_camintrinsics_camextrinsics"] = ub.copy()
        if up is not None:
            obs = kw.get("observations_point")
            new = np.zeros((len(up), 3))
            new[:, 2] = -1.0
            if obs is not None:
                pos = {tuple(r): i for i, r in enumerate(
                    np.asarray(kw["indices_point_camintrinsics_"
                                  "camextrinsics"], np.int32))}
                for j, r in enumerate(map(tuple, up)):
                    if r in pos:
                        new[j] = np.asarray(obs)[pos[r]]
            kw["observations_point"] = new
            kw["indices_point_camintrinsics_camextrinsics"] = up.copy()
        out.append(kw)
    return out


def _use_chunked_dispatch():
    """Segmented device dispatches by default on accelerators (the axon
    worker kills single long-running executions); single-shot on CPU.
    MRCAL_TPU_DEVICE_CHUNK=0 forces single-shot, =N sets the initial
    segment size."""
    env = _os.environ.get("MRCAL_TPU_DEVICE_CHUNK")
    if env is not None:
        return int(env) > 0
    return jax.default_backend() != "cpu"


def _matmul_precision_ctx(dtype, spec=None):
    """Trace-time matmul precision for the f32 solve phase on
    accelerators.  TPU f32 matmuls default to bf16x3 passes; the noise in
    J^T J / J^T r degrades the LM steps enough that the f32 phase crawls
    (~1000 iterations where exact-arithmetic f32 takes ~50) — so
    parametric models default to 'float32' (full-precision passes; their
    H matmuls are small and the cost is negligible).  SPLINED models keep
    the DEFAULT precision: their H is a (rows x 1082)-wide genuine matmul
    where full-precision passes cost 2x sustained throughput, and the f32
    phase's windowed plateau + the f64 polish absorb the extra noise
    (measured: identical final rms, ~2x the f32 iterations, half the
    per-iteration cost).  MRCAL_TPU_F32_MATMUL_PRECISION[_SPLINED]
    override either choice ('' disables).  Applied around the solver's
    trace, so the setting bakes into the compiled executable."""
    import contextlib
    if spec is not None and spec.is_splined:
        prec = _os.environ.get("MRCAL_TPU_F32_MATMUL_PRECISION_SPLINED",
                               "")
    else:
        prec = _os.environ.get("MRCAL_TPU_F32_MATMUL_PRECISION",
                               "float32")
    if prec and dtype == jnp.float32 and jax.default_backend() != "cpu":
        return jax.default_matmul_precision(prec)
    return contextlib.nullcontext()


# ----------------------------------------------------------------------------
# splined-model specialization: sparse spline-window assembly
# ----------------------------------------------------------------------------

def _use_splined_sparse(spec: ProblemSpec):
    """Auto-select the sparse spline-window MXU assembly (true whenever the
    generic path's dense cross-corner intermediate would be big, or when
    MRCAL_TPU_SPLINED_SPARSE=1; =0 forces the generic/dense path).  Used by
    BOTH the single-chip and the sharded normal-equation builders so a
    given problem runs the same assembly on any mesh size."""
    if not _splined_fast_path_ok(spec, None):
        return False
    env = _os.environ.get("MRCAL_TPU_SPLINED_SPARSE")
    R = spec.lensmodel.order + 1
    HW = (spec.calibration_object_width_n *
          spec.calibration_object_height_n)
    dense_bytes = (spec.Nobservations_board * HW * 2 * HW *
                   (R * R * 2) * 4)
    return dense_bytes > 5e8 if env is None else env != "0"


def _splined_board_ne(spec: ProblemSpec, b, arrays, idx, mask_board=None):
    """Board-observation normal-equation blocks for
    LENSMODEL_SPLINED_STEREOGRAPHIC exploiting the spline-window sparsity:
    each corner's residual depends on only the (order+1)^2-knot window
    (x2 surfaces), so the intrinsics Jacobian is a per-corner (2, 2R^2)
    block (reference sparsity: gradient_sparse_meta_t, mrcal.c:2298-2303)
    expanded into dense camera-system rows via one-hot contractions
    (einsum -> MXU matmul), H = rows^T rows — zero scatter-adds in the
    hot path.

    `idx` may be a TRACED array: every index use downstream is a dynamic
    gather / one-hot / segment-sum, so the SAME code serves the
    single-chip path (indices baked as constants at trace time) and the
    shard_map'd per-device path of parallel/sharding.py (sharded
    idx/observations; padding rows carry observation weight 0, which
    zeroes their residual AND Jacobian rows — mask_board additionally
    zeroes their residual rows explicitly).

    Returns dict(E, g_c, g_f, Hcc, Hff, Cf,
                 x_board_rows (Nobs, 2*H*W))."""
    from ..lensmodels import (splined_window_index, _bspline_weights_cubic,
                              _bspline_weights_quadratic, stereographic_uv)
    s = spec.selections
    lm = spec.lensmodel
    cl = _CLayout(spec)
    Nf = spec.Nframes
    R = lm.order + 1
    H_n = spec.calibration_object_height_n
    W_n = spec.calibration_object_width_n
    Ncorners = H_n * W_n

    # static per-corner board grid coords
    cx = np.tile(np.arange(W_n), H_n).astype(np.float64)
    cy = np.repeat(np.arange(H_n), W_n).astype(np.float64)

    def corner_fn(pose, win, ixy0, corner_xy, obs_c, core4, warp_fixed):
        """One corner's residual as a function of the pose blocks (packed)
        and its gathered spline window.  ixy0: the (ix0, iy0) window origin
        (ints, fixed in this evaluation)."""
        dt = core4.dtype
        rt_cam = pose["ext"] * jnp.asarray(_EXT_SCALES, dt)
        rt_frame = pose["frame"] * jnp.asarray(_FRAME_SCALES, dt)
        if spec.has_calobject_warp:
            warp = pose["warp"] * jnp.asarray(_WARP_SCALES, dt)
        else:
            warp = warp_fixed
        xr = corner_xy[0] / (W_n - 1)
        yr = corner_xy[1] / (H_n - 1)
        z = (warp[0] * 4.0 * xr * (1.0 - xr) +
             warp[1] * 4.0 * yr * (1.0 - yr))
        pt_ref = jnp.stack([corner_xy[0] * spec.calibration_object_spacing,
                            corner_xy[1] * spec.calibration_object_spacing,
                            z])
        rt_joint = _compose_rt2(rt_cam, rt_frame)
        p = _transform_point_rt(rt_joint, pt_ref)
        u = stereographic_uv(p)
        spu = lm.segments_per_u
        ix = u[0] * spu + (lm.Nx - 1) / 2.0
        iy = u[1] * spu + (lm.Ny - 1) / 2.0
        tx = ix - ixy0[0]
        ty = iy - ixy0[1]
        wts = (_bspline_weights_cubic if lm.order == 3
               else _bspline_weights_quadratic)
        wx = wts(tx)
        wy = wts(ty)
        du = jnp.einsum("i,j,ijk->k", wy, wx, win)
        fx, fy, cx_, cy_ = core4[0], core4[1], core4[2], core4[3]
        q = jnp.stack([(u[0] + du[0]) * fx + cx_,
                       (u[1] + du[1]) * fy + cy_])
        w = jnp.maximum(obs_c[2], 0.0)
        return (q - obs_c[:2]) * w

    dt = b.dtype
    params = split_packed_state(b, arrays, spec)
    intr_full = params["intrinsics"]
    ext_packed = params["extrinsics"] / jnp.asarray(_EXT_SCALES, dt)
    ext_pad = jnp.concatenate([jnp.zeros((1, 6), dt), ext_packed], 0)
    frames_packed = params["frames"] / jnp.asarray(_FRAME_SCALES, dt)
    warp_packed = params["calobject_warp"] / jnp.asarray(_WARP_SCALES, dt)

    idx = jnp.asarray(idx)
    obs = arrays["observations_board"]
    Nobs = idx.shape[0]
    ifr, ici, ice = idx[:, 0], idx[:, 1], idx[:, 2]

    # ---- corner-level flattening ----
    N = Nobs * Ncorners
    ifr_c = jnp.repeat(ifr, Ncorners)
    ici_c = jnp.repeat(ici, Ncorners)
    ice_c = jnp.repeat(ice, Ncorners)
    obs_c = obs.reshape(N, 3)
    corner_xy = jnp.asarray(np.stack(
        [np.tile(cx, Nobs), np.tile(cy, Nobs)], axis=-1), dt)

    pose = dict(ext=ext_pad[ice_c + 1],
                frame=frames_packed[ifr_c],
                warp=jnp.broadcast_to(warp_packed, (N, 2)))
    # single-camera fast path: the ici gathers of core4/coeffs are pure
    # broadcast, but a TRACED all-zeros index still lowers to real
    # gathers (4x f32[N] gathers measured 0.44 ms/iter at 30x18)
    one_cam = spec.Ncameras_intrinsics == 1
    if one_cam:
        core4 = jnp.broadcast_to(intr_full[0, :4], (N, 4))
    else:
        core4 = intr_full[ici_c, :4]

    # ---- window origin (vectorized forward) + CONTIGUOUS row gather ----
    # Each window row is R consecutive x-knots: gather R slices of
    # (R,2) contiguous floats per corner instead of R*R*2 independent
    # elements (the per-element gather was 27% of the whole iteration).
    coeffs = intr_full[:, 4:].reshape(
        spec.Ncameras_intrinsics, lm.Ny, lm.Nx, 2)

    def uvec_of(pose1, cxy1):
        rt_joint = _compose_rt2(
            pose1["ext"] * jnp.asarray(_EXT_SCALES, dt),
            pose1["frame"] * jnp.asarray(_FRAME_SCALES, dt))
        if spec.has_calobject_warp:
            warp = pose1["warp"] * jnp.asarray(_WARP_SCALES, dt)
        else:
            warp = params["calobject_warp"]
        xr = cxy1[0] / (W_n - 1)
        yr = cxy1[1] / (H_n - 1)
        z = (warp[0] * 4.0 * xr * (1.0 - xr) +
             warp[1] * 4.0 * yr * (1.0 - yr))
        pt_ref = jnp.stack([cxy1[0] * spec.calibration_object_spacing,
                            cxy1[1] * spec.calibration_object_spacing,
                            z])
        p = _transform_point_rt(rt_joint, pt_ref)
        return stereographic_uv(p)

    u_all = jax.vmap(uvec_of)(pose, corner_xy)             # (N,2)
    ix0, iy0, tx_all, ty_all = splined_window_index(u_all, lm)
    ixy0 = jax.lax.stop_gradient(jnp.stack([ix0, iy0], axis=-1))
    offs = jnp.arange(R, dtype=jnp.int32)
    row0 = (iy0[:, None] - 1 + offs[None, :]) * lm.Nx + (ix0 - 1)[:, None]
    if one_cam:
        cflat = coeffs[0].reshape(lm.Ny * lm.Nx, 2)
    else:
        cflat = coeffs.reshape(-1, 2)
        row0 = row0 + (ici_c * (lm.Ny * lm.Nx))[:, None]
    row0 = jax.lax.stop_gradient(row0)                     # (N,R)
    # flat per-element gather.  A vmapped dynamic_slice of (R,2)
    # contiguous rows LOOKED cheaper (4x fewer index rows) but XLA:TPU
    # lowers that gather-of-slices to a sequential on-device loop —
    # 65856 dynamic-slice steps per NE eval, 54 ms/iter (round-5
    # measurement).  The per-element gather stays a native fusion.
    win = cflat[row0[:, :, None] + jnp.arange(R)[None, None, :]]
    # (N,R,R,2): [jy, ix] = knot (iy0-1+jy, ix0-1+ix)

    def corner_rj(pose1, win1, ixy01, cxy1, obs1, core41):
        # residual + pose Jacobian in ONE vjp (2 cotangents)
        rr, pull = jax.vjp(
            lambda po: corner_fn(po, win1, ixy01, cxy1, obs1, core41,
                                 params["calobject_warp"]), pose1)
        (Jp1,) = jax.vmap(pull)(jnp.eye(2, dtype=rr.dtype))
        return rr, Jp1

    r, Jp = jax.vmap(corner_rj)(pose, win, ixy0, corner_xy, obs_c, core4)
    if mask_board is not None:
        # shard-padding rows: their observations are all-zero so w=0
        # already zeroes r AND every Jacobian row; the explicit mask
        # keeps the residual-row contract airtight
        r = r * jnp.repeat(mask_board, Ncorners)[:, None]
    # ANALYTIC window Jacobian: q depends linearly on the window,
    #   dr_k/dwin[jy, ix, m] = delta_{km} * w * f_k * wy_jy * wx_ix
    # — no second AD pass through the projection chain (the jacrev
    # formulation's (N,2,R,R) cotangent products were ~15% of the
    # iteration in (4,128)-tiled fusions)
    wts = (_bspline_weights_cubic if lm.order == 3
           else _bspline_weights_quadratic)
    wx_all = wts(tx_all)                                   # (N,R)
    wy_all = wts(ty_all)
    wgt_all = jnp.maximum(obs_c[:, 2], 0.0)
    if mask_board is not None:
        wgt_all = wgt_all * jnp.repeat(mask_board, Ncorners)
    wyx = wy_all[:, :, None] * wx_all[:, None, :]          # (N,R,R)
    f2 = jnp.stack([core4[:, 0], core4[:, 1]], axis=-1) \
        * wgt_all[:, None]                                 # (N,2)
    Jw = (wyx[:, None, :, :, None]
          * f2[:, :, None, None, None]
          * jnp.eye(2, dtype=dt)[None, :, None, None, :]
          ).reshape(N, 2, R * R * 2)

    Je = _zero_if(s.do_optimize_extrinsics, Jp["ext"]) \
        * (ice_c >= 0)[:, None, None].astype(dt)
    Jf = _zero_if(s.do_optimize_frames, Jp["frame"])
    Jwp = _zero_if(spec.has_calobject_warp, Jp["warp"])

    # absolute intrinsics-state columns of the window entries, per
    # corner: per-camera block at coli(ici) + 2*(iy*Nx + ix) + k
    # (core locked: Nip == 2 Nx Ny)
    offs = jnp.arange(R, dtype=jnp.int32)
    iyw = ixy0[:, 1:2] - 1 + offs[None, :]           # (N,R)
    ixw = ixy0[:, 0:1] - 1 + offs[None, :]           # (N,R)
    flat = (iyw[:, :, None] * lm.Nx + ixw[:, None, :])  # (N,R,R)
    wincols = ici_c[:, None, None, None] * cl.Nip + \
        (2 * flat)[..., None] + jnp.arange(2, dtype=jnp.int32)
    wincols = wincols.reshape(N, R * R * 2)          # (N, Nwin)

    Nc = cl.Nc
    E = jnp.sum(r * r)
    # f64 on an accelerator: the H einsums run in f32 (the MXU path —
    # emulated-f64 matmuls are catastrophically slow, ~100x) while the
    # GRADIENT stays exact f64 via small scatter-adds.  Damped Newton
    # with an approximate-but-SPD H and an exact g converges to the
    # exact optimum; only the gradient's precision bounds the answer.
    use_h32 = (dt == jnp.float64 and jax.default_backend() != "cpu"
               and _os.environ.get("MRCAL_TPU_SPLINED_F64_H32", "1")
               != "0")
    hdt = jnp.float32 if use_h32 else dt
    # separable knot gradient OUT of the chunk loop (round 5): lets the
    # lazy-H branch DCE the whole rows/H fori_loop.
    # MRCAL_TPU_SPLINED_SEP_G=0 restores the in-loop rows-based g.
    sep_g = (not use_h32
             and _os.environ.get("MRCAL_TPU_SPLINED_SEP_G", "1") != "0")
    g_c = jnp.zeros(Nc, dt)
    Hcc = jnp.zeros((Nc, Nc), hdt)
    g_f = jnp.zeros((max(Nf, 1), 6), dt)
    Hff = jnp.zeros((max(Nf, 1), 6, 6), hdt)
    Cf = jnp.zeros((max(Nf, 1), 6, Nc), hdt)

    # ---- MXU assembly: expand each corner's sparse window Jacobian
    # into a dense camera-system row pair via ONE-HOT CONTRACTIONS
    # (einsum -> matmul on the MXU), then accumulate H = rows^T rows.
    # No per-corner scatter-adds: TPU scatters serialize on the VPU (the
    # earlier .at[].add formulation measured 6x slower than the dense
    # path and the dense path OOMs), while this runs at matmul speed.
    # Chunking is per OBSERVATION (a chunk's corner rows flatten to
    # ~4k), and the frame blocks Cf/Hff/g_f accumulate at OBSERVATION
    # granularity — batched (M2 x Nc) matmuls + a tiny per-obs
    # block-scatter.  The round-3 corner-granularity segment-sum
    # materialized a (corners, 6, Nc) intermediate that cost 2.6 ms/iter
    # of HBM traffic on the canonical splined problem (round-4 probes).
    Nce = spec.Ncameras_extrinsics
    M2 = 2 * Ncorners
    # observations per chunk: MRCAL_TPU_SPLINED_CHUNK = target corner-row
    # count per chunk (v5e sweep at 30x18 knots: 4096 and 16384 measure
    # within noise; tiny chunks pay fori_loop overhead)
    _chunk_rows = int(_os.environ.get("MRCAL_TPU_SPLINED_CHUNK", 4096))
    CHO = max(1, _chunk_rows // M2)
    CH = CHO * Ncorners                   # corners per chunk
    NobsPad = (Nobs + CHO - 1) // CHO * CHO

    def pad_obs(a, fill=0):
        return jnp.concatenate(
            [a, jnp.full((NobsPad - Nobs,) + a.shape[1:], fill, a.dtype)],
            axis=0) if NobsPad != Nobs else a

    def obs_view(a):
        return a.reshape((Nobs, Ncorners) + a.shape[1:])

    # padded observations: zero Jacobians contribute nothing
    Jw_p = pad_obs(obs_view(Jw))
    Je_p = pad_obs(obs_view(Je))
    Jwp_p = pad_obs(obs_view(Jwp))
    Jf_p = pad_obs(obs_view(Jf))
    r_p = pad_obs(obs_view(r))
    wincols_p = pad_obs(obs_view(wincols), fill=0)
    ice_p = pad_obs(ice, fill=-1)         # obs-level indices
    ifr_p = pad_obs(ifr, fill=0)

    Nip_all = cl.e0                       # total intrinsics state size

    def chunk_body(ci, acc):
        if not sep_g:
            Hcc, g_c, g_f, Hff, Cf = acc
        else:
            Hcc, Hff, Cf = acc
        i0_ = ci * CHO

        def dslice(a):
            return jax.lax.dynamic_slice_in_dim(a, i0_, CHO, 0)

        def flat(a):                      # (CHO, Ncorners, ...) -> (CH, ...)
            return a.reshape((CH,) + a.shape[2:])

        Jw_c = flat(dslice(Jw_p))
        Je_c = flat(dslice(Je_p))
        Jwp_c = flat(dslice(Jwp_p))
        Jf_c = flat(dslice(Jf_p))
        r_c = flat(dslice(r_p))
        wincols_c = flat(dslice(wincols_p))
        ice_o = dslice(ice_p)             # (CHO,)
        ifr_o = dslice(ifr_p)
        ice_cc = jnp.repeat(ice_o, Ncorners)
        # intrinsics block: (CH, 2, Nip_all).  In the plain f32 phase
        # the one-hot factor and Jw are fed to the MXU as bf16:
        # DEFAULT-precision passes round operands to bf16 anyway, so
        # this halves the one-hot's HBM traffic (the largest single
        # cost of the iteration: ~2.3 GB/NE-eval at 30x18 knots in
        # f32) at zero additional precision loss — the 0/1 one-hot is
        # exact in bf16, and the output accumulates in f32 via
        # preferred_element_type.  The f32-H-of-an-f64-polish scheme
        # keeps full f32 operands + full-precision passes.  (A
        # knot-level factored one-hot was tried and measured 3.5x
        # SLOWER: the extra component axis breaks the clean matmul
        # layout — don't redo it.)
        oh_dt = (jnp.bfloat16
                 if (dt == jnp.float32 and not use_h32
                     and jax.default_backend() != "cpu") else hdt)
        oh_w = (wincols_c[:, :, None] ==
                jnp.arange(Nip_all)[None, None, :]).astype(oh_dt)
        # full-precision matmul passes ONLY for the f32-H-of-an-f64-
        # polish scheme; the plain f32 phase keeps the ambient
        # (per-model) precision — forcing it here costs ~60% of the
        # splined f32 iteration
        import contextlib
        prec_ctx = (jax.default_matmul_precision("float32")
                    if use_h32 else contextlib.nullcontext())
        with prec_ctx:
            rows_i = jnp.einsum("nrw,nwk->nrk",
                                Jw_c.astype(oh_dt), oh_w,
                                preferred_element_type=hdt)
            parts = [rows_i]
            if Nce:
                oh_e = (jnp.maximum(ice_cc, 0)[:, None] ==
                        jnp.arange(Nce)[None, :]).astype(hdt)
                rows_e = jnp.einsum("nri,nj->nrji", Je_c.astype(hdt),
                                    oh_e).reshape(-1, 2, 6 * Nce)
                parts.append(rows_e)
            else:
                parts.append(jnp.zeros((CH, 2, cl.w0 - cl.e0), hdt))
            parts.append(Jwp_c.astype(hdt))
            rows = jnp.concatenate(parts, axis=-1)    # (CH, 2, Nc)
            Hcc = Hcc + jnp.einsum("nrc,nrd->cd", rows, rows)
            if Nf:
                rows_o = rows.reshape(CHO, M2, Nc)
                Jf_oh = Jf_c.astype(hdt).reshape(CHO, M2, 6)
                Cf = Cf.at[ifr_o].add(
                    jnp.einsum("oci,ocd->oid", Jf_oh, rows_o))
                Hff = Hff.at[ifr_o].add(
                    jnp.einsum("oci,ocj->oij", Jf_oh, Jf_oh))
        if use_h32:
            # the GRADIENT in full precision (f64 polish): small einsums
            # + scatter-adds — no emulated-f64 matmuls
            gi = jnp.einsum("nrw,nr->nw", Jw_c, r_c)     # (CH, Nwin)
            g_c = g_c.at[wincols_c].add(gi)
            ge = jnp.einsum("nri,nr->ni", Je_c, r_c)     # (CH, 6)
            cole = cl.e0 + 6 * jnp.maximum(ice_cc, 0)
            g_c = g_c.at[cole[:, None]
                         + jnp.arange(6)[None, :]].add(ge)
            g_c = g_c.at[cl.w0:cl.w0 + 2].add(
                jnp.einsum("nri,nr->i", Jwp_c, r_c))
        elif not sep_g:
            # legacy: g THROUGH the dense rows (rebuilds them every
            # iteration; MRCAL_TPU_SPLINED_SEP_G=0 fallback)
            g_c = g_c + jnp.einsum("nrc,nr->c", rows.astype(dt), r_c)
        if not sep_g:
            if Nf:
                g_f = g_f.at[ifr_o].add(
                    jnp.einsum("oci,oc->oi", Jf_c.reshape(CHO, M2, 6),
                               r_c.reshape(CHO, M2)))
            return (Hcc, g_c, g_f, Hff, Cf)
        return (Hcc, Hff, Cf)

    if not sep_g:
        Hcc, g_c, g_f, Hff, Cf = jax.lax.fori_loop(
            0, NobsPad // CHO, chunk_body, (Hcc, g_c, g_f, Hff, Cf))
    else:
        # H blocks in the chunk loop; the GRADIENT outside it, via the
        # tensor-product SEPARABILITY of the B-spline basis:
        #   g_knot[c, y, x, m] = sum_n OHc[n,c] ry[n,y] rx[n,x] f2r[n,m]
        # — two small dense factors (N,Ny)/(N,Nx*2) and one matmul,
        # ~8 MB of traffic vs the 1082-wide rows path's ~150 MB (which
        # previously rebuilt the one-hot rows EVERY iteration just for
        # g: 0.96 ms/iter of the 3.3 ms splined body).  With g out of
        # the loop, XLA dead-code-eliminates the whole rows/H fori_loop
        # on lazy-Hessian non-refresh iterations.  [Earlier rejected
        # variants (round 4) were different formulations: per-corner
        # scatter-adds and a bf16 one-hot contraction over the FULL
        # 1082-wide column space; the separable factorization has
        # neither the scatter nor the wide one-hot.]
        Hcc, Hff, Cf = jax.lax.fori_loop(
            0, NobsPad // CHO, chunk_body, (Hcc, Hff, Cf))
        with jax.default_matmul_precision("float32"):
            f2r = r * f2                                   # (N,2)
            ax = jnp.arange(lm.Nx, dtype=jnp.int32)
            ay = jnp.arange(lm.Ny, dtype=jnp.int32)
            ohx = (ax[None, None, :] ==
                   (ix0[:, None] - 1 + offs[None, :])[:, :, None]
                   ).astype(dt)                            # (N,R,Nx)
            rx = jnp.einsum("nr,nrx->nx", wx_all, ohx)     # (N,Nx)
            ohy = (ay[None, None, :] ==
                   (iy0[:, None] - 1 + offs[None, :])[:, :, None]
                   ).astype(dt)
            ry = jnp.einsum("nr,nry->ny", wy_all, ohy)     # (N,Ny)
            if one_cam:
                rya = ry
            else:
                ohc = (ici_c[:, None] ==
                       jnp.arange(spec.Ncameras_intrinsics)[None, :]
                       ).astype(dt)
                rya = jnp.einsum("nc,ny->ncy", ohc, ry).reshape(
                    N, spec.Ncameras_intrinsics * lm.Ny)
            t_x = rx[:, :, None] * f2r[:, None, :]         # (N,Nx,2)
            gk = jnp.einsum("nY,nxm->Yxm", rya,
                            t_x)                           # (NciNy,Nx,2)
            g_c = g_c.at[:cl.e0].add(gk.reshape(-1))
            gen = jnp.einsum("nri,nr->ni", Je, r)          # (N,6)
            if Nce:
                ohe = (jnp.maximum(ice_c, 0)[:, None] ==
                       jnp.arange(Nce)[None, :]).astype(dt)
                gE = jnp.einsum("ni,ne->ei", gen, ohe)     # (Nce,6)
                g_c = g_c.at[cl.e0:cl.w0].add(gE.reshape(-1))
            g_c = g_c.at[cl.w0:cl.w0 + 2].add(
                jnp.einsum("nri,nr->i", Jwp, r))
            if Nf:
                ohf = (ifr_c[:, None] ==
                       jnp.arange(Nf)[None, :]).astype(dt)
                gfn = jnp.einsum("nri,nr->ni", Jf, r)      # (N,6)
                g_f = g_f.at[:Nf].add(
                    jnp.einsum("ni,nf->fi", gfn, ohf))

    return dict(E=E, g_c=g_c, g_f=g_f, Hcc=Hcc, Hff=Hff, Cf=Cf,
                x_board_rows=r.reshape(Nobs, 2 * Ncorners))


def build_normal_equations_splined(spec: ProblemSpec, arrays_unused,
                                   static_idx):
    """Single-chip splined normal equations: the spline-window MXU
    assembly (_splined_board_ne) with compile-time-constant indices, plus
    the regularization block.  Supports the standard splined
    configuration: intrinsics CORE LOCKED (the reference locks it too:
    the core is redundant with the surface), distortions optimized.
    Other configs fall back to the generic path."""
    s = spec.selections
    cl = _CLayout(spec)

    def f(b, arrays):
        dt = b.dtype
        core = _splined_board_ne(spec, b, arrays,
                                 jnp.asarray(static_idx["board"]))
        E = core["E"]
        g_c = core["g_c"]
        Hcc = core["Hcc"]
        hdt = Hcc.dtype
        Nc = cl.Nc
        x_board = core["x_board_rows"].reshape(-1)

        # ---- regularization (same as generic path) ----
        x_reg = jnp.zeros((0,), dt)
        if spec.num_measurements_regularization:
            params = split_packed_state(b, arrays, spec)
            intr_full = params["intrinsics"]
            iscales = jnp.asarray(_intr_scales(spec), dt)

            def intr_state_packed(row):
                cols = []
                if spec.Ncore_state:
                    cols.append(row[..., :4])
                if s.do_optimize_intrinsics_distortions:
                    cols.append(row[..., spec.Ncore:])
                return jnp.concatenate(cols, axis=-1) / iscales

            targets = jnp.asarray(
                [[(w - 1) * 0.5, (h - 1) * 0.5]
                 for w, h in spec.imagersizes], dt)

            def reg_fn(st, fx_, tg):
                return _reg_per_camera(
                    _merge_intrinsics(st, fx_, spec), spec, dt, tg)

            stp = intr_state_packed(intr_full)
            rreg = jax.vmap(reg_fn)(stp, intr_full, targets)
            Jreg = jax.vmap(jax.jacrev(reg_fn))(stp, intr_full, targets)
            E = E + jnp.sum(rreg * rreg)
            for ci in range(spec.Ncameras_intrinsics):
                i0 = cl.coli(ci)
                if cl.Nip:
                    g_c = g_c.at[i0:i0 + cl.Nip].add(Jreg[ci].T @ rreg[ci])
                    Hcc = Hcc.at[i0:i0 + cl.Nip, i0:i0 + cl.Nip].add(
                        (Jreg[ci].T @ Jreg[ci]).astype(hdt))
            ndist_terms = (spec.Ndistortions
                           if (s.do_apply_regularization
                               and s.do_optimize_intrinsics_distortions)
                           else 0)
            x_reg = jnp.concatenate([
                rreg[:, :ndist_terms].reshape(-1),
                rreg[:, ndist_terms:].reshape(-1)])

        Npv = spec.Npoints_variable
        return dict(E=E, g_c=g_c, g_f=core["g_f"],
                    g_p=jnp.zeros((max(Npv, 1), 3), dt),
                    Hcc=Hcc, Hff=core["Hff"], Cf=core["Cf"],
                    Hpp=jnp.zeros((max(Npv, 1), 3, 3), hdt),
                    Cp=jnp.zeros((max(Npv, 1), 3, Nc), hdt),
                    x_board=x_board,
                    x_point=jnp.zeros((0,), dt),
                    x_tri=jnp.zeros((0,), dt),
                    x_reg=x_reg)

    return f


def _splined_fast_path_ok(spec: ProblemSpec, static_idx):
    """The sparse-window specialization applies to the standard splined
    configuration: boards only, core locked, distortions optimized."""
    return (spec.is_splined
            and spec.Ncore_state == 0
            and spec.selections.do_optimize_intrinsics_distortions
            and spec.Nobservations_point == 0
            and spec.num_measurements_points_triangulated == 0
            and spec.Nobservations_board > 0)


def _corner_residual_machinery(spec: ProblemSpec, arrays, params,
                               intr_packed, ext_pad, frames_packed,
                               warp_packed):
    """Per-corner pose-block + spline-window Jacobians for the standard
    splined configuration (same corner math as
    build_normal_equations_splined; used by the sparse optimizer_callback
    Jacobian, which needs per-row blocks rather than accumulated normal
    equations).  Returns (Jpose dict of (N,2,*), Jwin (N,2,2R^2),
    wincols (N,2R^2) int — columns relative to the intrinsics block)."""
    from ..lensmodels import (splined_window_index, _bspline_weights_cubic,
                              _bspline_weights_quadratic, stereographic_uv)
    lm = spec.lensmodel
    cl = _CLayout(spec)
    R = lm.order + 1
    H_n = spec.calibration_object_height_n
    W_n = spec.calibration_object_width_n
    Ncorners = H_n * W_n
    dt = intr_packed.dtype

    idx = np.asarray(arrays["indices_board"])
    Nobs = idx.shape[0]
    ifr, ici, ice = idx[:, 0], idx[:, 1], idx[:, 2]
    N = Nobs * Ncorners
    cx = np.tile(np.arange(W_n), H_n).astype(np.float64)
    cy = np.repeat(np.arange(H_n), W_n).astype(np.float64)
    ifr_c = jnp.asarray(np.repeat(ifr, Ncorners))
    ici_c = jnp.asarray(np.repeat(ici, Ncorners))
    ice_c = jnp.asarray(np.repeat(ice, Ncorners))
    obs_c = arrays["observations_board"].reshape(N, 3)
    corner_xy = jnp.asarray(np.stack(
        [np.tile(cx, Nobs), np.tile(cy, Nobs)], axis=-1), dt)

    intr_full = params["intrinsics"]
    pose = dict(ext=ext_pad[ice_c + 1],
                frame=frames_packed[ifr_c],
                warp=jnp.broadcast_to(warp_packed, (N, 2)))
    core4 = intr_full[ici_c, :4]
    coeffs = intr_full[:, 4:].reshape(
        spec.Ncameras_intrinsics, lm.Ny, lm.Nx, 2)

    def window_of(pose1, cxy1, ici1):
        rt_joint = _compose_rt2(
            pose1["ext"] * jnp.asarray(_EXT_SCALES, dt),
            pose1["frame"] * jnp.asarray(_FRAME_SCALES, dt))
        if spec.has_calobject_warp:
            warp = pose1["warp"] * jnp.asarray(_WARP_SCALES, dt)
        else:
            warp = params["calobject_warp"]
        xr = cxy1[0] / (W_n - 1)
        yr = cxy1[1] / (H_n - 1)
        z = (warp[0] * 4.0 * xr * (1.0 - xr) +
             warp[1] * 4.0 * yr * (1.0 - yr))
        pt_ref = jnp.stack([cxy1[0] * spec.calibration_object_spacing,
                            cxy1[1] * spec.calibration_object_spacing, z])
        p = _transform_point_rt(rt_joint, pt_ref)
        u = stereographic_uv(p)
        ix0, iy0, _, _ = splined_window_index(u, lm)
        offs = jnp.arange(R, dtype=jnp.int32)
        iyw = iy0 - 1 + offs
        ixw = ix0 - 1 + offs
        win = coeffs[ici1, iyw[:, None], ixw[None, :], :]   # (R,R,2)
        return win, jnp.stack([ix0, iy0])

    win, ixy0 = jax.vmap(window_of)(pose, corner_xy, ici_c)
    ixy0 = jax.lax.stop_gradient(ixy0)

    def corner_fn(pose1, win1, ixy01, cxy1, obs1, core41):
        rt_cam = pose1["ext"] * jnp.asarray(_EXT_SCALES, dt)
        rt_frame = pose1["frame"] * jnp.asarray(_FRAME_SCALES, dt)
        if spec.has_calobject_warp:
            warp = pose1["warp"] * jnp.asarray(_WARP_SCALES, dt)
        else:
            warp = params["calobject_warp"]
        xr = cxy1[0] / (W_n - 1)
        yr = cxy1[1] / (H_n - 1)
        z = (warp[0] * 4.0 * xr * (1.0 - xr) +
             warp[1] * 4.0 * yr * (1.0 - yr))
        pt_ref = jnp.stack([cxy1[0] * spec.calibration_object_spacing,
                            cxy1[1] * spec.calibration_object_spacing, z])
        rt_joint = _compose_rt2(rt_cam, rt_frame)
        p = _transform_point_rt(rt_joint, pt_ref)
        u = stereographic_uv(p)
        spu = lm.segments_per_u
        ix = u[0] * spu + (lm.Nx - 1) / 2.0
        iy = u[1] * spu + (lm.Ny - 1) / 2.0
        tx = ix - ixy01[0]
        ty = iy - ixy01[1]
        wts = (_bspline_weights_cubic if lm.order == 3
               else _bspline_weights_quadratic)
        du = jnp.einsum("i,j,ijk->k", wts(ty), wts(tx), win1)
        fx, fy, cx_, cy_ = core41[0], core41[1], core41[2], core41[3]
        q = jnp.stack([(u[0] + du[0]) * fx + cx_,
                       (u[1] + du[1]) * fy + cy_])
        w = jnp.maximum(obs1[2], 0.0)
        return (q - obs1[:2]) * w

    Jpose = jax.vmap(jax.jacrev(corner_fn, argnums=0))(
        pose, win, ixy0, corner_xy, obs_c, core4)
    Jwin = jax.vmap(jax.jacrev(corner_fn, argnums=1))(
        pose, win, ixy0, corner_xy, obs_c, core4).reshape(N, 2, R * R * 2)

    offs = jnp.arange(R, dtype=jnp.int32)
    iyw = ixy0[:, 1:2] - 1 + offs[None, :]
    ixw = ixy0[:, 0:1] - 1 + offs[None, :]
    flat = (iyw[:, :, None] * lm.Nx + ixw[:, None, :])
    wincols = ici_c[:, None, None, None] * cl.Nip + \
        (2 * flat)[..., None] + jnp.arange(2, dtype=jnp.int32)
    return Jpose, Jwin, wincols.reshape(N, R * R * 2)
