"""Observation-sharded bundle adjustment over a jax.sharding.Mesh.

The reference has NO parallelism at all (single-threaded C; SURVEY §2.4) —
this module is the net-new TPU-native scaling layer:

  - the observation axis (frames x cameras) is sharded over the mesh's
    'obs' axis (DP-analog);
  - each device computes residuals + per-observation Jacobian blocks for
    its shard and accumulates LOCAL normal-equation blocks;
  - the small reduced blocks (camera-system Hcc/g_c, per-frame 6x6 blocks,
    per-point 3x3 blocks) are psum'd over ICI — a few MB per LM iteration;
  - the Schur reduction + dense solve runs replicated (it's tiny compared
    to the Jacobian work).

The per-observation assembly here uses dynamic scatter-adds (SPMD-uniform —
no per-shard static grouping), so the same program runs on every device.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .. import _xla  # noqa: F401
from ..optimize import layout as _layout
from ..optimize.layout import ProblemSpec
from ..optimize.solver import (_CLayout, _make_board_fn, _make_point_fn,
                               _make_board_corner_fn, _use_corner_jacobian,
                               _pair_block, _pair_gvec,
                               _intr_scales, _EXT_SCALES, _FRAME_SCALES,
                               _WARP_SCALES, _POINT_SCALES,
                               _reg_per_camera, schur_step, _delta_to_b)
from ..optimize.residuals import split_packed_state

_seg = jax.ops.segment_sum


def make_mesh(n_devices=None, axis="obs"):
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def _local_normal_equations_splined(spec: ProblemSpec, b, arrays,
                                    mask_board):
    """Splined fast path for the sharded assembly: each device runs the
    chunked one-hot MXU spline-window assembly (solver._splined_board_ne)
    on ITS observation shard, so the canonical 30x18 splined problem
    shards without the generic path's ~GB cross-corner jacrev
    intermediate.  The psum'd blocks are identical to the single-chip
    build_normal_equations_splined.  Applicable under
    _splined_fast_path_ok (boards only, core locked): the point/tri
    blocks are structurally empty."""
    from ..optimize.solver import _splined_board_ne
    core = _splined_board_ne(spec, b, arrays, arrays["indices_board"],
                             mask_board)
    dt = b.dtype
    hdt = core["Hcc"].dtype
    cl = _CLayout(spec)
    Npv = spec.Npoints_variable
    return dict(
        E=core["E"], g_c=core["g_c"], g_f=core["g_f"],
        g_p=jnp.zeros((max(Npv, 1), 3), dt),
        Hcc=core["Hcc"], Hff=core["Hff"], Cf=core["Cf"],
        Hpp=jnp.zeros((max(Npv, 1), 3, 3), hdt),
        Cp=jnp.zeros((max(Npv, 1), 3, cl.Nc), hdt),
        x_board=core["x_board_rows"],
        x_point=jnp.zeros((arrays["observations_point"].shape[0]
                           if spec.Nobservations_point else 0, 2), dt),
        x_tri=jnp.zeros((arrays["tri_v0"].shape[0]
                         if "tri_v0" in arrays else 0,), dt))


def _local_normal_equations(spec: ProblemSpec, b, arrays, mask_board,
                            mask_point):
    """Normal-equation blocks from the LOCAL observation shard.  Pure SPMD
    function: every contribution lands via dynamic scatter-add keyed by the
    shard's index arrays.  mask_board/mask_point multiply residual rows
    (used to zero out padding observations)."""
    from ..optimize.solver import _use_splined_sparse
    if _use_splined_sparse(spec):
        return _local_normal_equations_splined(spec, b, arrays, mask_board)
    s = spec.selections
    cl = _CLayout(spec)
    Nf = spec.Nframes
    Npv = spec.Npoints_variable
    dt = b.dtype

    params = split_packed_state(b, arrays, spec)
    intr_full = params["intrinsics"]
    iscales = jnp.asarray(_intr_scales(spec), dt)

    def intr_state_packed(intr_rows):
        cols = []
        if spec.Ncore_state:
            cols.append(intr_rows[..., :4])
        if s.do_optimize_intrinsics_distortions:
            cols.append(intr_rows[..., spec.Ncore:])
        if not cols:
            return jnp.zeros(intr_rows.shape[:-1] + (0,), dt)
        return jnp.concatenate(cols, axis=-1) / iscales

    intr_packed = intr_state_packed(intr_full)
    ext_packed = params["extrinsics"] / jnp.asarray(_EXT_SCALES, dt)
    ext_pad = jnp.concatenate([jnp.zeros((1, 6), dt), ext_packed], axis=0)
    frames_packed = params["frames"] / jnp.asarray(_FRAME_SCALES, dt)
    warp_packed = params["calobject_warp"] / jnp.asarray(_WARP_SCALES, dt)

    Nc = cl.Nc
    E = jnp.zeros((), dt)
    g_c = jnp.zeros(Nc, dt)
    Hcc = jnp.zeros((Nc, Nc), dt)
    g_f = jnp.zeros((max(Nf, 1), 6), dt)
    Hff = jnp.zeros((max(Nf, 1), 6, 6), dt)
    Cf = jnp.zeros((max(Nf, 1), 6, Nc), dt)
    g_p = jnp.zeros((max(Npv, 1), 3), dt)
    Hpp = jnp.zeros((max(Npv, 1), 3, 3), dt)
    Cp = jnp.zeros((max(Npv, 1), 3, Nc), dt)
    # residual ROWS of the local shard (padded rows zero); the caller keeps
    # these sharded over the observation axis
    x_board_rows = jnp.zeros((arrays["observations_board"].shape[0]
                              if spec.Nobservations_board else 0,
                              2 * spec.calibration_object_height_n *
                              spec.calibration_object_width_n), dt)
    x_point_rows = jnp.zeros((arrays["observations_point"].shape[0]
                              if spec.Nobservations_point else 0, 2), dt)
    x_tri_rows = jnp.zeros((arrays["tri_v0"].shape[0]
                            if "tri_v0" in arrays else 0,), dt)

    if spec.Nobservations_board and arrays["observations_board"].shape[0]:
        idx = arrays["indices_board"]
        ifr, ici, ice = idx[:, 0], idx[:, 1], idx[:, 2]
        Nobs_l = idx.shape[0]
        blocks = dict(intr=intr_packed[ici], ext=ext_pad[ice + 1],
                      frame=frames_packed[ifr],
                      warp=jnp.broadcast_to(warp_packed, (Nobs_l, 2)))
        obs = arrays["observations_board"]
        ifx = intr_full[ici]
        if _use_corner_jacobian(spec):
            # residual + Jacobian in ONE vjp per corner (2 cotangents),
            # same formulation as the unsharded fast path in
            # solver.build_normal_equations.  The old whole-observation
            # jacrev rode 2*H*W cotangents through the projection chain
            # — measured 9-15x slower per iteration on the v5e at mesh=1
            # (round-5 tpu_mesh1_overhead), which silently inflated the
            # sharded path's compute baseline.
            corner_fn = _make_board_corner_fn(spec)
            Hn = spec.calibration_object_height_n
            Wn = spec.calibration_object_width_n
            _xg, _yg = np.meshgrid(np.arange(Wn, dtype=np.float64),
                                   np.arange(Hn, dtype=np.float64))
            cxy_all = jnp.asarray(
                np.stack([_xg, _yg], axis=-1).reshape(-1, 2), dt)

            def obs_rj(blk, ob, ifx1, wf):
                obs_flat = ob.reshape(-1, 3)

                def per_corner(cxy, oc):
                    rr, pull = jax.vjp(
                        lambda bl: corner_fn(bl, cxy, oc, ifx1, wf), blk)
                    (Jd,) = jax.vmap(pull)(jnp.eye(2, dtype=rr.dtype))
                    return rr, Jd                          # (2,), dict

                return jax.vmap(per_corner)(cxy_all, obs_flat)

            r2, J2 = jax.vmap(obs_rj, in_axes=(0, 0, 0, None))(
                blocks, obs, ifx, params["calobject_warp"])
            M = r2.shape[1] * 2                            # 2*H*W
            r = r2.reshape(Nobs_l, M)
            J = {k: v.reshape(Nobs_l, M, v.shape[-1])
                 for k, v in J2.items()}
        else:
            board_fn = _make_board_fn(spec)
            r = jax.vmap(board_fn, in_axes=(0, 0, 0, None))(
                blocks, obs, ifx, params["calobject_warp"])
            J = jax.vmap(jax.jacrev(board_fn), in_axes=(0, 0, 0, None))(
                blocks, obs, ifx, params["calobject_warp"])
        r = r * mask_board[:, None]
        Ji = J["intr"] * mask_board[:, None, None] \
            if spec.Nintrinsics_state_per_cam else jnp.zeros_like(J["intr"])
        Je = J["ext"] * (mask_board *
                         (ice >= 0).astype(dt))[:, None, None] \
            if s.do_optimize_extrinsics else jnp.zeros_like(J["ext"])
        Jf = J["frame"] * mask_board[:, None, None] \
            if s.do_optimize_frames else jnp.zeros_like(J["frame"])
        Jw = J["warp"] * mask_board[:, None, None] \
            if spec.has_calobject_warp else jnp.zeros_like(J["warp"])

        E = E + jnp.sum(r * r)
        x_board_rows = r

        # one-hot pair-contraction assembly: every camera-system block
        # lands as (one-hot^T @ per-obs-block) MXU matmuls + ONE static
        # placement.  The previous dynamic-column scatter-adds were 3x
        # the entire NE evaluation on the v5e (round-5 probe: rig16cam
        # 1.28 ms unsharded vs 3.95 ms with scatters; shard_map/psum
        # mechanics themselves are free).  An out-of-range id (ice=-1,
        # camera at the reference) one-hots to a zero row, so those
        # contributions vanish exactly as the old masking did.
        Pi = jax.nn.one_hot(ici, max(cl.Nci, 1), dtype=dt)
        Pe = jax.nn.one_hot(ice, max(cl.Nce, 1), dtype=dt)
        P1 = jnp.ones((Nobs_l, 1), dt)

        if cl.Nip:
            g_c = g_c.at[:cl.e0].add(_pair_gvec(Pi, Ji, r))
        if cl.Nce:
            g_c = g_c.at[cl.e0:cl.w0].add(_pair_gvec(Pe, Je, r))
        g_c = g_c.at[cl.w0:cl.w0 + 2].add(jnp.einsum("omi,om->i", Jw, r))
        if Nf:
            g_f = g_f.at[:Nf].add(
                _seg(jnp.einsum("omi,om->oi", Jf, r), ifr, num_segments=Nf))
            Hff = Hff.at[:Nf].add(
                _seg(jnp.einsum("omi,omj->oij", Jf, Jf), ifr,
                     num_segments=Nf))

        if cl.Nip:
            Hcc = Hcc.at[:cl.e0, :cl.e0].add(_pair_block(Pi, Pi, Ji, Ji))
            if cl.Nce:
                Bie = _pair_block(Pi, Pe, Ji, Je)
                Hcc = Hcc.at[:cl.e0, cl.e0:cl.w0].add(Bie)
                Hcc = Hcc.at[cl.e0:cl.w0, :cl.e0].add(Bie.T)
            Biw = _pair_block(Pi, P1, Ji, Jw)
            Hcc = Hcc.at[:cl.e0, cl.w0:cl.w0 + 2].add(Biw)
            Hcc = Hcc.at[cl.w0:cl.w0 + 2, :cl.e0].add(Biw.T)
        if cl.Nce:
            Hcc = Hcc.at[cl.e0:cl.w0, cl.e0:cl.w0].add(
                _pair_block(Pe, Pe, Je, Je))
            Bew = _pair_block(Pe, P1, Je, Jw)
            Hcc = Hcc.at[cl.e0:cl.w0, cl.w0:cl.w0 + 2].add(Bew)
            Hcc = Hcc.at[cl.w0:cl.w0 + 2, cl.e0:cl.w0].add(Bew.T)
        Hcc = Hcc.at[cl.w0:cl.w0 + 2, cl.w0:cl.w0 + 2].add(
            jnp.einsum("omi,omj->ij", Jw, Jw))

        if Nf:
            # frame-cross rows: expand the column block by the camera
            # one-hot (static column range), then ONE segment-sum over
            # the frame axis — the same structure the unsharded path
            # uses, no dynamic-column scatter
            def cf_block(JB, PB):
                blk = jnp.einsum("omi,omj->oij", Jf, JB)   # (o,6,nB)
                ex = (PB[:, None, :, None] *
                      blk[:, :, None, :]).reshape(Nobs_l, 6, -1)
                return _seg(ex, ifr, num_segments=Nf)

            if cl.Nip:
                Cf = Cf.at[:, :, :cl.e0].add(cf_block(Ji, Pi))
            if cl.Nce:
                Cf = Cf.at[:, :, cl.e0:cl.w0].add(cf_block(Je, Pe))
            Cf = Cf.at[:, :, cl.w0:cl.w0 + 2].add(
                _seg(jnp.einsum("omi,omj->oij", Jf, Jw), ifr,
                     num_segments=Nf))

    if spec.Nobservations_point and arrays["observations_point"].shape[0]:
        idx = arrays["indices_point"]
        ipt, ici, ice = idx[:, 0], idx[:, 1], idx[:, 2]
        mask_p = mask_point
        points_packed = params["points"] / jnp.asarray(_POINT_SCALES, dt)
        blocks = dict(intr=intr_packed[ici], ext=ext_pad[ice + 1],
                      point=points_packed[ipt])
        obs = arrays["observations_point"]
        ifx = intr_full[ici]
        point_fn = _make_point_fn(spec)
        r = jax.vmap(point_fn)(blocks, obs, ifx) * mask_p[:, None]
        J = jax.vmap(jax.jacrev(point_fn))(blocks, obs, ifx)
        Ji = J["intr"] * mask_p[:, None, None] \
            if spec.Nintrinsics_state_per_cam else jnp.zeros_like(J["intr"])
        Je = J["ext"] * (mask_p * (ice >= 0).astype(dt))[:, None, None] \
            if s.do_optimize_extrinsics else jnp.zeros_like(J["ext"])
        Jp = J["point"] * (mask_p * (ipt < Npv).astype(dt))[:, None, None] \
            if (s.do_optimize_frames and Npv) else jnp.zeros_like(J["point"])
        E = E + jnp.sum(r * r)
        x_point_rows = r
        Nobs_lp = idx.shape[0]
        # same one-hot pair-contraction assembly as the board section
        Pi = jax.nn.one_hot(ici, max(cl.Nci, 1), dtype=dt)
        Pe = jax.nn.one_hot(ice, max(cl.Nce, 1), dtype=dt)

        if cl.Nip:
            g_c = g_c.at[:cl.e0].add(_pair_gvec(Pi, Ji, r))
            Hcc = Hcc.at[:cl.e0, :cl.e0].add(_pair_block(Pi, Pi, Ji, Ji))
            if cl.Nce:
                Bie = _pair_block(Pi, Pe, Ji, Je)
                Hcc = Hcc.at[:cl.e0, cl.e0:cl.w0].add(Bie)
                Hcc = Hcc.at[cl.e0:cl.w0, :cl.e0].add(Bie.T)
        if cl.Nce:
            g_c = g_c.at[cl.e0:cl.w0].add(_pair_gvec(Pe, Je, r))
            Hcc = Hcc.at[cl.e0:cl.w0, cl.e0:cl.w0].add(
                _pair_block(Pe, Pe, Je, Je))
        if Npv:
            ipt_c = jnp.clip(ipt, 0, Npv - 1)
            g_p = g_p.at[:Npv].add(
                _seg(jnp.einsum("omi,om->oi", Jp, r), ipt_c,
                     num_segments=Npv))
            Hpp = Hpp.at[:Npv].add(
                _seg(jnp.einsum("omi,omj->oij", Jp, Jp), ipt_c,
                     num_segments=Npv))

            # point-cross rows: camera one-hot expansion + ONE
            # segment-sum over the point axis (no dynamic-column scatter)
            def cp_block(JB, PB):
                blk = jnp.einsum("omi,omj->oij", Jp, JB)   # (o,3,nB)
                ex = (PB[:, None, :, None] *
                      blk[:, :, None, :]).reshape(Nobs_lp, 3, -1)
                return _seg(ex, ipt_c, num_segments=Npv)

            if cl.Nip:
                Cp = Cp.at[:, :, :cl.e0].add(cp_block(Ji, Pi))
            if cl.Nce:
                Cp = Cp.at[:, :, cl.e0:cl.w0].add(cp_block(Je, Pe))

    if "tri_v0" in arrays and arrays["tri_v0"].shape[0]:
        # triangulated-point pairwise measurements: touch ONLY extrinsics
        # (intrinsics fixed; observation directions pre-unprojected).
        # Pair data is pre-gathered host-side and sharded over the pair axis.
        from ..triangulation import _triangulated_error
        from ..poseutils import _rotate_point_r
        v0 = arrays["tri_v0"]
        v1 = arrays["tri_v1"]
        tice0 = arrays["tri_ice0"]
        tice1 = arrays["tri_ice1"]
        tmask = arrays["tri_mask"]

        def tri_fn(e0p, e1p, v0_1, v1_1):
            sc = jnp.asarray(_EXT_SCALES, dt)
            rt_0r = e0p * sc
            rt_1r = e1p * sc
            v0_ref = _rotate_point_r(rt_0r[:3], v0_1, inverted=True)
            t_r0 = -_rotate_point_r(rt_0r[:3], rt_0r[3:], inverted=True)
            v0_cam1 = _rotate_point_r(rt_1r[:3], v0_ref)
            t_10 = _rotate_point_r(rt_1r[:3], t_r0) + rt_1r[3:]
            return _triangulated_error(v1_1, v0_cam1, t_10)

        e0g = ext_pad[tice0 + 1]
        e1g = ext_pad[tice1 + 1]
        r = jax.vmap(tri_fn)(e0g, e1g, v0, v1) * tmask
        E = E + jnp.sum(r * r)
        x_tri_rows = r
        if s.do_optimize_extrinsics and spec.Ncameras_extrinsics:
            J0 = jax.vmap(jax.grad(tri_fn, argnums=0))(e0g, e1g, v0, v1)
            J1 = jax.vmap(jax.grad(tri_fn, argnums=1))(e0g, e1g, v0, v1)
            J0 = J0 * (tmask * (tice0 >= 0).astype(dt))[:, None]
            J1 = J1 * (tmask * (tice1 >= 0).astype(dt))[:, None]
            # dense per-pair rows via one-hot outer products (MXU
            # matmuls), the same formulation as the unsharded path
            # (solver.build_normal_equations triangulated block); the
            # reference-camera column (tice=-1 -> slot 0) is dropped
            Nce1 = cl.Nce + 1
            O0 = jax.nn.one_hot(tice0 + 1, Nce1, dtype=dt)
            O1 = jax.nn.one_hot(tice1 + 1, Nce1, dtype=dt)
            Jrow = (O0[:, :, None] * J0[:, None, :]
                    + O1[:, :, None] * J1[:, None, :]).reshape(
                r.shape[0], 6 * Nce1)[:, 6:]
            Hcc = Hcc.at[cl.e0:cl.w0, cl.e0:cl.w0].add(Jrow.T @ Jrow)
            g_c = g_c.at[cl.e0:cl.w0].add(Jrow.T @ r)

    return dict(E=E, g_c=g_c, g_f=g_f, g_p=g_p, Hcc=Hcc, Hff=Hff, Cf=Cf,
                Hpp=Hpp, Cp=Cp,
                x_board=x_board_rows, x_point=x_point_rows,
                x_tri=x_tri_rows)


def _reg_contrib(spec: ProblemSpec, b, arrays):
    """Regularization contributions (replicated; tiny)."""
    cl = _CLayout(spec)
    dt = b.dtype
    s = spec.selections
    params = split_packed_state(b, arrays, spec)
    if not spec.num_measurements_regularization:
        z = jnp.zeros((), dt)
        return dict(E=z, g_c=jnp.zeros(cl.Nc, dt),
                    Hcc=jnp.zeros((cl.Nc, cl.Nc), dt),
                    x_reg=jnp.zeros((0,), dt))
    iscales = jnp.asarray(_intr_scales(spec), dt)

    def intr_state_packed(row):
        cols = []
        if spec.Ncore_state:
            cols.append(row[..., :4])
        if s.do_optimize_intrinsics_distortions:
            cols.append(row[..., spec.Ncore:])
        if not cols:
            return jnp.zeros(row.shape[:-1] + (0,), dt)
        return jnp.concatenate(cols, axis=-1) / iscales

    from ..optimize.solver import _merge_intrinsics
    targets = jnp.asarray(
        [[(w - 1) * 0.5, (h - 1) * 0.5] for w, h in spec.imagersizes], dt)

    def reg_fn(st, fx, tg):
        return _reg_per_camera(_merge_intrinsics(st, fx, spec), spec, dt, tg)

    stp = intr_state_packed(params["intrinsics"])
    r = jax.vmap(reg_fn)(stp, params["intrinsics"], targets)
    J = jax.vmap(jax.jacrev(reg_fn))(stp, params["intrinsics"], targets)
    E = jnp.sum(r * r)
    g_c = jnp.zeros(cl.Nc, dt)
    Hcc = jnp.zeros((cl.Nc, cl.Nc), dt)
    for ci in range(spec.Ncameras_intrinsics):
        i0 = cl.coli(ci)
        if cl.Nip:
            g_c = g_c.at[i0:i0 + cl.Nip].add(J[ci].T @ r[ci])
            Hcc = Hcc.at[i0:i0 + cl.Nip, i0:i0 + cl.Nip].add(J[ci].T @ J[ci])
    # reference measurement ordering: ALL distortion terms, then ALL
    # centerpixel terms, then the unity_cam01 row (mrcal.c:5707-5900)
    ndist_terms = (spec.Ndistortions
                   if (s.do_apply_regularization
                       and s.do_optimize_intrinsics_distortions)
                   else 0)
    x_reg = jnp.concatenate([r[:, :ndist_terms].reshape(-1),
                             r[:, ndist_terms:].reshape(-1)])
    if (s.do_apply_regularization_unity_cam01 and s.do_optimize_extrinsics
            and spec.Ncameras_extrinsics > 0):
        from ..optimize import layout as _lay
        ext_packed = params["extrinsics"] / jnp.asarray(_EXT_SCALES, dt)

        def unity_fn(e0p):
            t0 = e0p[3:] * _lay.SCALE_TRANSLATION_CAMERA
            return (0.1 / 0.01) * (jnp.sum(t0 * t0) - 1.0)

        ru = unity_fn(ext_packed[0])
        Ju = jax.grad(unity_fn)(ext_packed[0])
        E = E + ru * ru
        e0 = cl.cole(0)
        g_c = g_c.at[e0:e0 + 6].add(Ju * ru)
        Hcc = Hcc.at[e0:e0 + 6, e0:e0 + 6].add(jnp.outer(Ju, Ju))
        x_reg = jnp.concatenate([x_reg, ru[None]])
    return dict(E=E, g_c=g_c, Hcc=Hcc, x_reg=x_reg)


def sharded_normal_equations(spec: ProblemSpec, mesh, axis="obs"):
    """Build the sharded normal-equation function: observation arrays shard
    over `axis`, the block outputs are psum'd over ICI, and the (tiny)
    regularization contribution is added replicated."""
    from jax import shard_map

    def make(arrays):
        nonrep = dict(arrays)

        # check_vma=False: with vma tracking on, reverse-mode AD w.r.t. the
        # replicated parameter blocks auto-inserts a psum inside the local
        # jacrev, double-counting once we psum the accumulated blocks
        @partial(shard_map, mesh=mesh,
                 in_specs=(P(), P(axis), P(axis), P(axis),
                           P(axis), P(axis), P(axis),
                           P(axis), P(axis), P(axis), P(axis), P(axis)),
                 out_specs=P(), check_vma=False)
        def fn(b, obs_board, idx_board, mask_b, obs_point, idx_point,
               mask_p, tri_v0, tri_v1, tri_ice0, tri_ice1, tri_mask):
            arr = dict(nonrep)
            arr["observations_board"] = obs_board
            arr["indices_board"] = idx_board
            arr["observations_point"] = obs_point
            arr["indices_point"] = idx_point
            arr["tri_v0"] = tri_v0
            arr["tri_v1"] = tri_v1
            arr["tri_ice0"] = tri_ice0
            arr["tri_ice1"] = tri_ice1
            arr["tri_mask"] = tri_mask
            ne = _local_normal_equations(spec, b, arr, mask_b, mask_p)
            for k in ("x_board", "x_point", "x_tri"):
                ne.pop(k)           # legacy API: blocks only, all P()
            ne = jax.tree.map(partial(jax.lax.psum, axis_name=axis), ne)
            reg = _reg_contrib(spec, b, arr)
            ne["E"] = ne["E"] + reg["E"]
            ne["g_c"] = ne["g_c"] + reg["g_c"]
            # keep Hcc in the assembly's dtype (splined f64-polish H is f32)
            ne["Hcc"] = ne["Hcc"] + reg["Hcc"].astype(ne["Hcc"].dtype)
            return ne

        return fn

    return make


def collective_bytes_per_iteration(spec: ProblemSpec, dtype=np.float64):
    """Bytes all-reduced (psum'd) over the mesh per LM iteration by the
    production sharded solver: the normal-equation BLOCKS are reduced,
    never the Jacobian (SURVEY §2.4 — camera-system Hcc/g_c plus the
    per-frame/per-point elimination blocks).  The residual ROWS stay
    sharded (out_specs P(axis)) and cost nothing.

    Returns (total_bytes, breakdown dict).  This is the comm side of the
    compute/comm scaling model in bench_scaling.py."""
    cl = _CLayout(spec)
    Nc = cl.Nc
    Nf = max(spec.Nframes, 1)
    Npv = max(spec.Npoints_variable, 1)
    itemsize = np.dtype(dtype).itemsize
    # the splined f64 polish keeps its H/C blocks in f32
    # (MRCAL_TPU_SPLINED_F64_H32) — only the gradients ride in f64
    h_itemsize = (4 if (spec.is_splined
                        and np.dtype(dtype).itemsize == 8)
                  else itemsize)
    breakdown = dict(
        E=1, g_c=Nc, g_f=Nf * 6, g_p=Npv * 3,
        Hcc=Nc * Nc, Hff=Nf * 36, Cf=Nf * 6 * Nc,
        Hpp=Npv * 9, Cp=Npv * 3 * Nc)
    nbytes = {k: v * (h_itemsize if k[0] in "HC" else itemsize)
              for k, v in breakdown.items()}
    return sum(nbytes.values()), nbytes


def _pad_to(n, k):
    return (n + k - 1) // k * k


def sharded_lm_step(spec: ProblemSpec, mesh, axis="obs"):
    """One jitted LM iteration over the mesh: normal equations (sharded) +
    Schur solve (replicated)."""
    def make(arrays):
        ne_fn = sharded_normal_equations(spec, mesh, axis=axis)(arrays)

        @jax.jit
        def step(b, obs_board, idx_board, mask_b, obs_point, idx_point,
                 mask_p, tv0, tv1, te0, te1, tm, lam):
            ne = ne_fn(b, obs_board, idx_board, mask_b,
                       obs_point, idx_point, mask_p,
                       tv0, tv1, te0, te1, tm)
            dc, df, dp, pred = schur_step(ne, lam, spec)
            db = _delta_to_b(dc, df, dp, spec)
            return b + db, ne["E"], pred, db

        return step

    return make


def _padded_shard_arrays(arrays, n_dev):
    """Pad the observation arrays to a multiple of the mesh size; padding
    rows carry mask=0 (their residual rows vanish, preserving the math).
    Float dtypes follow the input arrays (f32 solves stay f32)."""
    fdt = np.asarray(arrays["observations_board"]).dtype \
        if np.asarray(arrays["observations_board"]).size else \
        np.asarray(arrays["intrinsics"]).dtype
    obs = np.asarray(arrays["observations_board"])
    idx = np.asarray(arrays["indices_board"])
    Nobs = obs.shape[0]
    Npad = _pad_to(max(Nobs, 1), n_dev) if Nobs else n_dev
    shp = obs.shape[1:] if Nobs else (1, 1, 3)
    obs_p = np.zeros((Npad,) + shp, fdt)
    idx_p = np.zeros((Npad, 3), np.int32)
    mask_b = np.zeros(Npad, fdt)
    if Nobs:
        obs_p[:Nobs] = obs
        idx_p[:Nobs] = idx
        mask_b[:Nobs] = 1.0

    obsp = np.asarray(arrays["observations_point"])
    idxp = np.asarray(arrays["indices_point"])
    Np = obsp.shape[0]
    Nppad = _pad_to(max(Np, 1), n_dev) if Np else n_dev
    obsp_p = np.zeros((Nppad, 3), fdt)
    idxp_p = np.zeros((Nppad, 3), np.int32)
    mask_p = np.zeros(Nppad, fdt)
    if Np:
        obsp_p[:Np] = obsp
        idxp_p[:Np] = idxp
        mask_p[:Np] = 1.0

    # triangulated pairs (pre-gathered so the PAIR axis shards)
    px = np.asarray(arrays.get("px_triangulated",
                               np.zeros((0, 3))))
    if px.shape[0]:
        from ..optimize.layout import triangulated_pair_indices
        from ..optimize.layout import _triangulated_set_sizes
        idxt = np.asarray(arrays["indices_triangulated"])
        w = np.asarray(arrays["observations_point_triangulated"])[:, 2]
        sizes = _triangulated_set_sizes(idxt)
        i0, i1 = triangulated_pair_indices(sizes)
        Ntp = len(i0)
        Ntpad = _pad_to(max(Ntp, 1), n_dev)
        tv0 = np.zeros((Ntpad, 3), fdt)
        tv1 = np.zeros((Ntpad, 3), fdt)
        tv0[:Ntp] = px[i0]
        tv1[:Ntp] = px[i1]
        te0 = np.zeros(Ntpad, np.int32)
        te1 = np.zeros(Ntpad, np.int32)
        te0[:Ntp] = idxt[i0, 2]
        te1[:Ntp] = idxt[i1, 2]
        tm = np.zeros(Ntpad, fdt)
        tm[:Ntp] = ((w[i0] > 0) & (w[i1] > 0)).astype(float)
        # padding rows: v0 == v1 would produce NaN in the error; give them
        # benign geometry (masked anyway)
        tv0[Ntp:] = [0, 0, 1.0]
        tv1[Ntp:] = [0.1, 0, 1.0]
    else:
        Ntpad = n_dev
        tv0 = np.tile(np.asarray([0, 0, 1.0], fdt), (Ntpad, 1))
        tv1 = np.tile(np.asarray([0.1, 0, 1.0], fdt), (Ntpad, 1))
        te0 = np.zeros(Ntpad, np.int32)
        te1 = np.zeros(Ntpad, np.int32)
        tm = np.zeros(Ntpad, fdt)
    return tuple(jnp.asarray(a) for a in
                 (obs_p, idx_p, mask_b, obsp_p, idxp_p, mask_p,
                  tv0, tv1, te0, te1, tm))


# ----------------------------------------------------------------------------
# PRODUCTION sharded solver: device-resident while_loop, psum per iteration
# ----------------------------------------------------------------------------

_SHARDED_SOLVER_CACHE = {}


def _make_sharded_ne_fn(spec: ProblemSpec, mesh, axis="obs"):
    """ne_fn(b, (rep, sh)) for the device-resident LM while_loop: ONE
    shard_map'd normal-equation evaluation per call.  Block outputs are
    psum'd over ICI (a few MB per LM iteration); residual ROWS stay
    sharded over the observation axis (carried through the loop, consumed
    by outlier rejection at the end)."""
    from jax import shard_map

    out_specs = dict(E=P(), g_c=P(), g_f=P(), g_p=P(), Hcc=P(), Hff=P(),
                     Cf=P(), Hpp=P(), Cp=P(),
                     x_board=P(axis), x_point=P(axis), x_tri=P(axis),
                     x_reg=P())

    @partial(shard_map, mesh=mesh, in_specs=(P(), P(), P(axis)),
             out_specs=out_specs, check_vma=False)
    def fn(b, rep, sh):
        arr = dict(rep)
        arr["observations_board"] = sh["obs_board"]
        arr["indices_board"] = sh["idx_board"]
        arr["observations_point"] = sh["obs_point"]
        arr["indices_point"] = sh["idx_point"]
        arr["tri_v0"] = sh["tv0"]
        arr["tri_v1"] = sh["tv1"]
        arr["tri_ice0"] = sh["te0"]
        arr["tri_ice1"] = sh["te1"]
        arr["tri_mask"] = sh["tm"]
        ne = _local_normal_equations(spec, b, arr, sh["mask_b"],
                                     sh["mask_p"])
        x = {k: ne.pop(k) for k in ("x_board", "x_point", "x_tri")}
        ne = jax.tree.map(partial(jax.lax.psum, axis_name=axis), ne)
        reg = _reg_contrib(spec, b, arr)          # replicated, tiny
        ne["E"] = ne["E"] + reg["E"]
        ne["g_c"] = ne["g_c"] + reg["g_c"]
        # keep Hcc in the assembly's dtype (splined f64-polish H is f32)
        ne["Hcc"] = ne["Hcc"] + reg["Hcc"].astype(ne["Hcc"].dtype)
        ne.update(x)
        ne["x_reg"] = reg["x_reg"]
        return ne

    def ne_fn(b, arrays):
        rep, sh = arrays
        return fn(b, rep, sh)

    return ne_fn


def _shard_arrays_for_device_solver(arrays, n_dev):
    """(replicated, sharded) pytrees for sharded_lm_solve_device."""
    (obs_p, idx_p, mask_b, obsp_p, idxp_p, mask_p,
     tv0, tv1, te0, te1, tm) = _padded_shard_arrays(arrays, n_dev)
    rep = {k: jnp.asarray(arrays[k])
           for k in ("intrinsics", "extrinsics", "frames", "points",
                     "calobject_warp")}
    sh = dict(obs_board=obs_p, idx_board=idx_p, mask_b=mask_b,
              obs_point=obsp_p, idx_point=idxp_p, mask_p=mask_p,
              tv0=tv0, tv1=tv1, te0=te0, te1=te1, tm=tm)
    return rep, sh


def sharded_lm_solve_device(spec: ProblemSpec, arrays, b0, mesh,
                            max_iterations=300, update_threshold=1e-7,
                            dtype=None, quiet=False, lam0=1e-4, ftol=None,
                            axis="obs"):
    """PRODUCTION multi-chip solve: the device-resident trust-region LM
    while_loop (IDENTICAL body to the single-chip lm_solve_device — gain
    ratio, windowed ftol plateau, dynamic iteration bounds) with the
    normal equations evaluated via shard_map over the mesh's observation
    axis.  One NE evaluation and one small psum'd block reduction per LM
    iteration; the Schur solve runs replicated.

    Same return contract as lm_solve_device: (b, E, niter, ne) with
    unpadded residual vectors in ne — so optimize()'s outlier-rejection
    outer loop and mixed-precision pipeline work unchanged on a mesh."""
    from ..optimize.solver import (_make_device_lm, _cast_arrays,
                                   _effective_threshold,
                                   _run_device_lm_chunked,
                                   _use_chunked_dispatch,
                                   _matmul_precision_ctx)
    from ..optimize.solver import _use_splined_sparse
    n_dev = mesh.devices.size
    if spec.is_splined and not _use_splined_sparse(spec):
        # non-standard splined configs (core optimized, point obs, ...)
        # fall back to the generic per-observation jacrev, whose board
        # jacrev materializes a cross-corner intermediate of
        # ~(HW)^2 * window^2 floats PER SHARD.  The STANDARD splined
        # config shards through the MXU spline-window assembly
        # (_local_normal_equations_splined) and never hits this.
        R = spec.lensmodel.order + 1
        HW = (spec.calibration_object_width_n *
              spec.calibration_object_height_n)
        per_shard = (spec.Nobservations_board / max(n_dev, 1) *
                     HW * 2 * HW * (R * R * 2) * 4)
        if per_shard > 2e9:
            import warnings
            warnings.warn(
                "sharded splined solve (non-standard config): the "
                "generic per-observation jacrev will materialize "
                f"~{per_shard/1e9:.1f} GB per shard; expect HBM "
                "pressure.", stacklevel=3)
    if dtype is not None:
        arrays = _cast_arrays(arrays, dtype)
        b0 = jnp.asarray(b0, dtype)
    b0 = jnp.asarray(b0)
    eff_threshold = _effective_threshold(update_threshold, b0.dtype, quiet)
    if ftol is None:
        ftol = 1e-5 if b0.dtype == jnp.float32 else 1e-6
    rep, sh = _shard_arrays_for_device_solver(arrays, n_dev)

    from ..optimize.solver import _lazy_h_K, _trace_env_key
    lazy_K = _lazy_h_K(spec, b0.dtype)
    key = (spec, tuple(int(d.id) for d in mesh.devices.flat), axis,
           str(b0.dtype), lazy_K, _trace_env_key(spec))
    solve = _SHARDED_SOLVER_CACHE.get(key)
    if solve is None:
        solve = _make_device_lm(spec, _make_sharded_ne_fn(spec, mesh, axis),
                                lazy_K=lazy_K)
        _SHARDED_SOLVER_CACHE[key] = solve

    with _matmul_precision_ctx(b0.dtype, spec):
        if _use_chunked_dispatch():
            b, ne, it = _run_device_lm_chunked(
                solve, b0, (rep, sh), max_iterations, eff_threshold, lam0,
                ftol)
        else:
            b, ne, it = solve(b0, (rep, sh),
                              jnp.asarray(max_iterations, jnp.int32),
                              jnp.asarray(eff_threshold, b0.dtype),
                              jnp.asarray(lam0, b0.dtype),
                              jnp.asarray(ftol, b0.dtype))
    ne = dict(ne)
    # strip shard padding; flatten to the unsharded solver's contract
    ne["x_board"] = ne["x_board"][:spec.Nobservations_board].reshape(-1)
    ne["x_point"] = ne["x_point"][:spec.Nobservations_point].reshape(-1)
    ne["x_tri"] = ne["x_tri"][:spec.num_measurements_points_triangulated]
    return b, float(ne["E"]), int(it), ne


def sharded_lm_solve(spec: ProblemSpec, arrays, b0, mesh,
                     max_iterations=50, update_threshold=1e-7):
    """LM to convergence with observation sharding (host loop over the
    jitted sharded step).  Legacy/debug path — the production API is
    sharded_lm_solve_device (device-resident while_loop) reached through
    optimize(..., mesh=...)."""
    n_dev = mesh.devices.size
    shard_args = _padded_shard_arrays(arrays, n_dev)
    step_fn = sharded_lm_step(spec, mesh)(arrays)
    b = jnp.asarray(b0)
    lam = 1e-4
    nu = 2.0

    _, E0, _, _ = step_fn(b, *shard_args, lam)
    E = float(E0)
    for it in range(max_iterations):
        b_try, _, pred, db = step_fn(b, *shard_args, lam)
        _, E_try, _, _ = step_fn(b_try, *shard_args, lam)
        E_try = float(E_try)
        if E_try < E and np.isfinite(E_try):
            small = float(jnp.max(jnp.abs(db))) < update_threshold
            b = b_try
            E = E_try
            lam = max(lam / 3.0, 1e-14)
            nu = 2.0
            if small:
                break
        else:
            lam *= nu
            nu *= 2.0
            if lam > 1e12:
                break
    return b, E
