"""Calibration seeding pipeline (reference: /root/reference/mrcal/calibration.py).

The reference shells out to mrgingham for corner detection and uses
cv2.solvePnP for monocular poses.  Here corner files are parsed natively and
PnP is a small homography-seeded Gauss-Newton solve in JAX (SURVEY §8.1
mandates no cv2 dependency; exact seed parity is NOT required — the seed is
refined by staged optimize() calls).
"""

import re

import numpy as np
import jax
import jax.numpy as jnp

from . import _xla  # noqa: F401
from . import poseutils
from .poseutils import _compose_rt2, _transform_point_rt, _R_from_r, _r_from_R
from .projections import unproject, project
from .utils import align_procrustes_points_Rt01


# ----------------------------------------------------------------------------
# corners.vnl parsing (reference: calibration.py:24 compute_chessboard_corners)
# ----------------------------------------------------------------------------

def compute_chessboard_corners(W, H, *,
                               globs_per_camera=("*",),
                               corners_cache_vnl=None,
                               jobs=1,
                               exclude_images=set(),
                               weight_column_kind="level"):
    """Parse a corners.vnl file (vnlog: '# filename x y level' header + rows)
    into mrcal observation arrays.

    Returns (observations (Nobs,H,W,3), indices_frame_camera (Nobs,2),
    paths).  When no corners cache is supplied, the native ChESS-based
    detector runs on the glob-matched image files (the reference's
    equivalent path shells out to mrgingham: calibration.py:24-220; ours is
    mrcal_tpu.detector)."""
    if corners_cache_vnl is None:
        import glob as _glob
        from .detector import detect_corners_in_images
        image_paths = sorted(set(
            p for g in globs_per_camera for p in _glob.glob(g)))
        if not image_paths:
            raise FileNotFoundError(
                f"no images matched globs {globs_per_camera} and no "
                "corners_cache_vnl was given")
        detections = detect_corners_in_images(image_paths, W, H)
        import io
        buf = io.StringIO()
        buf.write("# filename x y level\n")
        for fname in image_paths:
            det = detections[fname]
            if det is None:
                buf.write(f"{fname} - - -\n")
                continue
            for x, y, lvl in det:
                buf.write(f"{fname} {x:.5f} {y:.5f} {int(lvl)}\n")
        buf.seek(0)
        corners_cache_vnl = buf

    if weight_column_kind not in ("level", "weight", None):
        raise ValueError("weight_column_kind must be level/weight/None")

    # parse the vnlog
    rows = {}
    f = open(corners_cache_vnl) if isinstance(corners_cache_vnl, str) \
        else corners_cache_vnl
    for line in f:
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        fields = line.split()
        fname = fields[0]
        if fname == "-" or len(fields) < 3 or fields[1] == "-":
            rows.setdefault(fname, [])
            continue
        x, y = float(fields[1]), float(fields[2])
        w = 1.0
        if len(fields) > 3 and weight_column_kind is not None:
            lvl = float(fields[3]) if fields[3] != "-" else -1.0
            if weight_column_kind == "level":
                # decimation level -> weight = 1/2^level; <0 -> outlier
                w = -1.0 if lvl < 0 else 0.5 ** lvl
            else:
                w = lvl
        rows.setdefault(fname, []).append((x, y, w))

    import fnmatch
    filenames = [fn for fn in rows if fn not in exclude_images]
    # assign cameras by glob
    observations = []
    indices_frame_camera = []
    paths = []
    frames = {}
    for fname in filenames:
        icam = None
        for i, g in enumerate(globs_per_camera):
            if fnmatch.fnmatch(fname, g):
                icam = i
                break
        if icam is None:
            continue
        corners = rows[fname]
        if len(corners) != W * H:
            continue
        # frame pairing across cameras: the FIRST digit group in the
        # filename is the frame number (reference pairs by filename frame
        # numbers too: utils.py:788 mapping_file_framenocameraindex)
        mnum = re.search(r"[0-9]+", fname)
        key = mnum.group(0) if mnum else fname
        frames.setdefault(key, len(frames))
        obs = np.array(corners).reshape(H, W, 3)
        observations.append(obs)
        indices_frame_camera.append((frames[key], icam))
        paths.append(fname)

    observations = np.array(observations)
    indices_frame_camera = np.array(indices_frame_camera, dtype=np.int32)
    # renumber frames densely in observation order
    _, inv = np.unique(indices_frame_camera[:, 0], return_inverse=True)
    indices_frame_camera[:, 0] = inv
    order = np.lexsort((indices_frame_camera[:, 1],
                        indices_frame_camera[:, 0]))
    return (observations[order], indices_frame_camera[order],
            [paths[i] for i in order])


# ----------------------------------------------------------------------------
# PnP: homography seed + Gauss-Newton refinement (replaces cv2.solvePnP)
# ----------------------------------------------------------------------------

def _homography_dlt(p_board_xy, q_norm):
    """DLT homography board-plane -> normalized image coords (numpy)."""
    n = p_board_xy.shape[0]
    A = np.zeros((2 * n, 9))
    for i in range(n):
        X, Y = p_board_xy[i]
        u, v = q_norm[i]
        A[2 * i] = [-X, -Y, -1, 0, 0, 0, u * X, u * Y, u]
        A[2 * i + 1] = [0, 0, 0, -X, -Y, -1, v * X, v * Y, v]
    _, _, Vt = np.linalg.svd(A)
    return Vt[-1].reshape(3, 3)


def _pose_from_homography(Hm):
    """Decompose a plane homography into Rt (board -> camera)."""
    h0, h1, h2 = Hm[:, 0], Hm[:, 1], Hm[:, 2]
    s = 1.0 / np.sqrt(np.linalg.norm(h0) * np.linalg.norm(h1))
    if Hm[2, 2] * s < 0:
        s = -s
    r0 = h0 * s
    r1 = h1 * s
    t = h2 * s
    r2 = np.cross(r0, r1)
    R = np.stack([r0, r1, r2], axis=1)
    # project onto SO(3)
    U, _, Vt = np.linalg.svd(R)
    R = U @ Vt
    if np.linalg.det(R) < 0:
        R = U @ np.diag([1, 1, -1]) @ Vt
    return R, t


def _refine_pnp_gn(rt0, p_board, q_norm, weights, iterations=20):
    """Gauss-Newton refinement of an rt (board->cam) pose minimizing
    weighted normalized-pinhole reprojection error."""
    rt0 = jnp.asarray(rt0)
    p_board = jnp.asarray(p_board)
    q_norm = jnp.asarray(q_norm)
    weights = jnp.asarray(weights)

    def resid(rt):
        p_cam = _transform_point_rt(rt, p_board)
        qn = p_cam[..., :2] / p_cam[..., 2:3]
        return ((qn - q_norm) * weights[..., None]).reshape(-1)

    def body(rt, _):
        r = resid(rt)
        J = jax.jacfwd(resid)(rt)
        JtJ = J.T @ J + 1e-9 * jnp.eye(6, dtype=rt.dtype)
        # SPD solve via Cholesky: TPU XLA has no f64 LuDecomposition
        L = jnp.linalg.cholesky(JtJ)
        rt = rt - jax.scipy.linalg.cho_solve((L, True), J.T @ r)
        return rt, None

    rt, _ = jax.lax.scan(body, rt0, None, length=iterations)
    return rt


def estimate_monocular_calobject_poses_Rt_tocam(indices_frame_camera,
                                                observations,
                                                object_spacing,
                                                models_or_intrinsics):
    """Per-observation board pose in camera coords (reference:
    calibration.py:622).  Returns (Nobs, 4, 3) Rt_cam_board."""
    from .synthetic_data import ref_calibration_object
    observations = np.asarray(observations)
    Nobs, H, W = observations.shape[:3]

    intrinsics = []
    for m in models_or_intrinsics:
        if hasattr(m, "intrinsics"):
            intrinsics.append(m.intrinsics())
        else:
            intrinsics.append(m)

    board = ref_calibration_object(W, H, object_spacing)       # (H,W,3)
    p_board_flat = board.reshape(-1, 3)

    def solve_one(q, w, lensmodel, intr, focal_scale=1.0):
        """One PnP solve with the given focal scaling of the intrinsics
        guess.  Returns (rt, rms of normalized reprojection residual)."""
        intr_s = np.array(intr, dtype=float)
        intr_s[:2] *= focal_scale
        v = np.asarray(unproject(q, lensmodel, intr_s))
        q_norm = v[:, :2] / v[:, 2:3]
        good = w > 0
        if np.sum(good) < 6:
            raise Exception("too few valid corners")
        Hm = _homography_dlt(p_board_flat[good][:, :2], q_norm[good])
        R, t = _pose_from_homography(Hm)
        if t[2] < 0:      # board behind camera: flip (reference retry logic,
            R = R @ np.diag([-1, -1, 1])    # calibration.py:560-580)
            t = -t
        rt0 = np.concatenate([np.asarray(_r_from_R(jnp.asarray(R))), t])
        rt = np.asarray(_refine_pnp_gn(rt0, p_board_flat, q_norm, w))
        p_cam = np.asarray(_transform_point_rt(jnp.asarray(rt),
                                               jnp.asarray(p_board_flat)))
        qn = p_cam[:, :2] / p_cam[:, 2:3]
        rms = float(np.sqrt(np.mean(((qn - q_norm) ** 2)[good])))
        return rt, rms

    Rt_all = np.zeros((Nobs, 4, 3))
    for i in range(Nobs):
        icam = int(indices_frame_camera[i, 1])
        lensmodel, intr = intrinsics[icam]
        obs = observations[i].reshape(-1, 3)
        q = obs[:, :2]
        w = np.maximum(obs[:, 2], 0.0)
        rt, rms = solve_one(q, w, lensmodel, intr)
        if rms > 0.02:
            # bad solve: the focal-length guess may be far off.  Retry with
            # scaled focals, keep the best (reference focal-retry fallback:
            # calibration.py:508-620, x1.5 board-behind / x0.7 too-wide)
            for scale in (1.5, 0.7):
                rt2, rms2 = solve_one(q, w, lensmodel, intr,
                                      focal_scale=scale)
                if rms2 < rms:
                    rt, rms = rt2, rms2
        Rt_all[i] = np.asarray(poseutils.Rt_from_rt(rt))
    return Rt_all


# ----------------------------------------------------------------------------
# multi-camera joint seeding (reference: calibration.py:925-1397)
# ----------------------------------------------------------------------------

def traverse_sensor_links(*, connectivity_matrix, callback_sensor_link):
    """Find optimal paths from sensor 0 to every other sensor in a
    connectivity graph (reference: mrcal.h:935-960 /
    traverse-sensor-links.c:39-48; Python binding mrcal-pywrap.c
    traverse_sensor_links).

    connectivity_matrix: (Nsensors, Nsensors) symmetric array with a 0
    diagonal; element (i,j) is the number of shared observations between
    sensors i and j (0 = no connection).

    callback_sensor_link(idx_to, idx_from) is invoked for each optimal
    link, in the order the sensors are reached (Dijkstra finalization
    order, minimizing hop count with total-shared-observations as the
    tie-break: edge cost 65536 - Nshared).  Returning False from the
    callback aborts the traversal and makes this function return False.

    Disjoint sensors never get a callback — the caller must notice.
    Returns True on success."""
    import heapq
    c = np.asarray(connectivity_matrix)
    if c.ndim != 2 or c.shape[0] != c.shape[1]:
        raise Exception("connectivity_matrix must be square (Nsensors x "
                        f"Nsensors); got {c.shape}")
    if np.any(c != c.T) or np.any(np.diag(c) != 0):
        raise Exception("connectivity_matrix must be symmetric with a 0 "
                        "diagonal")
    N = c.shape[0]
    INF = float("inf")
    dist = [INF] * N
    parent = [-1] * N
    dist[0] = 0
    pq = [(0, 0)]
    done = [False] * N
    while pq:
        d, u = heapq.heappop(pq)
        if done[u]:
            continue
        done[u] = True
        if parent[u] >= 0:
            if callback_sensor_link(u, parent[u]) is False:
                return False
        for v in range(N):
            if v == u or c[u, v] == 0:
                continue
            cost = 65536 - int(c[u, v])
            if d + cost < dist[v]:
                dist[v] = d + cost
                parent[v] = u
                heapq.heappush(pq, (d + cost, v))
    return True


def _traverse_sensor_links(Ncameras, shared_frames):
    """Dijkstra over the camera-connectivity graph: cost of an edge is
    65536 - Nshared (reference: traverse-sensor-links.c:39-48).
    Returns parent[] of the tree rooted at camera 0."""
    import heapq
    INF = float("inf")
    dist = [INF] * Ncameras
    parent = [-1] * Ncameras
    dist[0] = 0
    pq = [(0, 0)]
    done = [False] * Ncameras
    while pq:
        d, u = heapq.heappop(pq)
        if done[u]:
            continue
        done[u] = True
        for v in range(Ncameras):
            if v == u or shared_frames[u][v] == 0:
                continue
            cost = 65536 - shared_frames[u][v]
            if d + cost < dist[v]:
                dist[v] = d + cost
                parent[v] = u
                heapq.heappush(pq, (d + cost, v))
    return parent


def _estimate_camera_poses(calobject_poses_local_Rt_cf,
                           indices_frame_camera, Ncameras):
    """Pairwise camera poses averaged over shared frames, chained into
    camera-0-referenced poses via the sensor-link graph
    (reference: calibration.py:925)."""
    Nobs = len(indices_frame_camera)
    # group observations by frame
    byframe = {}
    for i in range(Nobs):
        f, c = int(indices_frame_camera[i, 0]), int(indices_frame_camera[i, 1])
        byframe.setdefault(f, {})[c] = calobject_poses_local_Rt_cf[i]

    shared = [[0] * Ncameras for _ in range(Ncameras)]
    for f, cams in byframe.items():
        for c0 in cams:
            for c1 in cams:
                if c0 != c1:
                    shared[c0][c1] += 1

    parent = _traverse_sensor_links(Ncameras, shared)

    def pairwise_Rt01(c0, c1):
        """Average Rt_c0_c1 over shared frames."""
        Rts = []
        for f, cams in byframe.items():
            if c0 in cams and c1 in cams:
                Rt0 = cams[c0]
                Rt1 = cams[c1]
                Rts.append(np.asarray(poseutils.compose_Rt(
                    jnp.asarray(Rt0), poseutils.invert_Rt(jnp.asarray(Rt1)))))
        Rts = np.array(Rts)
        # average: mean translation; rotation mean via quaternion mean
        t = Rts[:, 3, :].mean(axis=0)
        from .poseutils import quat_from_R, R_from_quat
        qs = np.asarray(quat_from_R(jnp.asarray(Rts[:, :3, :])))
        q = qs.mean(axis=0)
        q /= np.linalg.norm(q)
        R = np.asarray(R_from_quat(jnp.asarray(q)))
        return np.concatenate([R, t[None]], axis=0)

    Rt_0c = [None] * Ncameras           # camera c -> camera 0
    Rt_0c[0] = np.asarray(poseutils.identity_Rt())
    # fill in BFS order over the tree
    pending = [c for c in range(1, Ncameras)]
    while pending:
        progressed = False
        for c in list(pending):
            p = parent[c]
            if p < 0:
                raise Exception(f"camera {c} not connected to camera 0")
            if Rt_0c[p] is not None:
                Rt_pc = pairwise_Rt01(p, c)
                Rt_0c[c] = np.asarray(poseutils.compose_Rt(
                    jnp.asarray(Rt_0c[p]), jnp.asarray(Rt_pc)))
                pending.remove(c)
                progressed = True
        if not progressed:
            raise Exception("camera connectivity graph is disconnected")
    # Rt_cam_camera0: cameras relative to camera 0 == reference
    return np.array([np.asarray(poseutils.invert_Rt(jnp.asarray(Rt)))
                     for Rt in Rt_0c])   # Rt_c_0 for each camera


def estimate_joint_frame_poses(calobject_Rt_camera_frame,
                               extrinsics_Rt_fromref,
                               indices_frame_camera,
                               object_width_n, object_height_n,
                               object_spacing):
    """Combine per-camera board-pose estimates into one pose per frame
    (reference: calibration.py:1186).

    extrinsics_Rt_fromref: (Ncameras-1, 4, 3) — camera 0 is the reference
    (identity), like the reference API (Rt_cam_ref[icam-1])."""
    from .synthetic_data import ref_calibration_object
    Nframes = int(np.max(indices_frame_camera[:, 0])) + 1
    board = ref_calibration_object(object_width_n, object_height_n,
                                   object_spacing)
    p_board = board.reshape(-1, 3)
    Rt_identity = np.asarray(poseutils.identity_Rt())

    Rt_ref_frame = np.zeros((Nframes, 4, 3))
    for f in range(Nframes):
        ps_ref = []
        for i in range(len(indices_frame_camera)):
            if int(indices_frame_camera[i, 0]) != f:
                continue
            icam = int(indices_frame_camera[i, 1])
            Rt_cf = calobject_Rt_camera_frame[i]
            Rt_ref_cam = (Rt_identity if icam == 0
                          else np.asarray(poseutils.invert_Rt(
                              jnp.asarray(extrinsics_Rt_fromref[icam - 1]))))
            Rt_ref_frame_i = np.asarray(poseutils.compose_Rt(
                jnp.asarray(Rt_ref_cam), jnp.asarray(Rt_cf)))
            ps_ref.append(np.asarray(poseutils.transform_point_Rt(
                jnp.asarray(Rt_ref_frame_i), jnp.asarray(p_board))))
        ps_mean = np.mean(ps_ref, axis=0)
        Rt = np.asarray(align_procrustes_points_Rt01(
            jnp.asarray(ps_mean), jnp.asarray(p_board)))
        Rt_ref_frame[f] = Rt
    # rt (Nframes, 6), like the reference (calibration.py:1395 returns
    # rt_ref_frame)
    return np.array([np.asarray(poseutils.rt_from_Rt(jnp.asarray(Rt)))
                     for Rt in Rt_ref_frame])


def seed_stereographic(imagersizes, focal_estimate,
                       indices_frame_camera, observations,
                       object_spacing):
    """Full calibration seed assuming LENSMODEL_STEREOGRAPHIC intrinsics
    (reference: calibration.py:1398).  Returns
    (intrinsics_data, extrinsics_rt_fromref, frames_rt_toref)."""
    imagersizes = np.asarray(imagersizes)
    Ncameras = imagersizes.shape[0]
    H, W = observations.shape[1:3]
    focals = np.broadcast_to(np.asarray(focal_estimate, dtype=float),
                             (Ncameras,))
    intrinsics = np.array(
        [[f, f, (imagersizes[i][0] - 1) / 2., (imagersizes[i][1] - 1) / 2.]
         for i, f in enumerate(focals)])

    models = [("LENSMODEL_STEREOGRAPHIC", intrinsics[i])
              for i in range(Ncameras)]
    Rt_cf = estimate_monocular_calobject_poses_Rt_tocam(
        indices_frame_camera, observations, object_spacing, models)

    if Ncameras > 1:
        Rt_cam_ref = _estimate_camera_poses(Rt_cf, indices_frame_camera,
                                            Ncameras)
    else:
        Rt_cam_ref = np.asarray(poseutils.identity_Rt())[None]

    frames_rt_toref = estimate_joint_frame_poses(
        Rt_cf, Rt_cam_ref[1:], indices_frame_camera, W, H, object_spacing)

    # camera 0 is the reference: Ncameras-1 extrinsics entries
    extrinsics_rt_fromref = np.array(
        [np.asarray(poseutils.rt_from_Rt(jnp.asarray(Rt_cam_ref[i])))
         for i in range(1, Ncameras)]).reshape(-1, 6)
    return intrinsics, extrinsics_rt_fromref, frames_rt_toref


# ----------------------------------------------------------------------------
# valid-intrinsics region (reference: calibration.py:1611, :1720)
# ----------------------------------------------------------------------------

def _report_regional_statistics(model, *, gridn_width=30, gridn_height=None):
    """Per-region residual statistics over the imager (reference:
    calibration.py:1720).  Returns (mean, stdev, count) arrays of shape
    (gridn_height, gridn_width)."""
    oi = model.optimization_inputs()
    if oi is None:
        raise Exception("model has no optimization_inputs")
    from .utils import measurements_board
    icam = model.icam_intrinsics() or 0
    W, H = model.imagersize()
    if gridn_height is None:
        gridn_height = int(round(H / W * gridn_width))

    res = measurements_board(oi)
    obs = np.asarray(oi["observations_board"])
    idx = np.asarray(oi["indices_frame_camintrinsics_camextrinsics"])
    sel = idx[:, 1] == icam
    res = res[sel]
    obs = obs[sel]
    inlier = obs[..., 2] > 0
    q = obs[..., :2][inlier]
    r = res[inlier]
    mag = np.linalg.norm(r, axis=-1)

    gx = np.clip((q[:, 0] / W * gridn_width).astype(int), 0, gridn_width - 1)
    gy = np.clip((q[:, 1] / H * gridn_height).astype(int), 0,
                 gridn_height - 1)
    count = np.zeros((gridn_height, gridn_width))
    s1 = np.zeros((gridn_height, gridn_width, 2))
    s2 = np.zeros((gridn_height, gridn_width))
    np.add.at(count, (gy, gx), 1)
    np.add.at(s1, (gy, gx), r)
    np.add.at(s2, (gy, gx), mag * mag)
    cnt_safe = np.maximum(count, 1)
    mean = np.linalg.norm(s1 / cnt_safe[..., None], axis=-1)
    stdev = np.sqrt(np.maximum(s2 / cnt_safe - 0, 0))
    return mean, stdev, count


def _compute_valid_intrinsics_region(model,
                                     threshold_uncertainty=1.0,
                                     threshold_mean=0.5,
                                     threshold_stdev=1.0,
                                     threshold_count=3,
                                     distance=0.0,
                                     gridn_width=30, gridn_height=None):
    """The valid-intrinsics region: the contour of the area where the
    regional residual statistics and the projection uncertainty are all
    within thresholds (reference: calibration.py:1611).  Returns a closed
    (N,2) pixel contour, or None."""
    import re as _re
    from .projections import unproject
    from .model_analysis import projection_uncertainty
    from .utils import sample_imager

    W, H = model.imagersize()
    if gridn_height is None:
        gridn_height = int(round(H / W * gridn_width))
    mean, stdev, count = _report_regional_statistics(
        model, gridn_width=gridn_width, gridn_height=gridn_height)
    q = np.asarray(sample_imager(gridn_width, gridn_height, W, H))
    vcam = np.asarray(unproject(q, *model.intrinsics(), normalize=True))
    atinfinity = distance <= 0
    pcam = vcam if atinfinity else vcam * distance
    unc = np.array(projection_uncertainty(
        pcam.reshape(-1, 3), model, method="mean-pcam",
        atinfinity=atinfinity,
        what="worstdirection-stdev")).reshape(mean.shape)
    unc[~np.isfinite(unc)] = 1e9
    mask = unc < threshold_uncertainty
    if not _re.match("LENSMODEL_SPLINED_", model.intrinsics()[0]):
        mask &= (mean < threshold_mean) & (stdev < threshold_stdev) & \
                (count > threshold_count)
    if not np.any(mask):
        return np.zeros((0, 2))

    # extract the boundary contour of the mask (marching squares)
    try:
        import contourpy
        gen = contourpy.contour_generator(
            x=q[..., 0], y=q[..., 1], z=mask.astype(float))
        lines = gen.lines(0.5)
        if not lines:
            return np.zeros((0, 2))
        contour = max(lines, key=len)
    except ImportError:
        # fall back: bounding box of the mask
        ys, xs = np.nonzero(mask)
        x0, x1 = q[0, xs.min(), 0], q[0, xs.max(), 0]
        y0, y1 = q[ys.min(), 0, 1], q[ys.max(), 0, 1]
        contour = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]])
    from .utils import close_contour
    return close_contour(np.asarray(contour))
