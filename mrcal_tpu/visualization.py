"""Visualization suite (reference: /root/reference/mrcal/visualization.py,
4,247 LoC of gnuplotlib).  Rebuilt on matplotlib: every function returns the
Figure and accepts hardcopy=<path> to save it.  The data side runs through
the JAX kernels."""

import numpy as np

from . import _xla  # noqa: F401
from . import poseutils
from .projections import project, unproject
from .utils import sample_imager, sample_imager_unproject


def _finish(fig, hardcopy):
    if hardcopy:
        fig.savefig(hardcopy, dpi=120, bbox_inches="tight")
    return fig


def _title(default, title, extratitle):
    """Reference title semantics: `title` REPLACES the default,
    `extratitle` is appended to whichever is active."""
    t = title if title is not None else default
    if extratitle:
        t = f"{t}: {extratitle}"
    return t


def _new_axes(title=None, _3d=False):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig = plt.figure(figsize=(9, 7))
    ax = fig.add_subplot(111, projection="3d" if _3d else None)
    if title:
        ax.set_title(title)
    return fig, ax


def show_geometry(models_or_rt_cam_ref=None,
                  *, frames_rt_toref=None, rt_ref_frame=None, points=None,
                  icam_extrinsics_fromsolve=None,
                  cameras_Rt_plot_ref=None,
                  show_calobjects="all", show_points="all",
                  calobject_warp=None, point_labels=None,
                  cameranames=None, axis_scale=None,
                  object_width_n=None, object_height_n=None,
                  object_spacing=None,
                  title=None, extratitle=None, hardcopy=None,
                  models_or_extrinsics_rt_fromref=None, **kwargs):
    """3D plot of cameras / frames / points (reference: visualization.py:25).

    Accepts cameramodels or (6,) rt_cam_ref arrays.  When models with
    optimization_inputs are given and rt_ref_frame/points are omitted,
    the solve geometry is pulled from the first model that has it
    (show_calobjects/show_points: 'all' | 'thiscamera' | falsy).
    icam_extrinsics_fromsolve replaces the camera list with poses from
    the solve's extrinsics block ('all' or an iterable of indices) — the
    moving-camera visualization mode.  cameras_Rt_plot_ref transforms
    everything into a chosen plot frame.  point_labels maps point index
    -> text annotation."""
    if models_or_rt_cam_ref is None:
        models_or_rt_cam_ref = models_or_extrinsics_rt_fromref
    if rt_ref_frame is not None and frames_rt_toref is None:
        frames_rt_toref = rt_ref_frame
    models = list(models_or_rt_cam_ref)

    # pull solve geometry from the first model that has it
    oi = None
    icam_oi = None
    for m in models:
        if hasattr(m, "optimization_inputs") and \
                m.optimization_inputs() is not None:
            oi = m.optimization_inputs()
            icam_oi = (m.icam_intrinsics()
                       if hasattr(m, "icam_intrinsics") else None)
            break

    if icam_extrinsics_fromsolve is not None:
        if oi is None:
            raise Exception("icam_extrinsics_fromsolve needs a model with "
                            "optimization_inputs")
        ext = np.asarray(oi.get("extrinsics_rt_fromref",
                                oi.get("rt_cam_ref")))
        if isinstance(icam_extrinsics_fromsolve, str):   # 'all'
            models = list(ext)
        else:
            models = [ext[i] for i in icam_extrinsics_fromsolve]

    rts = []
    for m in models:
        if hasattr(m, "extrinsics_rt_fromref"):
            rts.append(np.asarray(m.extrinsics_rt_fromref()))
        else:
            rts.append(np.asarray(m).reshape(6))

    if oi is not None:
        if frames_rt_toref is None and show_calobjects:
            idxb = np.asarray(
                oi.get("indices_frame_camintrinsics_camextrinsics",
                       np.zeros((0, 3))))
            frames = oi.get("frames_rt_toref", oi.get("rt_ref_frame"))
            if frames is not None and len(np.asarray(frames)):
                frames = np.asarray(frames)
                if show_calobjects == "thiscamera" and icam_oi is not None \
                        and len(idxb):
                    frames = frames[np.unique(
                        idxb[idxb[:, 1] == icam_oi][:, 0])]
                frames_rt_toref = frames
            if object_width_n is None and \
                    oi.get("observations_board") is not None and \
                    len(np.asarray(oi["observations_board"])):
                object_height_n, object_width_n = \
                    np.asarray(oi["observations_board"]).shape[1:3]
                object_spacing = oi.get("calibration_object_spacing")
                if calobject_warp is None:
                    calobject_warp = oi.get("calobject_warp")
        if points is None and show_points and \
                oi.get("points") is not None:
            points = np.asarray(oi["points"])
            if show_points == "thiscamera" and icam_oi is not None:
                idxp = np.asarray(
                    oi.get("indices_point_camintrinsics_camextrinsics",
                           np.zeros((0, 3))))
                if len(idxp):
                    points = points[np.unique(
                        idxp[idxp[:, 1] == icam_oi][:, 0])]

    # auto axis scale: a fraction of the scene extent (reference computes
    # this in _options_heatmap_with_contours-style logic)
    if axis_scale is None:
        origins = [np.asarray(poseutils.invert_Rt(
            np.asarray(poseutils.Rt_from_rt(rt))))[3] for rt in rts]
        extent = (np.ptp(np.asarray(origins), axis=0).max()
                  if len(origins) > 1 else 0.0)
        if frames_rt_toref is not None and len(np.asarray(frames_rt_toref)):
            extent = max(extent, float(np.ptp(
                np.asarray(frames_rt_toref)[:, 3:], axis=0).max()))
        axis_scale = max(extent * 0.1, 0.1)

    def to_plot_frame(p):
        if cameras_Rt_plot_ref is None:
            return p
        return np.asarray(poseutils.transform_point_Rt(
            np.asarray(cameras_Rt_plot_ref), p))

    fig, ax = _new_axes(_title("Camera geometry", title, extratitle),
                        _3d=True)
    for i, rt in enumerate(rts):
        Rt_ref_cam = np.asarray(poseutils.invert_Rt(
            np.asarray(poseutils.Rt_from_rt(rt))))
        origin = to_plot_frame(Rt_ref_cam[3])
        for j, color in enumerate("rgb"):
            tip = to_plot_frame(Rt_ref_cam[3] + Rt_ref_cam[j] * axis_scale)
            ax.plot([origin[0], tip[0]], [origin[1], tip[1]],
                    [origin[2], tip[2]], color)
        name = cameranames[i] if cameranames else f"cam{i}"
        ax.text(*origin, name)
    if frames_rt_toref is not None and object_width_n and show_calobjects:
        from .synthetic_data import ref_calibration_object
        board = ref_calibration_object(object_width_n, object_height_n,
                                       object_spacing,
                                       calobject_warp=calobject_warp)
        for rt in np.asarray(frames_rt_toref):
            pts = to_plot_frame(np.asarray(poseutils.transform_point_rt(
                rt, np.asarray(board).reshape(-1, 3))))
            ax.plot(pts[:, 0], pts[:, 1], pts[:, 2], ".", markersize=1,
                    alpha=0.4)
    if points is not None and show_points:
        points = to_plot_frame(np.asarray(points))
        ax.plot(points[:, 0], points[:, 1], points[:, 2], "k.",
                markersize=2)
        if point_labels:
            for i, label in point_labels.items():
                ax.text(*points[int(i)], str(label))
    ax.set_xlabel(kwargs.get("xlabel", "x"))
    ax.set_ylabel(kwargs.get("ylabel", "y"))
    ax.set_zlabel(kwargs.get("zlabel", "z"))
    return _finish(fig, hardcopy)


def _overlay_observations(ax, model_or_oi, icam_intrinsics=None):
    """Scatter the calibration-time board-corner observations of this
    camera over the plot (reference option observations=True,
    visualization.py:1702-1745)."""
    oi = (model_or_oi.optimization_inputs()
          if hasattr(model_or_oi, "optimization_inputs") else model_or_oi)
    if oi is None:
        return
    if icam_intrinsics is None and \
            hasattr(model_or_oi, "icam_intrinsics"):
        icam_intrinsics = model_or_oi.icam_intrinsics()
    obs = oi.get("observations_board")
    idx = oi.get("indices_frame_camintrinsics_camextrinsics")
    if obs is None or idx is None:
        return
    obs = np.asarray(obs)
    idx = np.asarray(idx)
    if icam_intrinsics is not None:
        obs = obs[idx[:, 1] == icam_intrinsics]
    q = obs.reshape(-1, 3)
    inl = q[:, 2] > 0
    ax.plot(q[inl, 0], q[inl, 1], ".", ms=1, color="black", alpha=0.25,
            label="observations")
    if np.any(~inl):
        ax.plot(q[~inl, 0], q[~inl, 1], "x", ms=3, color="red", alpha=0.6,
                label="outliers")


def _overlay_valid_region(ax, model, color="green"):
    """Draw the model's valid-intrinsics region polygon
    (reference option valid_intrinsics_region=True)."""
    if not hasattr(model, "valid_intrinsics_region"):
        return
    region = model.valid_intrinsics_region()
    if region is None:
        return
    region = np.asarray(region)
    ax.plot(region[:, 0], region[:, 1], "-", color=color, lw=1.5,
            label="valid-intrinsics region")


def _draw_contours(fig, ax, qx, qy, z, *, contour_increment=None,
                   contour_labels_font=None, contour_labels_styles=None,
                   cbmax=None):
    """Labeled iso-value contour lines over a heatmap (the reference's
    _options_heatmap_with_contours, visualization.py:880).
    contour_increment: level spacing (None = auto ~10 levels; the
    reference's negative-means-auto convention is honored).
    contour_labels_font: matplotlib fontsize (a gnuplot font string like
    ',10' is parsed for its size).  contour_labels_styles is gnuplot
    plumbing — accepted and ignored."""
    levels = None
    if contour_increment is not None and contour_increment > 0:
        top = cbmax if cbmax else float(np.nanmax(z))
        levels = np.arange(0, top + contour_increment, contour_increment)
        if len(levels) < 2:
            levels = None
    fontsize = 7
    if contour_labels_font is not None:
        try:
            fontsize = float(str(contour_labels_font).split(",")[-1])
        except ValueError:
            pass
    cs = (ax.contour(qx, qy, z, levels=levels, colors="white",
                     linewidths=0.7) if levels is not None
          else ax.contour(qx, qy, z, colors="white", linewidths=0.7))
    ax.clabel(cs, inline=True, fontsize=fontsize)


def show_projection_diff(models, *, gridn_width=60, gridn_height=None,
                         distance=None, vectorfield=False,
                         vectorscale=1.0,
                         intrinsics_only=False,
                         use_uncertainties=False,
                         focus_center=None, focus_radius=-1,
                         implied_Rt10=None,
                         observations=False,
                         valid_intrinsics_region=False,
                         directions=False,
                         contours=False, contour_increment=None,
                         contour_labels_font=None,
                         contour_labels_styles=None,
                         cbmax=4, title=None, extratitle=None,
                         hardcopy=None, **kwargs):
    """Heatmap/vectorfield of the projection difference between models
    (reference: visualization.py:1039).  len(models)>2 shows the RMS
    heatmap vs model 0 (vectorfield needs exactly 2 models).

    observations / valid_intrinsics_region / contours overlay the
    calibration observations, each model's valid region, and labeled
    iso-difference contour lines; directions=True colors the vectorfield
    by direction angle (hsv) instead of magnitude; implied_Rt10 uses the
    GIVEN compensating transform instead of fitting one."""
    from .model_analysis import projection_diff
    difflen, diff, q0, Rt10 = projection_diff(
        models, gridn_width=gridn_width, gridn_height=gridn_height,
        distance=distance, intrinsics_only=intrinsics_only,
        use_uncertainties=use_uncertainties,
        focus_center=focus_center, focus_radius=focus_radius,
        implied_Rt10=implied_Rt10)
    difflen = np.asarray(difflen)
    q0 = np.asarray(q0)
    if (vectorfield or directions) and diff is None:
        raise Exception("vectorfield/directions need exactly 2 models")
    fig, ax = _new_axes(_title("Projection diff (pixels)", title,
                               extratitle))
    if vectorfield or directions:
        diff = np.asarray(diff)
        color = (np.degrees(np.arctan2(diff[..., 1], diff[..., 0]))
                 if directions else difflen)
        qv = ax.quiver(q0[..., 0], q0[..., 1],
                       diff[..., 0] * vectorscale,
                       diff[..., 1] * vectorscale, color,
                       cmap="hsv" if directions else None,
                       clim=(-180, 180) if directions else None)
        fig.colorbar(qv, ax=ax)
        ax.invert_yaxis()
    else:
        extent = (q0[..., 0].min(), q0[..., 0].max(),
                  q0[..., 1].max(), q0[..., 1].min())
        im = ax.imshow(difflen, origin="upper", vmin=0, vmax=cbmax,
                       extent=extent)
        fig.colorbar(im, ax=ax)
        if contours or contour_increment is not None:
            _draw_contours(fig, ax, q0[..., 0], q0[..., 1], difflen,
                           contour_increment=contour_increment,
                           contour_labels_font=contour_labels_font,
                           contour_labels_styles=contour_labels_styles,
                           cbmax=cbmax)
    if observations:
        _overlay_observations(ax, models[0])
    if valid_intrinsics_region:
        for m, c in zip(models, ("green", "orange", "cyan", "magenta")):
            _overlay_valid_region(ax, m, color=c)
    return _finish(fig, hardcopy), difflen


def show_projection_uncertainty(model, *, gridn_width=30, gridn_height=None,
                                distance=None, isotropic=False,
                                method="mean-pcam",
                                observations=False,
                                valid_intrinsics_region=False,
                                contours=False, contour_increment=None,
                                contour_labels_font=None,
                                contour_labels_styles=None,
                                cbmax=3, title=None, extratitle=None,
                                hardcopy=None,
                                observed_pixel_uncertainty=None, **kwargs):
    """Heatmap of projection uncertainty over the imager
    (reference: visualization.py:1668).

    observations=True overlays the calibration-time corner observations
    (their density is what SHAPES this map — the reference draws them for
    exactly that reason); valid_intrinsics_region=True the region
    polygon; contours=True labeled iso-uncertainty lines."""
    from .model_analysis import projection_uncertainty
    W, H = model.imagersize()
    v, q = sample_imager_unproject(gridn_width, gridn_height, W, H,
                                   *model.intrinsics(), normalize=True)
    d = distance if distance is not None else 1e5
    p_cam = np.asarray(v) * d
    what = "rms-stdev" if isotropic else "worstdirection-stdev"
    unc = projection_uncertainty(
        p_cam.reshape(-1, 3), model, method=method, what=what,
        observed_pixel_uncertainty=observed_pixel_uncertainty)
    unc = np.asarray(unc).reshape(np.asarray(q).shape[:-1])
    fig, ax = _new_axes(_title(f"Projection uncertainty (pixels), "
                               f"distance={distance}", title, extratitle))
    q = np.asarray(q)
    im = ax.imshow(unc, origin="upper", vmin=0, vmax=cbmax,
                   extent=(q[..., 0].min(), q[..., 0].max(),
                           q[..., 1].max(), q[..., 1].min()))
    fig.colorbar(im, ax=ax)
    if contours or contour_increment is not None:
        _draw_contours(fig, ax, q[..., 0], q[..., 1], unc,
                       contour_increment=contour_increment,
                       contour_labels_font=contour_labels_font,
                       contour_labels_styles=contour_labels_styles,
                       cbmax=cbmax)
    if observations:
        _overlay_observations(ax, model)
    if valid_intrinsics_region:
        _overlay_valid_region(ax, model)
    return _finish(fig, hardcopy), unc


def show_projection_uncertainty_vs_distance(
        model, *, where="centroid", distance_min=0.2, distance_max=100.0,
        Ndistances=40, method="mean-pcam", isotropic=False,
        observed_pixel_uncertainty=None,
        title=None, extratitle=None, hardcopy=None,
        **kwargs):
    """Uncertainty as a function of range along one observation ray
    (reference: visualization.py:1959).  where: 'center' (imager center),
    'centroid' (mean of the calibration observations), or a (2,) pixel.
    isotropic=True plots the rms-stdev instead of worst-direction."""
    from .model_analysis import projection_uncertainty
    W, H = model.imagersize()
    if isinstance(where, str):
        if where == "centroid" and model.optimization_inputs() is not None:
            oi = model.optimization_inputs()
            obs = np.asarray(oi["observations_board"])
            idx = np.asarray(
                oi["indices_frame_camintrinsics_camextrinsics"])
            sel = idx[:, 1] == model.icam_intrinsics()
            qq = obs[sel].reshape(-1, 3)
            qq = qq[qq[:, 2] > 0]
            q = (qq[:, :2].mean(axis=0) if len(qq)
                 else np.array([(W - 1) / 2, (H - 1) / 2]))
        else:
            q = np.array([(W - 1) / 2, (H - 1) / 2])
    else:
        q = np.asarray(where)
    v = np.asarray(unproject(q, *model.intrinsics(), normalize=True))
    distances = np.geomspace(distance_min, distance_max, Ndistances)
    p = v[None, :] * distances[:, None]
    unc = projection_uncertainty(
        p, model, method=method,
        what="rms-stdev" if isotropic else "worstdirection-stdev",
        observed_pixel_uncertainty=observed_pixel_uncertainty)
    fig, ax = _new_axes(_title("Uncertainty vs distance", title,
                               extratitle))
    ax.semilogx(distances, np.asarray(unc))
    ax.set_xlabel("distance [m]")
    ax.set_ylabel(("rms" if isotropic else "worst-direction")
                  + " stdev [pixels]")
    ax.grid(True)
    return _finish(fig, hardcopy), np.asarray(unc)


def show_distortion_off_pinhole(model, *, vectorfield=False, gridn_width=60,
                                gridn_height=None, cbmax=25.0,
                                vectorscale=1.0,
                                title=None, extratitle=None,
                                hardcopy=None, **kwargs):
    """How much the projection deviates from the pinhole core
    (reference: visualization.py:2157)."""
    lensmodel, intr = model.intrinsics()
    W, H = model.imagersize()
    v, q = sample_imager_unproject(gridn_width, gridn_height, W, H,
                                   lensmodel, intr)
    q_pinhole = np.asarray(project(np.asarray(v), "LENSMODEL_PINHOLE",
                                   np.asarray(intr[:4])))
    q = np.asarray(q)
    diff = q_pinhole - q
    fig, ax = _new_axes(_title("Distortion off pinhole (pixels)", title,
                               extratitle))
    if vectorfield:
        ax.quiver(q[..., 0], q[..., 1], diff[..., 0] * vectorscale,
                  diff[..., 1] * vectorscale)
        ax.invert_yaxis()
    else:
        difflen = np.linalg.norm(diff, axis=-1)
        im = ax.imshow(difflen, origin="upper", vmin=0, vmax=cbmax,
                       extent=(q[..., 0].min(), q[..., 0].max(),
                               q[..., 1].max(), q[..., 1].min()))
        fig.colorbar(im, ax=ax)
    return _finish(fig, hardcopy)


def show_distortion_off_pinhole_radial(model, *,
                                       show_fisheye_projections=False,
                                       title=None, extratitle=None,
                                       hardcopy=None, **kwargs):
    """Radial distortion profile (reference: visualization.py:2404).

    show_fisheye_projections=True overlays the ideal fisheye projection
    curves (equidistant, equisolid-angle, orthographic, stereographic)
    for comparison, like the reference."""
    lensmodel, intr = model.intrinsics()
    W, H = model.imagersize()
    fx, fy, cx, cy = np.asarray(intr)[:4]
    # sample along the diagonal from the center
    t = np.linspace(0, 1, 100)
    q = np.stack([cx + t * (W - 1 - cx), cy + t * (H - 1 - cy)], axis=-1)
    v = np.asarray(unproject(q, lensmodel, intr))
    th = np.degrees(np.arctan2(np.linalg.norm(v[:, :2], axis=-1), v[:, 2]))
    r_obs = np.linalg.norm((q - [cx, cy]) / [fx, fy], axis=-1)
    r_pinhole = np.tan(np.radians(th))
    fig, ax = _new_axes(_title("Radial distortion", title, extratitle))
    ax.plot(th, r_obs - r_pinhole, label="this model")
    if show_fisheye_projections:
        thr = np.radians(th)
        for name, r in (("equidistant", thr),
                        ("equisolid", 2.0 * np.sin(thr / 2.0)),
                        ("orthographic", np.sin(thr)),
                        ("stereographic", 2.0 * np.tan(thr / 2.0))):
            ax.plot(th, r - r_pinhole, "--", lw=1, label=name)
        ax.legend()
    ax.set_xlabel("angle off the optical axis [deg]")
    ax.set_ylabel("normalized radial distortion delta")
    ax.grid(True)
    return _finish(fig, hardcopy)


def show_valid_intrinsics_region(models, *, image=None, points=None,
                                 cameranames=None, title=None,
                                 extratitle=None, hardcopy=None, **kwargs):
    """Plot the valid-intrinsics region(s) (reference: visualization.py:2566).
    points: (N,2) pixel coords to overlay; cameranames label the region
    polygons in the legend."""
    if hasattr(models, "intrinsics"):
        models = [models]
    fig, ax = _new_axes(_title("Valid-intrinsics region", title,
                               extratitle))
    if image is not None:
        arr = image if isinstance(image, np.ndarray) else None
        if arr is None:
            from .image import load_image
            arr = load_image(image)
        ax.imshow(arr, cmap="gray")
    for i, m in enumerate(models):
        r = m.valid_intrinsics_region()
        if r is not None:
            name = (cameranames[i] if cameranames else f"camera {i}")
            ax.plot(r[:, 0], r[:, 1], "-", label=name)
    if points is not None:
        points = np.asarray(points)
        ax.plot(points[:, 0], points[:, 1], "r.", ms=4)
    if cameranames or points is not None:
        ax.legend()
    return _finish(fig, hardcopy)


def show_splined_model_correction(model, *, vectorfield=False,
                                  vectorscale=1.0, xy=None,
                                  imager_domain=True,
                                  gridn_width=60, gridn_height=None,
                                  observations=False,
                                  valid_intrinsics_region=False,
                                  title=None, extratitle=None,
                                  hardcopy=None, **kwargs):
    """The spline deltau correction surface (reference: visualization.py:2711).

    xy='x'|'y' shows that single correction surface as a signed heatmap
    (with the knot grid overlaid); default shows |deltau|.
    imager_domain=False plots over the stereographic (u) domain instead
    of pixels — the spline's own domain, where the knot grid is
    regular."""
    from .lensmodels import (parse_lensmodel, splined_deltau,
                             stereographic_uv, knots_for_splined_models)
    lensmodel, intr = model.intrinsics()
    lm = parse_lensmodel(lensmodel)
    if lm.family != "LENSMODEL_SPLINED_STEREOGRAPHIC":
        raise Exception("show_splined_model_correction requires a splined "
                        "model")
    W, H = model.imagersize()
    v, q = sample_imager_unproject(gridn_width, gridn_height, W, H,
                                   lensmodel, intr)
    import jax.numpy as jnp
    u = stereographic_uv(jnp.asarray(v))
    coeffs = jnp.asarray(intr[4:]).reshape(lm.Ny, lm.Nx, 2)
    du = np.asarray(splined_deltau(u, coeffs, lm))
    dom = np.asarray(q) if imager_domain else np.asarray(u)
    fig, ax = _new_axes(_title(
        "Splined model correction deltau" +
        (f" ({xy} surface)" if xy else ""), title, extratitle))
    if vectorfield:
        ax.quiver(dom[..., 0], dom[..., 1], du[..., 0] * vectorscale,
                  du[..., 1] * vectorscale)
        if imager_domain:
            ax.invert_yaxis()
    else:
        z = (du[..., 0 if xy == "x" else 1] if xy
             else np.linalg.norm(du, axis=-1))
        im = ax.imshow(z, origin="upper",
                       extent=(dom[..., 0].min(), dom[..., 0].max(),
                               dom[..., 1].max(), dom[..., 1].min()))
        fig.colorbar(im, ax=ax)
        if not imager_domain:
            # overlay the knot grid (regular in u)
            ux, uy = (np.asarray(k)
                      for k in knots_for_splined_models(lensmodel))
            gx, gy = np.meshgrid(ux, uy)
            ax.plot(gx.ravel(), gy.ravel(), ".", ms=1.5, color="white",
                    alpha=0.6)
    if observations and imager_domain:
        _overlay_observations(ax, model)
    if valid_intrinsics_region and imager_domain:
        _overlay_valid_region(ax, model)
    return _finish(fig, hardcopy)


# ----------------------------------------------------------------------------
# residual analysis suite (reference: visualization.py:3223-4090)
# ----------------------------------------------------------------------------

def _model_or_oi(model_or_oi, icam_intrinsics):
    """The residual suite accepts EITHER a cameramodel (with embedded
    optimization_inputs; the camera selects itself, reference
    visualization.py:3713) OR raw optimization_inputs + icam."""
    if hasattr(model_or_oi, "optimization_inputs"):
        oi = model_or_oi.optimization_inputs()
        if oi is None:
            raise Exception("model has no optimization_inputs")
        if icam_intrinsics is None:
            icam_intrinsics = model_or_oi.icam_intrinsics()
        return oi, icam_intrinsics, model_or_oi
    return model_or_oi, icam_intrinsics, None


def _board_residuals(optimization_inputs, x=None, icam_intrinsics=None,
                     residuals=None):
    from .optimize import optimizer_callback
    from .optimize.layout import spec_from_inputs, normalize_inputs
    if x is None:
        x = residuals            # reference synonym
    kw = normalize_inputs(optimization_inputs)
    spec = spec_from_inputs(**kw)
    if x is None:
        _, x, _ = optimizer_callback(no_jacobian=True, **kw)
    H = spec.calibration_object_height_n
    W = spec.calibration_object_width_n
    res = np.asarray(x[:spec.num_measurements_boards]).reshape(-1, H, W, 2)
    obs = np.asarray(kw["observations_board"])
    idx = np.asarray(kw["indices_frame_camintrinsics_camextrinsics"])
    if icam_intrinsics is not None:
        sel = idx[:, 1] == icam_intrinsics
        res, obs, idx = res[sel], obs[sel], idx[sel]
    return res, obs, idx


def show_residuals_board_observation(optimization_inputs, i_observation,
                                     *, from_worst=False,
                                     i_observations_sorted_from_worst=None,
                                     x=None, residuals=None,
                                     paths=None, image_path_prefix=None,
                                     image_directory=None, showimage=True,
                                     vectorscale=20, circlescale=1.0,
                                     cbmax=None, title=None,
                                     extratitle=None,
                                     hardcopy=None, **kwargs):
    """Residual vectorfield for ONE board observation
    (reference: visualization.py:3223).

    from_worst=True indexes observations by DESCENDING worst-residual
    rank instead of file order (i_observation=0 is then the worst one —
    the reference's triage workflow); i_observations_sorted_from_worst
    supplies that order precomputed.  paths (per-observation image
    filenames, with optional image_path_prefix/image_directory rewrites)
    + showimage=True underlay the actual chessboard image.  circlescale
    scales the outlier markers."""
    res, obs, idx = _board_residuals(optimization_inputs, x=x,
                                     residuals=residuals)
    if i_observations_sorted_from_worst is not None:
        i_observation = int(
            i_observations_sorted_from_worst[i_observation])
    elif from_worst:
        worst = np.max(np.linalg.norm(res, axis=-1).reshape(
            len(res), -1), axis=-1)
        order = np.argsort(-worst)
        i_observation = int(order[i_observation])
    o = obs[i_observation]
    r = res[i_observation]
    iframe, ici = int(idx[i_observation][0]), int(idx[i_observation][1])
    rms = float(np.sqrt(np.mean(np.sum(r * r, axis=-1))))
    fig, ax = _new_axes(_title(
        f"Residuals: observation {i_observation} "
        f"(frame {iframe}, cam {ici}); rms {rms:.3f} px", title,
        extratitle))
    if paths is not None and showimage:
        path = paths[i_observation]
        import os as _os
        if image_path_prefix is not None:
            path = _os.path.join(image_path_prefix, path)
        elif image_directory is not None:
            path = _os.path.join(image_directory, _os.path.basename(path))
        try:
            from .image import load_image
            ax.imshow(np.asarray(load_image(path, bits_per_pixel=8,
                                            channels=1)), cmap="gray")
        except OSError as e:
            import warnings
            warnings.warn(f"could not load image '{path}': {e}",
                          stacklevel=2)
    mag = np.linalg.norm(r, axis=-1)
    qv = ax.quiver(o[..., 0], o[..., 1], r[..., 0], r[..., 1], mag,
                   clim=(0, cbmax) if cbmax else None)
    fig.colorbar(qv, ax=ax)
    out = o[..., 2] <= 0
    if np.any(out):
        ax.plot(o[..., 0][out], o[..., 1][out], "o", ms=8 * circlescale,
                mfc="none", mec="red", label="outliers")
        ax.legend()
    ax.invert_yaxis()
    return _finish(fig, hardcopy)


def show_residuals_histogram(optimization_inputs, icam_intrinsics=None,
                             x=None, residuals=None, *,
                             binwidth=0.02, title=None, extratitle=None,
                             hardcopy=None, **kwargs):
    """Residual histogram + gaussian fit (reference: visualization.py:3486)."""
    optimization_inputs, icam_intrinsics, _ = _model_or_oi(
        optimization_inputs, icam_intrinsics)
    res, obs, idx = _board_residuals(optimization_inputs, x,
                                     icam_intrinsics, residuals)
    inlier = obs[..., 2] > 0
    r = res[inlier].ravel()
    fig, ax = _new_axes(_title("Residual histogram", title, extratitle))
    ax.hist(r, bins=np.arange(r.min(), r.max() + binwidth, binwidth),
            density=True, alpha=0.7)
    s = r.std()
    xs = np.linspace(r.min(), r.max(), 200)
    ax.plot(xs, np.exp(-xs * xs / (2 * s * s)) / np.sqrt(2 * np.pi * s * s))
    ax.set_xlabel("residual [pixels]")
    return _finish(fig, hardcopy)


def show_residuals_vectorfield(model, x=None, residuals=None, *,
                               icam_intrinsics=None,
                               vectorscale=20, cbmax=None,
                               valid_intrinsics_region=True,
                               title=None, extratitle=None, hardcopy=None,
                               **kwargs):
    """All residuals as a vectorfield over the imager
    (reference: visualization.py:3713).  Accepts a cameramodel (selects
    its own camera, draws its valid-intrinsics region by default) or raw
    optimization_inputs."""
    oi, icam_intrinsics, m = _model_or_oi(model, icam_intrinsics)
    res, obs, idx = _board_residuals(oi, x, icam_intrinsics, residuals)
    inlier = obs[..., 2] > 0
    q = obs[..., :2][inlier]
    r = res[inlier]
    fig, ax = _new_axes(_title("Residual vectorfield", title, extratitle))
    qv = ax.quiver(q[:, 0], q[:, 1], r[:, 0] * vectorscale,
                   r[:, 1] * vectorscale,
                   np.linalg.norm(r, axis=-1),
                   clim=(0, cbmax) if cbmax else None)
    fig.colorbar(qv, ax=ax)
    if valid_intrinsics_region and m is not None:
        _overlay_valid_region(ax, m)
    ax.invert_yaxis()
    return _finish(fig, hardcopy)


def show_residuals_magnitudes(model, x=None, residuals=None, *,
                              icam_intrinsics=None,
                              cbmax=None, valid_intrinsics_region=True,
                              title=None, extratitle=None, hardcopy=None,
                              **kwargs):
    """Residual magnitudes as a scatter over the imager
    (reference: visualization.py:3843)."""
    oi, icam_intrinsics, m = _model_or_oi(model, icam_intrinsics)
    res, obs, idx = _board_residuals(oi, x, icam_intrinsics, residuals)
    inlier = obs[..., 2] > 0
    q = obs[..., :2][inlier]
    mag = np.linalg.norm(res[inlier], axis=-1)
    fig, ax = _new_axes(_title("Residual magnitudes", title, extratitle))
    sc = ax.scatter(q[:, 0], q[:, 1], c=mag, s=4, vmax=cbmax)
    fig.colorbar(sc, ax=ax)
    if valid_intrinsics_region and m is not None:
        _overlay_valid_region(ax, m)
    ax.invert_yaxis()
    return _finish(fig, hardcopy)


def show_residuals_directions(model, x=None, residuals=None, *,
                              icam_intrinsics=None,
                              valid_intrinsics_region=True,
                              title=None, extratitle=None, hardcopy=None,
                              **kwargs):
    """Residual directions over the imager (reference: visualization.py:3965).
    Systematic direction patterns = the lens model cannot fit the data
    (the reference's diagnostic for model-capacity problems)."""
    oi, icam_intrinsics, m = _model_or_oi(model, icam_intrinsics)
    res, obs, idx = _board_residuals(oi, x, icam_intrinsics, residuals)
    inlier = obs[..., 2] > 0
    q = obs[..., :2][inlier]
    th = np.degrees(np.arctan2(res[inlier][:, 1], res[inlier][:, 0]))
    fig, ax = _new_axes(_title("Residual directions", title, extratitle))
    sc = ax.scatter(q[:, 0], q[:, 1], c=th, cmap="hsv", s=4,
                    vmin=-180, vmax=180)
    fig.colorbar(sc, ax=ax)
    if valid_intrinsics_region and m is not None:
        _overlay_valid_region(ax, m)
    ax.invert_yaxis()
    return _finish(fig, hardcopy)


def show_residuals_regional(model, x=None, residuals=None, *,
                            icam_intrinsics=None,
                            gridn_width=20, gridn_height=None,
                            valid_intrinsics_region=True,
                            title=None, extratitle=None, hardcopy=None,
                            **kwargs):
    """Mean residual magnitude binned over imager regions
    (reference: visualization.py:4090)."""
    from .optimize.layout import spec_from_inputs, normalize_inputs
    oi, icam_intrinsics, m = _model_or_oi(model, icam_intrinsics)
    kw = normalize_inputs(oi)
    spec = spec_from_inputs(**kw)
    res, obs, idx = _board_residuals(kw, x, icam_intrinsics, residuals)
    W, H = spec.imagersizes[0]
    if gridn_height is None:
        gridn_height = int(round(H / W * gridn_width))
    inlier = obs[..., 2] > 0
    q = obs[..., :2][inlier]
    mag = np.linalg.norm(res[inlier], axis=-1)
    gx = np.clip((q[:, 0] / W * gridn_width).astype(int), 0, gridn_width - 1)
    gy = np.clip((q[:, 1] / H * gridn_height).astype(int), 0,
                 gridn_height - 1)
    sums = np.zeros((gridn_height, gridn_width))
    counts = np.zeros((gridn_height, gridn_width))
    np.add.at(sums, (gy, gx), mag)
    np.add.at(counts, (gy, gx), 1)
    mean = np.where(counts > 0, sums / np.maximum(counts, 1), np.nan)
    fig, ax = _new_axes(_title("Regional mean residual [pixels]", title,
                               extratitle))
    im = ax.imshow(mean, origin="upper", extent=(0, W, H, 0))
    fig.colorbar(im, ax=ax)
    if valid_intrinsics_region and m is not None:
        _overlay_valid_region(ax, m)
    return _finish(fig, hardcopy), mean


def annotate_image__valid_intrinsics_region(image, model, *, color=(0, 0, 255)):
    """Draw the valid-intrinsics region into a BGR image in place
    (reference: visualization.py:3101)."""
    region = model.valid_intrinsics_region()
    if region is None:
        return image
    pts = np.asarray(region).astype(int)
    for i in range(len(pts) - 1):
        _draw_line(image, pts[i], pts[i + 1], color)
    return image


def _draw_line(img, p0, p1, color):
    n = int(max(abs(p1[0] - p0[0]), abs(p1[1] - p0[1]), 1))
    xs = np.linspace(p0[0], p1[0], n + 1).astype(int)
    ys = np.linspace(p0[1], p1[1], n + 1).astype(int)
    ok = (xs >= 0) & (xs < img.shape[1]) & (ys >= 0) & (ys < img.shape[0])
    if img.ndim == 3:
        img[ys[ok], xs[ok]] = color
    else:
        img[ys[ok], xs[ok]] = color[0]


def show_stereo_pair_diff(model_pairs, *, gridn_width=60, gridn_height=None,
                          distance=None, vectorfield=False, vectorscale=1.0,
                          observations=False,
                          valid_intrinsics_region=False,
                          cbmax=4, title=None, extratitle=None,
                          hardcopy=None, **kwargs):
    """Heatmap/vectorfield of the cam0->cam1 reprojection mismatch between
    two calibrations of the same stereo rig (reference:
    visualization.py:1431; analysis: model_analysis.stereo_pair_diff)."""
    from .model_analysis import stereo_pair_diff
    difflen, diff, q0 = stereo_pair_diff(
        model_pairs, gridn_width=gridn_width, gridn_height=gridn_height,
        distance=distance)
    difflen = np.asarray(difflen)
    q0 = np.asarray(q0)
    fig, ax = _new_axes(_title("Stereo-pair diff (pixels)", title,
                               extratitle))
    if vectorfield:
        diff = np.asarray(diff)
        qv = ax.quiver(q0[..., 0], q0[..., 1],
                       diff[..., 0] * vectorscale,
                       diff[..., 1] * vectorscale, difflen)
        fig.colorbar(qv, ax=ax)
        ax.invert_yaxis()
    else:
        im = ax.imshow(difflen, origin="upper", vmin=0, vmax=cbmax,
                       extent=(q0[..., 0].min(), q0[..., 0].max(),
                               q0[..., 1].max(), q0[..., 1].min()))
        fig.colorbar(im, ax=ax)
    if observations:
        _overlay_observations(ax, model_pairs[0][0])
    if valid_intrinsics_region:
        _overlay_valid_region(ax, model_pairs[0][0])
    return _finish(fig, hardcopy), difflen


def fitted_gaussian_equation(*, binwidth, x=None, mean=None, sigma=None,
                             N=None, legend=None):
    """Gnuplot-style 'equation' string for a gaussian PDF scaled to overlay
    a histogram of bin width `binwidth` (reference: visualization.py:834).

    The PDF is scaled by k = N sqrt(2 pi) sigma erf(binwidth/(2 sqrt(2)
    sigma)) so its peak lines up with the expected central-bin count.
    Pass the raw samples `x`, OR the statistics (mean, sigma, N)."""
    from scipy.special import erf
    if x is not None:
        if mean is not None or sigma is not None or N is not None:
            raise Exception("pass either x or (mean, sigma, N), not both")
        x = np.asarray(x)
        sigma = float(np.std(x))
        mean = float(np.mean(x))
        N = len(x)
    elif mean is None or sigma is None or N is None:
        raise Exception("without x, all of (mean, sigma, N) are required")
    var = sigma * sigma
    k = N * np.sqrt(2. * np.pi) * sigma * \
        erf(binwidth / (2. * np.sqrt(2.) * sigma))
    title = 'notitle' if legend is None else f'title "{legend}"'
    return (f'{k}*exp(-(x-{mean})*(x-{mean})/(2.*{var})) / '
            f'sqrt(2.*pi*{var}) {title} with lines lw 2')


def imagergrid_using(imagersize, gridn_width, gridn_height=None):
    """Gnuplot 'using' expression mapping grid indices to pixel coordinates
    for imager colormap plots (reference: visualization.py:3160)."""
    W, H = imagersize
    if gridn_height is None:
        gridn_height = int(round(H / W * gridn_width))
    return '($1*{}):($2*{}):3'.format(float(W - 1) / (gridn_width - 1),
                                      float(H - 1) / (gridn_height - 1))
