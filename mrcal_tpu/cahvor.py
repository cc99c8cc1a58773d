"""Legacy JPL .cahvor/.cahvore text-format I/O
(reference: /root/reference/mrcal/cahvor.py).

The CAHV(OR(E)) representation stores the camera as direction vectors
C,A,H,V[,O,R[,E]]; mrcal's LENSMODEL_CAHVOR intrinsics vector
[fx,fy,cx,cy,alpha,beta,r0,r1,r2] maps to/from it exactly
(reference: cahvor.py _HVs_HVc_HVp / _construct_model)."""

import re

import numpy as np

from . import poseutils


def _parse_keyvalues(f):
    kv = {}
    for line in f:
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        m = re.match(r"([A-Za-z_][A-Za-z0-9_()' ]*?)\s*=\s*(.*)", line)
        if not m:
            continue
        key = m.group(1).strip()
        vals = m.group(2).split()
        try:
            kv[key] = np.array([float(v) for v in vals])
        except ValueError:
            kv[key] = m.group(2)
    return kv


def read(f):
    """Read a .cahvor file into a cameramodel."""
    from .cameramodel import cameramodel
    if isinstance(f, str):
        with open(f) as fh:
            kv = _parse_keyvalues(fh)
    else:
        kv = _parse_keyvalues(f)

    for key in ("C", "A", "H", "V"):
        if key not in kv:
            raise Exception(f".cahvor file missing '{key}'")
    C = kv["C"][:3]
    A = kv["A"][:3]
    Hv = kv["H"][:3]
    Vv = kv["V"][:3]

    # decompose H,V into intrinsics (standard CAHV math)
    hs = np.linalg.norm(np.cross(Hv, A))
    vs = np.linalg.norm(np.cross(Vv, A))
    hc = np.dot(Hv, A)
    vc = np.dot(Vv, A)
    Hp = (Hv - hc * A) / hs
    Vp = (Vv - vc * A) / vs

    R_cam_ref = np.stack([Hp, Vp, A], axis=0)
    # orthonormalize
    U, _, Vt = np.linalg.svd(R_cam_ref)
    R_cam_ref = U @ Vt
    t_cam_ref = -R_cam_ref @ C
    rt_cam_ref = np.concatenate(
        [np.asarray(poseutils.r_from_R(R_cam_ref)), t_cam_ref])

    if "E" in kv:
        O = kv["O"][:3]
        Rv = kv["R"][:3]
        E = kv["E"][:3]
        # alpha/beta from O in camera coords
        o_cam = R_cam_ref @ O
        beta = np.arcsin(o_cam[1])
        alpha = np.arctan2(o_cam[0], o_cam[2])
        linearity = float(kv.get("T", np.array([1.0]))[0]) \
            if "T" in kv else 1.0
        intr = np.array([hs, vs, hc, vc, alpha, beta, *Rv, *E])
        lensmodel = f"LENSMODEL_CAHVORE_linearity={linearity:.2f}"
    elif "O" in kv:
        O = kv["O"][:3]
        Rv = kv["R"][:3]
        o_cam = R_cam_ref @ O
        beta = np.arcsin(np.clip(o_cam[1], -1, 1))
        alpha = np.arctan2(o_cam[0], o_cam[2])
        intr = np.array([hs, vs, hc, vc, alpha, beta, *Rv])
        lensmodel = "LENSMODEL_CAHVOR"
    else:
        intr = np.array([hs, vs, hc, vc])
        lensmodel = "LENSMODEL_PINHOLE"

    dims = kv.get("Dimensions")
    imagersize = (np.array(dims[:2], dtype=int) if dims is not None
                  else np.array([int(hc * 2 + 1), int(vc * 2 + 1)]))
    return cameramodel(intrinsics=(lensmodel, intr),
                       imagersize=imagersize,
                       rt_cam_ref=rt_cam_ref)


def write(f, model, note=None):
    """Write a cameramodel to .cahvor format."""
    lensmodel, intr = model.intrinsics()
    fx, fy, cx, cy = intr[:4]
    rt = model.extrinsics_rt_fromref()
    R_cam_ref = np.asarray(poseutils.R_from_r(rt[:3]))
    t = rt[3:]
    C = -R_cam_ref.T @ t
    Hp, Vp, A = R_cam_ref[0], R_cam_ref[1], R_cam_ref[2]
    Hv = fx * Hp + cx * A
    Vv = fy * Vp + cy * A

    def wline(k, v):
        f.write(f"{k} = " + " ".join(f"{x:.12g}" for x in v) + "\n")

    if note is not None:
        for line in note.splitlines():
            f.write("# " + line + "\n")
    W, H = model.imagersize()
    f.write(f"Dimensions = {W} {H}\n")
    if lensmodel == "LENSMODEL_CAHVOR" or \
            lensmodel.startswith("LENSMODEL_CAHVORE"):
        f.write("Model = CAHVOR = perspective, distortion\n"
                if lensmodel == "LENSMODEL_CAHVOR" else
                "Model = CAHVORE3 = general\n")
    else:
        f.write("Model = CAHV = perspective, linear\n")
    wline("C", C)
    wline("A", A)
    wline("H", Hv)
    wline("V", Vv)
    if lensmodel == "LENSMODEL_CAHVOR" or \
            lensmodel.startswith("LENSMODEL_CAHVORE"):
        alpha, beta = intr[4], intr[5]
        sa, ca = np.sin(alpha), np.cos(alpha)
        sb, cb = np.sin(beta), np.cos(beta)
        o_cam = np.array([sa * cb, sb, ca * cb])
        O = R_cam_ref.T @ o_cam
        wline("O", O)
        wline("R", intr[6:9])
        if lensmodel.startswith("LENSMODEL_CAHVORE"):
            wline("E", intr[9:12])
            from .lensmodels import parse_lensmodel
            lm = parse_lensmodel(lensmodel)
            f.write(f"T = {lm.linearity:.12g}\n")
