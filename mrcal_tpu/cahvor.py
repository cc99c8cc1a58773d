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
    """Read a .cahvor file into a cameramodel (reference:
    mrcal/cahvor.py:274 — accepts a filename, an opened file, or a
    cameramodel, which passes through)."""
    from .cameramodel import cameramodel
    if isinstance(f, cameramodel):
        return f
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


def read_transforms(f):
    """Parse a JPL-toolkit transforms.txt into a dict (reference:
    mrcal/cahvor.py:419).  Lines:
        ins2veh      = (x y z) (qw qx qy qz)
        cam2ins[<i>] = (x y z) (qw qx qy qz)
    Returns {'veh_from_ins': Rt, 'ins_from_camera': {i: Rt}}."""
    needclose = False
    if isinstance(f, str):
        f = open(f, "r")
        needclose = True
    try:
        out = dict(veh_from_ins=None, ins_from_camera={})
        re_f = r'[-+]?(?:\d+(?:\.\d*)?|\.\d+)(?:[eE][-+]?\d+)?'
        re_pos = r'\(\s*({f})\s+({f})\s+({f})\s*\)'.format(f=re_f)
        re_quat = r'\(\s*({f})\s+({f})\s+({f})\s+({f})\s*\)'.format(f=re_f)

        def qt(m, ofs):
            g = [float(m.group(i + ofs)) for i in range(7)]
            # file order: x y z qw qx qy qz -> our qt = (qw qx qy qz, xyz)
            return np.asarray(poseutils.Rt_from_qt(
                np.array(g[3:7] + g[0:3])))

        for line in f:
            if re.match(r'^\s*#|^\s*$', line):
                continue
            m = re.match(r'\s*ins2veh\s*=\s*{p}\s*{q}\s*$'.format(
                p=re_pos, q=re_quat), line.rstrip())
            if m:
                if out['veh_from_ins'] is not None:
                    raise Exception("corrupt transforms: duplicate ins2veh")
                out['veh_from_ins'] = qt(m, 1)
                continue
            m = re.match(r'\s*cam2ins\s*\[(\d+)\]\s*=\s*{p}\s*{q}\s*$'.format(
                p=re_pos, q=re_quat), line.rstrip())
            if m:
                i = int(m.group(1))
                if i in out['ins_from_camera']:
                    raise Exception(
                        f"corrupt transforms: duplicate cam2ins[{i}]")
                out['ins_from_camera'][i] = qt(m, 2)
                continue
            raise Exception("transforms.txt: only 'ins2veh' and 'cam2ins' "
                            f"lines are understood; got {line!r}")
        if out['veh_from_ins'] is None:
            raise Exception("transforms file incomplete: no ins2veh")
        return out
    finally:
        if needclose:
            f.close()


def read_from_string(s):
    """Read a .cahvor model from a string (reference:
    mrcal/cahvor.py:288)."""
    import io
    return read(io.StringIO(s))
