"""cameramodel I/O: write/read round trips, extrinsics representations,
optimization_inputs embedding (mirrors test-cameramodel.py)."""

import io

import numpy as np

import mrcal_tpu as mrcal


def _model():
    intr = np.array([1512., 1510., 1200.5, 800.5, -0.01, 0.02, -0.001, 0.002])
    return mrcal.cameramodel(
        intrinsics=("LENSMODEL_OPENCV4", intr),
        imagersize=(2400, 1600),
        rt_cam_ref=np.array([0.1, -0.2, 0.05, 1.0, 2.0, -0.5]),
        valid_intrinsics_region=np.array(
            [[0, 0], [2399, 0], [2399, 1599], [0, 1599], [0, 0]], dtype=float))


def test_write_read_roundtrip(tmp_path):
    m = _model()
    f = str(tmp_path / "cam.cameramodel")
    m.write(f)
    m2 = mrcal.cameramodel(f)
    assert m2.intrinsics()[0] == m.intrinsics()[0]
    assert np.allclose(m2.intrinsics()[1], m.intrinsics()[1])
    assert np.allclose(m2.imagersize(), m.imagersize())
    assert np.allclose(m2.extrinsics_rt_fromref(), m.extrinsics_rt_fromref())
    assert np.allclose(m2.valid_intrinsics_region(),
                       m.valid_intrinsics_region())


def test_string_roundtrip():
    m = _model()
    s = str(m)
    m2 = mrcal.cameramodel(io.StringIO(s))
    assert np.allclose(m2.intrinsics()[1], m.intrinsics()[1])


def test_parser_rejects_malformed():
    """Malformed .cameramodel inputs raise CameramodelParseException
    (reference: test-parser-cameramodel.c's malformed cases against the
    re2c parser)."""
    import pytest
    good = str(_model())
    bad_cases = [
        "",                                   # empty
        "not a cameramodel at all",           # garbage
        "{",                                  # truncated dict
        good[: len(good) // 2],               # truncated mid-stream
        good.replace("'intrinsics':", "'intrnsics':", 1),    # missing key
        good.replace("'imagersize':", "'imagersize_':", 1),  # missing key
        "{ 'lensmodel': 'LENSMODEL_BOGUS_42',"
        " 'intrinsics': [1,2,3,4],"
        " 'imagersize': [10,10],"
        " 'extrinsics': [0,0,0,0,0,0] }",     # unknown lensmodel
        "{ 'lensmodel': 'LENSMODEL_PINHOLE',"
        " 'intrinsics': [1,2,3],"             # wrong param count
        " 'imagersize': [10,10],"
        " 'extrinsics': [0,0,0,0,0,0] }",
    ]
    for s in bad_cases:
        # multi-format ingestion wraps the per-format
        # CameramodelParseException in a summary Exception (like the
        # reference's "couldn't parse" aggregation); either is a clean
        # rejection, never a crash or a silently-wrong model
        with pytest.raises(Exception) as e:
            mrcal.cameramodel(io.StringIO(s))
        assert ("parse" in str(e.value).lower()
                or isinstance(e.value, (mrcal.CameramodelParseException,
                                        ValueError, KeyError))), \
            (s[:40], type(e.value), str(e.value)[:80])

    # the good model still parses after all that
    m2 = mrcal.cameramodel(io.StringIO(good))
    assert np.allclose(m2.intrinsics()[1], _model().intrinsics()[1])


def test_extrinsics_representations():
    m = _model()
    rt_fromref = m.extrinsics_rt_fromref()
    rt_toref = m.extrinsics_rt_toref()
    assert np.allclose(np.asarray(mrcal.invert_rt(rt_toref)), rt_fromref,
                       atol=1e-12)
    Rt_fromref = m.extrinsics_Rt_fromref()
    assert np.allclose(np.asarray(mrcal.rt_from_Rt(Rt_fromref)), rt_fromref,
                       atol=1e-12)
    # setters invert correctly
    m.extrinsics_rt_toref(rt_toref)
    assert np.allclose(m.extrinsics_rt_fromref(), rt_fromref, atol=1e-12)


def test_optimization_inputs_embedding(tmp_path):
    from test_calibration import make_scene, optimization_inputs_from_scene
    scene = make_scene(Ncameras=1, Nframes=4)
    oi = optimization_inputs_from_scene(scene, perturb=False)
    oi_clean = {k: v for k, v in oi.items() if v is not None}
    m = mrcal.cameramodel(optimization_inputs=oi_clean, icam_intrinsics=0)
    f = str(tmp_path / "cam.cameramodel")
    m.write(f)
    m2 = mrcal.cameramodel(f)
    oi2 = m2.optimization_inputs()
    assert oi2["lensmodel"] == oi["lensmodel"]
    assert np.allclose(oi2["intrinsics"], oi["intrinsics"])
    assert np.allclose(oi2["observations_board"], oi["observations_board"])
    assert np.allclose(oi2["frames_rt_toref"], oi["frames_rt_toref"])
    assert m2.icam_intrinsics() == 0
    # the embedded problem must be solvable as-is
    assert mrcal.num_measurements(**oi2) == mrcal.num_measurements(**oi_clean)


def test_cahvor_roundtrip(tmp_path):
    intr = np.array([1512., 1510., 1200.5, 800.5,
                     0.01, -0.02, -0.3, 0.01, -0.005])
    m = mrcal.cameramodel(
        intrinsics=("LENSMODEL_CAHVOR", intr),
        imagersize=(2400, 1600),
        rt_cam_ref=np.array([0.1, -0.2, 0.05, 1.0, 2.0, -0.5]))
    f = str(tmp_path / "cam.cahvor")
    m.write(f)
    m2 = mrcal.cameramodel(f) if False else None
    # read back through the cahvor reader
    from mrcal_tpu import cahvor
    m2 = cahvor.read(f)
    assert m2.intrinsics()[0] == "LENSMODEL_CAHVOR"
    assert np.allclose(m2.intrinsics()[1][:4], intr[:4], atol=1e-6)
    assert np.allclose(m2.intrinsics()[1][4:], intr[4:], atol=1e-6)
    assert np.allclose(m2.extrinsics_rt_fromref(), m.extrinsics_rt_fromref(),
                       atol=1e-6)


def test_cholmod_factorization_equivalent():
    np.random.seed(0)
    J = np.random.randn(40, 12)
    f = mrcal.CHOLMOD_factorization(J)
    bt = np.random.randn(5, 12)
    xt = np.asarray(f.solve_xt_JtJ_bt(bt))
    # xt JtJ = bt
    assert np.allclose(xt @ (J.T @ J), bt, atol=1e-9)
    # composing mode-L then mode-Lt solves == the full A solve
    x1 = np.asarray(f.solve_xt_JtJ_bt(np.asarray(
        f.solve_xt_JtJ_bt(bt, mode="L")), mode="Lt"))
    assert np.allclose(x1, xt, atol=1e-9)
    assert 0 < f.rcond() <= 1


def test_read_transforms():
    # JPL-toolkit transforms.txt (reference: mrcal/cahvor.py:419)
    import io
    import mrcal_tpu
    txt = ("# comment\n"
           "ins2veh = (1 2 3) (1 0 0 0)\n"
           "cam2ins[0] = (0.5 0 0) "
           "(0.7071067811865476 0 0.7071067811865476 0)\n")
    t = mrcal_tpu.read_transforms(io.StringIO(txt))
    assert np.allclose(t['veh_from_ins'][:3], np.eye(3))
    assert np.allclose(t['veh_from_ins'][3], [1, 2, 3])
    R = t['ins_from_camera'][0][:3]
    # 90 deg rotation about +y: maps +z to +x
    assert np.allclose(R @ np.array([0., 0., 1.]), [1., 0., 0.], atol=1e-12)


def test_read_opencv_ros_yaml(tmp_path):
    """The constructor ingests OpenCV/ROS yaml directly (reference:
    cameramodel.py:895-1165 parse_as_opencv_or_ros)."""
    y = """
image_width: 2448
image_height: 2050
camera_name: prosilica
camera_matrix:
  rows: 3
  cols: 3
  data: [4827.94, 0, 1223.5, 0, 4835.62, 1024.5, 0, 0, 1]
distortion_model: plumb_bob
distortion_coefficients:
  rows: 1
  cols: 5
  data: [-0.41527, 0.31874, -0.00197, 0.00071, 0]
rectification_matrix:
  rows: 3
  cols: 3
  data: [1, 0, 0, 0, 1, 0, 0, 0, 1]
projection_matrix:
  rows: 3
  cols: 4
  data: [4827.94, 0, 1223.5, 0, 0, 4835.62, 1024.5, 0, 0, 0, 1, 0]
"""
    f = tmp_path / "opencv.yaml"
    f.write_text(y)
    m = mrcal.cameramodel(str(f))
    lm, intr = m.intrinsics()
    assert lm == "LENSMODEL_OPENCV5"
    assert np.allclose(intr[:4], [4827.94, 4835.62, 1223.5, 1024.5])
    assert np.allclose(intr[4:], [-0.41527, 0.31874, -0.00197, 0.00071, 0])
    assert m.imagersize().tolist() == [2448, 2050]
    assert np.allclose(m.rt_cam_ref(), 0)
    # round-trip: write native, read back
    out = tmp_path / "out.cameramodel"
    m.write(str(out))
    m2 = mrcal.cameramodel(str(out))
    assert np.allclose(m2.intrinsics()[1], intr)


def test_read_ros_camerainfo(tmp_path):
    """sensor_msgs/CameraInfo rostopic-echo dump with K/D/R/P keys and a
    rectification translation in P[:,3]."""
    y = """
height: 600
width: 960
distortion_model: "rational_polynomial"
D: [1.5, 0.4, 0.1, -9.2e-05, 0.1, 1.9, 0.9, 0.2]
K: [420.1, 0.1, 479.1, 0.1, 420.1, 295.1, 0.1, 0.1, 1.1]
R: [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0]
P: [600.0, 0.0, 480.0, -20.3, 0.0, 600.0, 300.0, 0.0, 0.0, 0.0, 1.0, 0.0]
"""
    # K has nonzero off-diagonals -> must be rejected
    f = tmp_path / "bad.yaml"
    f.write_text(y)
    import pytest
    with pytest.raises(Exception):
        mrcal.cameramodel(str(f))
    y = y.replace("K: [420.1, 0.1, 479.1, 0.1, 420.1, 295.1, 0.1, 0.1, 1.1]",
                  "K: [420.1, 0, 479.1, 0, 420.1, 295.1, 0, 0, 1]")
    f2 = tmp_path / "good.yaml"
    f2.write_text(y)
    m = mrcal.cameramodel(str(f2))
    lm, intr = m.intrinsics()
    assert lm == "LENSMODEL_OPENCV8"
    assert m.imagersize().tolist() == [960, 600]
    # extrinsics: t_ref_cam = -P[:,3]/P[0,0]; R=identity so
    # rt_cam_ref translation = +P[:,3]/P[0,0]
    assert np.allclose(m.rt_cam_ref()[3:], [-20.3 / 600.0, 0, 0])


def test_read_equidistant_rejected(tmp_path):
    y = """
width: 100
height: 80
distortion_model: equidistant
D: [0.1, 0.01, 0.001, 0.0001]
K: [100, 0, 50, 0, 100, 40, 0, 0, 1]
P: [100, 0, 50, 0, 0, 100, 40, 0, 0, 0, 1, 0]
"""
    f = tmp_path / "equi.yaml"
    f.write_text(y)
    import pytest
    with pytest.raises(Exception, match="equidistant"):
        mrcal.cameramodel(str(f))


def test_read_cahvor_via_constructor(tmp_path):
    """The constructor fallback chain also reads .cahvor content."""
    intr = np.array([800., 790., 320., 240., 0.01, -0.02, 0.03, 0.2, 0.01])
    m = mrcal.cameramodel(intrinsics=("LENSMODEL_CAHVOR", intr),
                          imagersize=(640, 480),
                          rt_cam_ref=np.array([0.01, -0.02, 0.03,
                                               0.1, 0.2, 0.3]))
    f = tmp_path / "model.cahvor"
    m.write(str(f))
    m2 = mrcal.cameramodel(str(f))
    lm2, intr2 = m2.intrinsics()
    assert lm2 == "LENSMODEL_CAHVOR"
    assert np.allclose(intr2, intr, atol=1e-6)
    assert np.allclose(m2.rt_cam_ref(), m.rt_cam_ref(), atol=1e-6)


def test_traverse_sensor_links():
    """Docstring example from the reference traverse_sensor_links."""
    connectivity_matrix = np.array(((0, 5, 0, 3, 0),
                                    (5, 0, 2, 5, 0),
                                    (0, 2, 0, 0, 5),
                                    (3, 5, 0, 0, 0),
                                    (0, 0, 5, 0, 0),), dtype=np.uint16)
    links = []
    ok = mrcal.traverse_sensor_links(
        connectivity_matrix=connectivity_matrix,
        callback_sensor_link=lambda idx_to, idx_from:
            links.append((idx_from, idx_to)) or True)
    assert ok
    assert links == [(0, 1), (0, 3), (1, 2), (2, 4)]

    # aborting callback
    ok = mrcal.traverse_sensor_links(
        connectivity_matrix=connectivity_matrix,
        callback_sensor_link=lambda idx_to, idx_from: False)
    assert not ok

    # disjoint sensor never reported
    c2 = np.zeros((3, 3), dtype=np.uint16)
    c2[0, 1] = c2[1, 0] = 4
    links = []
    assert mrcal.traverse_sensor_links(
        connectivity_matrix=c2,
        callback_sensor_link=lambda t, f: links.append((f, t)) or True)
    assert links == [(0, 1)]

    import pytest
    with pytest.raises(Exception, match="symmetric"):
        mrcal.traverse_sensor_links(
            connectivity_matrix=np.array([[0, 1], [2, 0]]),
            callback_sensor_link=lambda t, f: True)
