"""Tracing/profiling subsystem (SURVEY.md §5.1 — greenfield on TPU: the
reference has only verbose stderr prints, mrcal.c:4714,6291)."""

import os

import numpy as np

import mrcal_tpu as mrcal
from mrcal_tpu import profiling

from test_calibration import make_scene, optimization_inputs_from_scene


def test_phase_nesting_and_accumulation():
    profiling.reset()
    with profiling.phase("outer"):
        with profiling.phase("inner"):
            pass
        with profiling.phase("inner"):
            pass
    t = profiling.timings()
    assert set(t) == {"outer", "outer/inner"}
    assert profiling.counts()["outer/inner"] == 2
    assert t["outer"] >= t["outer/inner"] >= 0.0
    profiling.reset()
    assert profiling.timings() == {}


def test_optimize_reports_phase_breakdown():
    scene = make_scene(Ncameras=1, Nframes=6, model="LENSMODEL_OPENCV4",
                       seed=2)
    oi = optimization_inputs_from_scene(scene)
    profiling.reset()
    stats = mrcal.optimize(**oi)
    t = stats["time_s"]
    assert "pack" in t
    assert any(k.startswith("solve") for k in t), t
    assert all(v >= 0 for v in t.values())
    # the global accumulators saw the same phases
    assert "pack" in profiling.timings()


def test_trace_noop_without_logdir(monkeypatch):
    monkeypatch.delenv("MRCAL_TPU_PROFILE", raising=False)
    with profiling.trace():
        x = 1 + 1
    assert x == 2


def test_trace_writes_device_profile(tmp_path, monkeypatch):
    """MRCAL_TPU_PROFILE dumps an xplane trace during optimize()."""
    logdir = tmp_path / "prof"
    monkeypatch.setenv("MRCAL_TPU_PROFILE", str(logdir))
    scene = make_scene(Ncameras=1, Nframes=6, model="LENSMODEL_OPENCV4",
                       seed=2)
    oi = optimization_inputs_from_scene(scene)
    mrcal.optimize(**oi)
    dumped = [p for p in logdir.rglob("*") if p.is_file()]
    assert dumped, "no profiler output written"
