"""CLI glue smoke tests (the reference's main.cpp equivalent, SURVEY.md §2 #18)."""

import json
import os

import numpy as np
import pytest

from tpu_ray import cli


def test_cli_scenes(capsys):
    cli.main(["scenes"])
    out = capsys.readouterr().out
    for name in ("sphere", "triangles", "bunny", "mandelbulb", "mixed"):
        assert name in out


def test_cli_render_writes_png(tmp_path, capsys):
    out = tmp_path / "r.png"
    cli.main(["render", "--scene", "sphere", "--width", "32", "--height", "32",
              "--out", str(out)])
    assert out.exists() and out.stat().st_size > 100
    assert "Mrays/s" in capsys.readouterr().out


def test_cli_render_turntable(tmp_path):
    out = tmp_path / "t.png"
    cli.main(["render", "--scene", "sphere", "--width", "16", "--height", "16",
              "--out", str(out), "--turntable", "3"])
    for i in range(3):
        assert (tmp_path / f"t_{i:03d}.png").exists()


def test_cli_render_progressive(tmp_path, capsys):
    out = tmp_path / "p.png"
    cli.main(["render", "--scene", "sphere", "--width", "32", "--height", "32",
              "--out", str(out), "--progressive", "2"])
    assert out.exists()
    for k in range(2):
        prog = tmp_path / f"p_prog{k}.png"
        assert prog.exists() and prog.stat().st_size > 50
    assert "progressive final" in capsys.readouterr().out


def test_cli_fit_demo(tmp_path, capsys):
    cli.main(["fit", "--scene", "sphere", "--trainable", "sdf.sph_radius",
              "--steps", "3", "--width", "16", "--height", "16",
              "--out", str(tmp_path / "f.png")])
    out = capsys.readouterr().out
    assert "final loss" in out
    assert (tmp_path / "f.png").exists()


def test_cli_bench_json(capsys):
    cli.main(["bench", "--scene", "sphere", "--forward-only"])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    data = json.loads(line)
    assert {"metric", "value", "unit", "vs_baseline"} <= set(data)


def _load_example(name):
    import importlib.util
    import os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(repo, f"examples/{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_inverse_rendering_example_converges(tmp_path):
    """The repo example must actually recover the scene (small budget)."""
    mod = _load_example("inverse_rendering")
    fitted, hist = mod.main(str(tmp_path))
    assert hist[-1] < hist[0] * 0.25
    assert abs(float(fitted.sdf.sph_radius[0]) - 1.0) < 0.2


@pytest.mark.slow
def test_inverse_pose_silhouette_recovery(tmp_path):
    """VERDICT r4 item 3 done-criterion: an in-plane translation of a
    floating triangle (pure silhouette motion) stalls under hard visibility
    and is recovered by the mesh edge-band coverage."""
    mod = _load_example("inverse_pose")
    err_hard, err_soft = mod.main_silhouette(str(tmp_path), steps=120,
                                             verbose=False)
    assert err_hard > 0.08  # hard visibility: no signal, fit stalls
    assert err_soft < 0.02  # mesh_silhouette: translation recovered
