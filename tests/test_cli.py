"""CLI + JSON scene schema tests."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from ray_tracer_tpu.scene import schema

SCENE_DOC = {
    "materials": [
        {"name": "white"},
        {"name": "glow", "emission_color": [1, 1, 1], "emission_strength": 2.0,
         "albedo": [0, 0, 0]},
        {"name": "glass", "ior": 1.5},
    ],
    "spheres": [
        {"position": [0, 0, 2], "radius": 0.5, "material": "glass"},
        {"position": [0, -2, 2], "radius": 0.5, "material": 1},
    ],
    "environment": {"enabled": True},
    "camera": {"position": [0, 0, -1], "angles_deg": [0, 0, 0], "fov": 60},
}


def test_schema_roundtrip(tmp_path):
    p = tmp_path / "scene.json"
    p.write_text(json.dumps(SCENE_DOC))
    b = schema.load_scene(str(p))
    scene = b.compile()
    assert scene.n_spheres == 2
    assert scene.meta["n_materials"] == 3
    # name and index refs resolve to the same table
    assert int(scene.sphere_mat[0]) == 2
    assert int(scene.sphere_mat[1]) == 1
    np.testing.assert_allclose(float(scene.mat_ior[2]), 1.5)
    assert scene.meta["camera"][2] == 60.0


def test_schema_objects_relative_path(tmp_path, assets_dir):
    doc = {
        "materials": [{"name": "m"}],
        "objects": [{"path": "cube.obj", "material": "m", "scale": 0.5}],
    }
    p = tmp_path / "s.json"
    p.write_text(json.dumps(doc))
    import shutil

    shutil.copy(os.path.join(assets_dir, "cube.obj"), tmp_path / "cube.obj")
    scene = schema.load_scene(str(p)).compile()
    assert scene.meta["n_tris"] == 12


@pytest.mark.parametrize("cmd", [["info", "--preset", "cornell"]])
def test_cli_info(cmd):
    out = subprocess.run(
        [sys.executable, "-m", "ray_tracer_tpu.cli"] + cmd + ["--cpu"],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr
    meta = json.loads(out.stdout)
    assert meta["n_objects"] == 9


def test_cli_render_png(tmp_path):
    out_png = str(tmp_path / "o.png")
    out = subprocess.run(
        [
            sys.executable, "-m", "ray_tracer_tpu.cli", "render",
            "--preset", "sphere_diffuse", "--cpu",
            "--width", "24", "--height", "24", "--spp", "2", "--bounces", "2",
            "-o", out_png,
        ],
        capture_output=True,
        text=True,
        timeout=500,
    )
    assert out.returncode == 0, out.stderr
    report = json.loads(out.stdout)
    assert report["output"] == out_png
    assert os.path.getsize(out_png) > 100
