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


def test_schema_save_roundtrip(tmp_path):
    from ray_tracer_tpu.scene import presets

    b = presets.cornell_spheres()
    p = str(tmp_path / "saved.json")
    schema.save_scene(b, p)
    doc = json.loads(open(p).read())
    assert len(doc["materials"]) == 6
    assert len(doc["spheres"]) == 2
    assert doc["camera"]["fov"] == 50.0
    # materials/spheres/lights/env/camera survive a load (objects reference
    # asset paths and are not embedded)
    b2 = schema.builder_from_dict(doc)
    s2 = b2.compile()
    assert s2.n_spheres == 2
    assert s2.n_lights == 1


def test_schema_save_roundtrip_mesh_instances(tmp_path, assets_dir):
    """Mesh instances round-trip through save_scene (path + TRS + flags)."""
    b = schema.builder_from_dict({"materials": [{"albedo": [1, 0, 0]}]})
    b.add_obj(
        os.path.join(assets_dir, "cube.obj"),
        material=0,
        position=(0.5, -1.0, 0.0),
        rotation_deg=(0.0, 30.0, 0.0),
        scale=0.4,
        front_only=True,
        sampler=1,
        name="box",
    )
    p = str(tmp_path / "mesh.json")
    schema.save_scene(b, p)
    doc = json.loads(open(p).read())
    assert len(doc["objects"]) == 1
    o = doc["objects"][0]
    assert o["name"] == "box" and o["front_only"] and o["sampler"] == 1
    assert o["scale"] == [0.4, 0.4, 0.4]

    b2 = schema.load_scene(p)
    s1, s2 = b.compile(), b2.compile()
    assert s2.meta["n_tris"] == s1.meta["n_tris"]
    np.testing.assert_allclose(
        np.asarray(s1.obj_inv_transform), np.asarray(s2.obj_inv_transform)
    )


def test_viewer_http_endpoints(tmp_path):
    """Live viewer serves page/stats/image/scene/debug through the REAL
    handler; camera set resets accumulation; /edit mutates the scene."""
    import threading
    import urllib.request

    from ray_tracer_tpu import RenderConfig
    from ray_tracer_tpu import viewer
    from ray_tracer_tpu.scene import presets

    builder = presets.sphere_diffuse()
    cfg = RenderConfig(width=16, height=16, samples_per_pixel=1, bounce_limit=1)
    state = viewer.ViewerState(builder, cfg)

    srv = viewer._make_server(state, "127.0.0.1", 0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        u = f"http://127.0.0.1:{port}"
        html = urllib.request.urlopen(f"{u}/", timeout=10).read()
        assert b"ray_tracer_tpu" in html
        png = urllib.request.urlopen(f"{u}/image.png", timeout=10).read()
        assert png[:4] == b"\x89PNG"
        stats = json.loads(urllib.request.urlopen(f"{u}/stats", timeout=10).read())
        assert "camera" in stats
        urllib.request.urlopen(f"{u}/set?py=-2.0", timeout=10).read()
        assert state.renderer.camera.position[1] == -2.0
        assert state.renderer.frame == 0  # reset

        # scene doc lists the editable pieces
        doc = json.loads(urllib.request.urlopen(f"{u}/scene", timeout=10).read())
        assert doc["editable"] and len(doc["spheres"]) >= 1

        # live material edit recompiles the scene and resets accumulation
        old_albedo = float(np.asarray(state.renderer.scene.mat_albedo)[0, 0])
        body = json.dumps(
            {"materials": {"0": {"albedo": [0.25, 0.5, 0.75]}}}
        ).encode()
        req = urllib.request.Request(f"{u}/edit", data=body, method="POST")
        out = json.loads(urllib.request.urlopen(req, timeout=30).read())
        assert out.get("ok")
        new_albedo = np.asarray(state.renderer.scene.mat_albedo)[0]
        np.testing.assert_allclose(new_albedo, [0.25, 0.5, 0.75], rtol=1e-6)
        assert old_albedo != 0.25
        assert state.renderer.frame == 0

        # sphere edit moves geometry
        body = json.dumps(
            {"spheres": {"0": {"radius": 0.123}}}
        ).encode()
        req = urllib.request.Request(f"{u}/edit", data=body, method="POST")
        assert json.loads(urllib.request.urlopen(req, timeout=30).read()).get("ok")
        assert 0.123 in np.asarray(state.renderer.scene.sphere_radius)

        # bad edit -> 400, state untouched
        req = urllib.request.Request(
            f"{u}/edit", data=b'{"materials": {"99": {"ior": 1}}}',
            method="POST",
        )
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400

        # debug heatmap endpoint
        dbg = urllib.request.urlopen(f"{u}/debug.png?mode=2", timeout=60).read()
        assert dbg[:4] == b"\x89PNG"
    finally:
        srv.shutdown()


def test_viewer_preview_then_full():
    """After any reset (startup / camera move) the first tick publishes a
    LOW-RES 1-spp preview, the next tick the full-res frame — the
    sub-second interaction latency the reference's pause-accumulation
    loop provides (vk_engine.cpp:1867-1891)."""
    from PIL import Image
    import io as _io

    from ray_tracer_tpu import RenderConfig, viewer
    from ray_tracer_tpu.scene import presets
    from ray_tracer_tpu.scene.types import Camera

    builder = presets.sphere_diffuse()
    cfg = RenderConfig(width=64, height=64, samples_per_pixel=1,
                       bounce_limit=1)
    state = viewer.ViewerState(builder, cfg, preview_scale=4)

    state._tick()  # preview first
    assert state.latest_is_preview and state.renderer.frame == 0
    img = Image.open(_io.BytesIO(state.png_bytes()))
    assert img.size == (16, 16)

    state._tick()  # then the full-res frame
    assert not state.latest_is_preview and state.renderer.frame == 1
    assert Image.open(_io.BytesIO(state.png_bytes())).size == (64, 64)

    state._tick()  # accumulation continues at full res
    assert state.renderer.frame == 2

    # camera move resets both renderers -> preview serves first again
    state.set_camera({"py": ["-2.0"]})
    state._tick()
    assert state.latest_is_preview and state.renderer.frame == 0
    assert Image.open(_io.BytesIO(state.png_bytes())).size == (16, 16)
