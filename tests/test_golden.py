"""Golden regression: renders frozen at a known-good revision.

The reference's de-facto acceptance artifacts are its renders/ PNGs
(SURVEY.md §4); these are the equivalent for this framework — small
deterministic CPU renders checked against committed float16 goldens.
Guards the integrator's radiometric semantics against drift.

Each golden is checked through BOTH traversal backends: the XLA gather
walk (Routing(packet="off"), the oracle) and the production Pallas packet
kernel in interpret mode (the same kernel code the TPU runs), so a
TPU-vs-CPU image divergence in the kernel path fails the golden, not
just the traversal-level equivalence tests in test_packet.py.
"""

import os

import numpy as np
import pytest

from ray_tracer_tpu import RenderConfig, render
from ray_tracer_tpu.config import Routing
from ray_tracer_tpu.scene import presets

CFG = RenderConfig(width=40, height=40, samples_per_pixel=8, bounce_limit=6)
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _bunny_scene():
    # mesh-BVH golden (908-face bunny decimation in the cornell box):
    # a traversal regression fails a render-level golden, not just the
    # traversal unit tests (round-2 VERDICT item 8)
    return presets.mesh_scene(
        "bunny.obj", material=presets.WHITE, scale=0.8,
        position=(0.0, 0.769, 0.0), rotation_deg=(0.0, 180.0, 0.0),
    )


def _textured_scene():
    # texture-sampling golden: the dread model with its albedo map
    # assigned via add_texture (reference quirk Q1's missing capability)
    return presets.dread_demo()


@pytest.mark.parametrize("packet_mode", ["off", "packet", "group"])
@pytest.mark.parametrize(
    "name,builder",
    [
        ("cornell", presets.default_scene),
        ("cornell_spheres", presets.cornell_spheres),
        ("sphere_diffuse", presets.sphere_diffuse),
        ("bunny_mesh", _bunny_scene),
        ("dread_textured", _textured_scene),
    ],
)
def test_golden(name, builder, packet_mode):
    path = os.path.join(GOLDEN_DIR, f"{name}_40x40_8spp.npy")
    if not os.path.exists(path) and name in ("bunny_mesh", "dread_textured"):
        pytest.skip("reference assets unavailable when golden was made")
    golden = np.load(path).astype(np.float32)
    rt = {
        "off": Routing(packet="off"),
        "packet": Routing(packet="interpret", groups=0),
        "group": Routing(packet="interpret", groups=4, groups_packet=512),
    }[packet_mode]
    cfg = CFG.replace(routing=rt)
    img = np.asarray(render(builder().compile().device_put(), cfg))
    # float16 quantization of the golden + cross-backend FMA noise
    np.testing.assert_allclose(img, golden, atol=2e-3)
