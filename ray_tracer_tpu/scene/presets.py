"""Built-in scenes replicating the reference's hardcoded setups.

``default_materials``/``cornell_box``/``default_scene`` mirror
``prepare_storage_buffers`` + ``cornell_box`` (``src/vk_engine.cpp:638-758``)
— including material slot order (white=0, red=1, green=2, light=3, mirror=4,
dielectric=5) — but drive everything through the declarative SceneBuilder
instead of hardcoded engine code.  The NEE rect light matches the quad
hardcoded in the reference shader (``raytrace.comp:370-383``): y = -1.5,
x,z in [-1/3, 1/3], area 4/9, normal (0,-1,0).
"""

from __future__ import annotations

import os

from .builder import SceneBuilder
from .types import Camera, Environment, Material

DEFAULT_ASSETS = os.environ.get("RT_ASSETS", "/root/reference/assets")

WHITE, RED, GREEN, LIGHT, MIRROR, DIELECTRIC = range(6)


def default_materials(b: SceneBuilder) -> None:
    """vk_engine.cpp:689-722."""
    b.add_material(Material(name="white"))
    b.add_material(Material(albedo=(1.0, 0.0, 0.0), name="red"))
    b.add_material(Material(albedo=(0.0, 1.0, 0.0), name="green"))
    b.add_material(
        Material(
            albedo=(0.0, 0.0, 0.0),
            emission_color=(1.0, 1.0, 1.0),
            emission_strength=2.4,
            name="light",
        )
    )
    b.add_material(Material(reflectance=1.0, name="mirror"))
    b.add_material(Material(ior=2.0, name="dielectric"))


def cornell_box(b: SceneBuilder, assets: str = DEFAULT_ASSETS) -> None:
    """The 6 walls + area light (vk_engine.cpp:638-678), with the NEE table
    entry for the shader's hardcoded light quad."""
    b.add_obj(
        os.path.join(assets, "light2.obj"),
        material=LIGHT,
        position=(0.0, -1.5, 0.0),
        front_only=True,
        name="light",
    )
    b.add_obj(
        os.path.join(assets, "plane.obj"),
        material=WHITE,
        position=(0.0, 0.5, 0.0),
        front_only=True,
        name="bottom",
    )
    b.add_obj(
        os.path.join(assets, "plane.obj"),
        material=GREEN,
        position=(-1.0, -0.5, 0.0),
        rotation_deg=(90.0, 0.0, 90.0),
        front_only=True,
        name="left",
    )
    b.add_obj(
        os.path.join(assets, "plane.obj"),
        material=RED,
        position=(1.0, -0.5, 0.0),
        rotation_deg=(90.0, 0.0, -90.0),
        front_only=True,
        name="right",
    )
    b.add_obj(
        os.path.join(assets, "ceiling.obj"),
        material=WHITE,
        position=(0.0, -1.5, 0.0),
        front_only=True,
        name="top",
    )
    b.add_obj(
        os.path.join(assets, "plane.obj"),
        material=WHITE,
        position=(0.0, -0.5, 1.0),
        rotation_deg=(90.0, 0.0, 0.0),
        front_only=True,
        name="back",
    )
    b.add_obj(
        os.path.join(assets, "plane.obj"),
        material=WHITE,
        position=(0.0, -0.5, -1.0),
        rotation_deg=(-90.0, 0.0, 0.0),
        front_only=True,
        name="front",
    )
    # NEE light table entry == the shader's hardcoded quad
    # (raytrace.comp:370-383): corner (-1/3,-1.5,-1/3), edges 2/3, area 4/9.
    b.add_rect_light(
        corner=(-1.0 / 3.0, -1.5, -1.0 / 3.0),
        edge_u=(2.0 / 3.0, 0.0, 0.0),
        edge_v=(0.0, 0.0, 2.0 / 3.0),
        normal=(0.0, -1.0, 0.0),
        material=LIGHT,
    )


def default_scene(assets: str = DEFAULT_ASSETS) -> SceneBuilder:
    """The reference's boot scene: Cornell box + two rotated cubes
    (vk_engine.cpp:731-751)."""
    b = SceneBuilder()
    default_materials(b)
    b.add_obj(
        os.path.join(assets, "cube.obj"),
        material=WHITE,
        position=(-0.4, 0.25, -0.45),
        rotation_deg=(0.0, -30.0, 0.0),
        scale=0.25,
        sampler=1,
        name="cube",
    )
    b.add_obj(
        os.path.join(assets, "cube.obj"),
        material=WHITE,
        position=(0.4, -0.2, 0.45),
        rotation_deg=(0.0, 30.0, 0.0),
        scale=(0.3, 0.7, 0.3),
        sampler=1,
        name="cube2",
    )
    cornell_box(b, assets)
    b.set_camera(Camera())
    return b


def cornell_spheres(assets: str = DEFAULT_ASSETS) -> SceneBuilder:
    """BASELINE config 2: Cornell box with mirror + dielectric spheres
    (the commented-out sphere slots at vk_engine.cpp:684-685, materials 5/2)."""
    b = SceneBuilder()
    default_materials(b)
    cornell_box(b, assets)
    b.add_sphere((0.0, 0.1, -0.3), 0.4, DIELECTRIC)
    b.add_sphere((0.5, 0.1, 0.0), 0.4, MIRROR)
    b.set_camera(Camera())
    return b


def sphere_diffuse() -> SceneBuilder:
    """BASELINE config 1: single diffuse sphere over a ground sphere, sky on
    (cf. renders/sphere_diffuse.png). Pure brute-force path — no meshes."""
    b = SceneBuilder()
    default_materials(b)
    b.add_sphere((0.0, -0.5, 0.0), 0.5, WHITE)
    b.add_sphere((0.0, 100.0, 0.0), 100.0, WHITE)  # ground
    b.set_environment(Environment(enabled=True))
    b.set_camera(Camera(position=(0.0, -0.6, -3.0), angles_deg=(0.0, 0.0, 0.0)))
    return b


def cornell_rainbow(assets: str = DEFAULT_ASSETS) -> SceneBuilder:
    """Reconstruction of renders/cornell_rainbow.png: green/blue/red walls
    around a white sphere.  The reference image is an interactive-session
    screenshot, so wall assignment (green left, blue back, red right) and
    the sphere's size/placement are read off the image; everything else is
    the stock Cornell setup (vk_engine.cpp:638-678)."""
    b = SceneBuilder()
    default_materials(b)
    blue = b.add_material(Material(albedo=(0.0, 0.0, 1.0), name="blue"))
    # resting on the floor (y-down world: floor plane at y=+0.5)
    b.add_sphere((0.0, 0.11, 0.0), 0.39, WHITE)
    cornell_box(b, assets)
    # repaint the back wall blue (cornell_box made it white)
    for _, inst in b.instances:
        if inst.name == "back":
            inst.material = blue
    b.set_camera(Camera())
    return b


def spheres_demo() -> SceneBuilder:
    """Reconstruction of renders/sphere_diffuse.png: green/white/red diffuse
    spheres resting on a planet-sized blue-violet ground sphere under the
    sky env light.  Proportions read off the screenshot; the material
    palette extends the stock one."""
    b = SceneBuilder()
    default_materials(b)
    green = b.add_material(Material(albedo=(0.2, 0.55, 0.25), name="dgreen"))
    red = b.add_material(Material(albedo=(0.75, 0.1, 0.1), name="dred"))
    pale = b.add_material(Material(albedo=(0.85, 0.92, 1.0), name="pale"))
    ground = b.add_material(Material(albedo=(0.72, 0.72, 0.95), name="ground"))
    # planet top is at y=0.2 (y-down world); resting centers sit at 0.2 - r
    b.add_sphere((-0.95, -0.55, 0.5), 0.75, green)
    b.add_sphere((0.1, -0.25, 0.6), 0.45, pale)
    b.add_sphere((1.0, -0.08, 0.5), 0.28, red)
    b.add_sphere((0.0, 100.2, 0.0), 100.0, ground)
    b.set_environment(Environment(enabled=True))
    b.set_camera(
        Camera(position=(0.0, -0.8, -3.8), angles_deg=(0.0, 0.0, 0.0))
    )
    return b


def monkey_demo(assets: str = DEFAULT_ASSETS) -> SceneBuilder:
    """Reconstruction of renders/monkey_dielectric.png: a blue-glass Suzanne
    next to a blue-glass sphere in the white-walled Cornell box.  Material
    and placement read off the screenshot (dielectric tint = albedo, like
    the reference's dielectricBTDF radiance)."""
    b = SceneBuilder()
    default_materials(b)
    blueglass = b.add_material(
        Material(albedo=(0.25, 0.25, 1.0), ior=2.0, name="blueglass")
    )
    # floor plane is at y=+0.5 (y-down); both rest on it
    b.add_sphere((-0.5, 0.05, 0.1), 0.45, blueglass)
    b.add_obj(
        os.path.join(assets, "monkey.obj"),
        material=blueglass,
        position=(0.45, 0.008, 0.0),
        rotation_deg=(0.0, 180.0, 0.0),  # face the camera
        scale=0.5,
        sampler=1,
        name="monkey",
    )
    cornell_box(b, assets)
    b.set_camera(Camera())
    return b


def mesh_scene(
    obj_name: str,
    material: int = DIELECTRIC,
    scale=0.7,
    position=(0.0, 0.53, 0.0),
    rotation_deg=(0.0, 0.0, 0.0),
    assets: str = DEFAULT_ASSETS,
) -> SceneBuilder:
    """BASELINE configs 3/4: a mesh (bunny/dread/...) inside the Cornell box
    (cf. vk_engine.cpp:745-749)."""
    b = SceneBuilder()
    default_materials(b)
    b.add_obj(
        os.path.join(assets, obj_name),
        material=material,
        position=position,
        rotation_deg=rotation_deg,
        scale=scale,
        sampler=1,
        name=obj_name,
    )
    cornell_box(b, assets)
    b.set_camera(Camera())
    return b


def sponza_proxy(n_tris_target: int = 260_000, seed: int = 7) -> SceneBuilder:
    """Sponza-scale procedural stand-in (BASELINE config 5).

    The reference tree ships sponza.mtl + textures but no sponza .obj (load
    commented out, vk_engine.cpp:729 — SURVEY §6 caveat), so scale testing
    uses a generated atrium: floor, colonnades of rotated columns, and an
    emissive ceiling strip, sized to ~n_tris_target triangles after instance
    flattening.  Geometry is deterministic in ``seed``.
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    b = SceneBuilder()
    default_materials(b)

    # One icosphere-ish column mesh written to a temp obj once, reused (the
    # builder caches by path) and instanced many times -> flattening
    # replicates it to the target count.
    import tempfile

    def make_column_obj(n_seg=12, n_ring=8):
        """Lathed column: n_seg*n_ring*2 tris."""
        verts, faces = [], []
        prof = [(0.3, 0.0), (0.25, 0.1), (0.2, 0.3), (0.2, 1.7), (0.25, 1.9), (0.3, 2.0)]
        n_prof = len(prof)
        for i in range(n_seg):
            a = 2 * np.pi * i / n_seg
            for r, y in prof:
                verts.append((r * np.cos(a), -y, r * np.sin(a)))
        for i in range(n_seg):
            for j in range(n_prof - 1):
                a = i * n_prof + j
                c = ((i + 1) % n_seg) * n_prof + j
                faces.append((a + 1, c + 1, a + 2))
                faces.append((c + 1, c + 2, a + 2))
        fd, path = tempfile.mkstemp(suffix=".obj", prefix="rt_column_")
        with os.fdopen(fd, "w") as f:
            for v in verts:
                f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
            for fa in faces:
                f.write(f"f {fa[0]} {fa[1]} {fa[2]}\n")
        return path, len(faces)

    col_path, col_tris = make_column_obj()
    n_cols = max(4, n_tris_target // col_tris)
    side = int(np.ceil(np.sqrt(n_cols / 2)))
    k = 0
    for gx in range(side):
        for gz in range(2 * side):
            if k >= n_cols:
                break
            x = -side + 2.0 * gx + rng.uniform(-0.2, 0.2)
            z = -side + 1.0 * gz + rng.uniform(-0.2, 0.2)
            b.add_obj(
                col_path,
                material=int(rng.integers(0, 3)),
                position=(x, 0.0, z),
                rotation_deg=(0.0, float(rng.uniform(0, 360)), 0.0),
                scale=float(rng.uniform(0.7, 1.1)),
                name=f"col{k}",
            )
            k += 1

    # floor + emissive strip
    b.add_obj(
        os.path.join(DEFAULT_ASSETS, "plane.obj"),
        material=WHITE,
        position=(0.0, 0.0, 0.0),
        scale=(side * 1.5, 1.0, side * 1.5),
        front_only=True,
        name="floor",
    )
    b.add_obj(
        os.path.join(DEFAULT_ASSETS, "light2.obj"),
        material=LIGHT,
        position=(0.0, -4.0, 0.0),
        scale=(side * 0.8, 1.0, side * 0.8),
        name="skylight",
    )
    s8 = side * 0.8
    b.add_rect_light(
        corner=(-s8 / 3.0, -4.0, -s8 / 3.0),
        edge_u=(2.0 * s8 / 3.0, 0.0, 0.0),
        edge_v=(0.0, 0.0, 2.0 * s8 / 3.0),
        normal=(0.0, -1.0, 0.0),
        material=LIGHT,
    )
    b.set_camera(
        Camera(position=(0.0, -2.2, -side * 1.2), angles_deg=(14.0, 0.0, 0.0))
    )
    return b
