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


def mesh_scene(
    obj_name: str,
    material: int = DIELECTRIC,
    scale=0.7,
    position=(0.0, 0.53, 0.0),
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
        scale=scale,
        sampler=1,
        name=obj_name,
    )
    cornell_box(b, assets)
    b.set_camera(Camera())
    return b
