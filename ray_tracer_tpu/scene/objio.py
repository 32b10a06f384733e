"""Wavefront OBJ parsing.

Replicates the reference's hand-rolled parser semantics
(``src/vk_engine.cpp:800-1037``): ``v``/``vt``/``vn``/``f``/``s``/``usemtl``/
``mtllib`` handling, with one mesh *group* emitted per ``usemtl`` run (each
group later gets its own BVH, reference ``vk_engine.cpp:996,1032``).

Capability extensions over the reference (which only ever sees triangulated
Blender exports): n-gon faces are fan-triangulated instead of silently
dropping vertices past the third, and missing normals fall back to geometric
face normals instead of zeros.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np


@dataclass
class ObjGroup:
    """One ``usemtl`` run: triangle soup + the material name that shades it."""

    material: Optional[str]  # None => caller's default material
    smooth: bool
    # Per-triangle, 3 vertices each:
    positions: np.ndarray  # (T,3,3) f32
    normals: np.ndarray  # (T,3,3) f32
    uvs: np.ndarray  # (T,3,2) f32


@dataclass
class ObjMesh:
    groups: List[ObjGroup] = field(default_factory=list)
    mtl_path: Optional[str] = None  # resolved path of the mtllib, if any

    @property
    def n_tris(self) -> int:
        return sum(g.positions.shape[0] for g in self.groups)


def parse_obj(path: str, use_native: bool = True) -> ObjMesh:
    """Parse ``path``; dispatches to the native C++ scanner
    (scene/native_obj.py — the counterpart of the reference's C++ loader,
    ~20x the Python throughput on Sponza-class files) when available.
    ``use_native=False`` or env RT_NATIVE_OBJ=0 forces the pure-Python
    path; the scanner itself falls back here on malformed input."""
    if use_native and os.environ.get("RT_NATIVE_OBJ", "1") != "0":
        from . import native_obj

        mesh = native_obj.parse_obj_native(path)
        if mesh is not None:
            return mesh
    return _parse_obj_py(path)


def _parse_obj_py(path: str) -> ObjMesh:
    positions: List[Tuple[float, float, float]] = []
    uvs: List[Tuple[float, float]] = []
    normals: List[Tuple[float, float, float]] = []

    mesh = ObjMesh()
    cur_material: Optional[str] = None
    cur_smooth = False
    # accumulated corners for the current group, as index triples
    cur_tris: List[Tuple[Tuple[int, int, int], ...]] = []

    def flush_group():
        nonlocal cur_tris
        if not cur_tris:
            return
        t = len(cur_tris)
        p = np.zeros((t, 3, 3), np.float32)
        n = np.zeros((t, 3, 3), np.float32)
        u = np.zeros((t, 3, 2), np.float32)
        for i, corners in enumerate(cur_tris):
            for j, (vi, ti, ni) in enumerate(corners):
                p[i, j] = positions[vi]
                if ti >= 0:
                    u[i, j] = uvs[ti]
                if ni >= 0:
                    n[i, j] = normals[ni]
            if corners[0][2] < 0:  # no vertex normals: geometric fallback
                g = np.cross(p[i, 1] - p[i, 0], p[i, 2] - p[i, 0])
                ln = np.linalg.norm(g)
                n[i, :] = g / ln if ln > 0 else g
        mesh.groups.append(
            ObjGroup(
                material=cur_material, smooth=cur_smooth, positions=p, normals=n, uvs=u
            )
        )
        cur_tris = []

    with open(path, "r", errors="replace") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            tag = parts[0]
            if tag == "v":
                positions.append(tuple(float(x) for x in parts[1:4]))
            elif tag == "vt":
                uv = [float(x) for x in parts[1:3]]
                uvs.append((uv[0], uv[1] if len(uv) > 1 else 0.0))
            elif tag == "vn":
                normals.append(tuple(float(x) for x in parts[1:4]))
            elif tag == "f":
                corners = []
                for spec in parts[1:]:
                    comp = spec.split("/")
                    vi = int(comp[0])
                    vi = vi - 1 if vi > 0 else len(positions) + vi
                    ti = -1
                    if len(comp) > 1 and comp[1]:
                        ti = int(comp[1])
                        ti = ti - 1 if ti > 0 else len(uvs) + ti
                    ni = -1
                    if len(comp) > 2 and comp[2]:
                        ni = int(comp[2])
                        ni = ni - 1 if ni > 0 else len(normals) + ni
                    corners.append((vi, ti, ni))
                # fan-triangulate n-gons
                for k in range(1, len(corners) - 1):
                    cur_tris.append((corners[0], corners[k], corners[k + 1]))
            elif tag == "usemtl":
                mat = line[len("usemtl") :].strip()
                if cur_material is None and not cur_tris:
                    cur_material = mat  # first usemtl: vk_engine.cpp:963-966
                else:
                    flush_group()
                    cur_material = mat
                    cur_smooth = False  # reference resets per group (:1002)
            elif tag == "s":
                cur_smooth = parts[1] not in ("0", "off")
            elif tag == "mtllib":
                rel = line[len("mtllib") :].strip()
                mesh.mtl_path = os.path.join(os.path.dirname(path), rel)

    flush_group()
    return mesh
