"""MTL material-library parsing.

Replicates ``read_mtl`` (reference ``src/vk_engine.cpp:1060-1167``):

* ``albedo`` starts at (1,1,1) and is *multiplied* by both ``Ka`` and ``Kd``
  (``vk_engine.cpp:1100``), so albedo == Ka * Kd.
* ``Ni`` (ior) and ``d`` (alpha) are parsed but ignored — the reference
  comments out their assignment (``vk_engine.cpp:1104,1108``).
* ``map_Ka``/``map_Kd`` -> albedo texture, ``map_Ks`` -> metalness,
  ``map_d`` -> alpha, ``map_bump`` -> bump; each texture path registered in
  file order (``vk_engine.cpp:1109-1141``).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from .types import Material


@dataclass
class MtlLibrary:
    # material key -> Material (texture indices are into ``texture_paths``)
    materials: Dict[str, Material] = field(default_factory=dict)
    texture_paths: List[str] = field(default_factory=list)


def parse_mtl(path: str) -> MtlLibrary:
    lib = MtlLibrary()
    mtl_dir = os.path.dirname(path)

    name: Optional[str] = None
    cur = Material()

    def flush():
        nonlocal cur
        if name is not None:
            cur.name = name
            lib.materials[name] = cur
        cur = Material()

    def add_tex(rel: str) -> int:
        lib.texture_paths.append(os.path.join(mtl_dir, rel))
        return len(lib.texture_paths) - 1

    with open(path, "r", errors="replace") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            tag = parts[0]
            if tag == "newmtl":
                flush()
                name = line[len("newmtl") :].strip()
            elif tag in ("Ka", "Kd"):
                rgb = np.asarray([float(x) for x in parts[1:4]], np.float32)
                cur.albedo = tuple(np.asarray(cur.albedo, np.float32) * rgb)
            elif tag in ("map_Ka", "map_Kd"):
                cur.albedo_tex = add_tex(line[len(tag) :].strip())
            elif tag == "map_Ks":
                cur.metalness_tex = add_tex(line[len(tag) :].strip())
            elif tag == "map_d":
                cur.alpha_tex = add_tex(line[len(tag) :].strip())
            elif tag == "map_bump" or tag == "bump":
                cur.bump_tex = add_tex(line[len(tag) :].strip())
            # Ni / d / Ns / Ke etc.: parsed-and-ignored like the reference.

    flush()
    return lib
