"""Host-side 3D transform helpers (numpy), matching glm conventions.

The reference builds object transforms as
``translate(pos) * rotate(rx, X) * rotate(ry, Y) * rotate(rz, Z) * scale(s)``
(see reference ``src/vk_engine.cpp:807-811``) and the camera rotation from
explicit column-major mat3s (``src/vk_engine.cpp:1633-1653``).  glm matrices
act on column vectors, so ``A * B`` composes like standard math matmul and we
reproduce everything with plain ``numpy`` row-major matrices applied as
``M @ v``.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "rot_x",
    "rot_y",
    "rot_z",
    "trs_matrix",
    "camera_rotation",
    "normalize",
]


def normalize(v: np.ndarray) -> np.ndarray:
    v = np.asarray(v, dtype=np.float32)
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


def rot_x(theta: float) -> np.ndarray:
    """Standard right-handed rotation around X (glm::rotate semantics)."""
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]], dtype=np.float32)


def rot_y(theta: float) -> np.ndarray:
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], dtype=np.float32)


def rot_z(theta: float) -> np.ndarray:
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], dtype=np.float32)


def trs_matrix(position, rotation_deg, scale) -> np.ndarray:
    """4x4 object transform: T * Rx * Ry * Rz * S.

    ``rotation_deg`` are euler angles in degrees, applied in X, Y, Z order,
    matching reference ``src/vk_engine.cpp:807-811``.
    """
    rx, ry, rz = np.radians(np.asarray(rotation_deg, dtype=np.float64))
    m = np.eye(4, dtype=np.float32)
    # R @ S scales the columns of the rotation block.
    m[:3, :3] = (rot_x(rx) @ rot_y(ry) @ rot_z(rz)) * np.asarray(
        scale, dtype=np.float32
    )[None, :]
    m[:3, 3] = np.asarray(position, dtype=np.float32)
    return m


def camera_rotation(angles_deg) -> np.ndarray:
    """Camera rotation matrix exactly as reference ``run_compute``.

    The reference constructs mat3s from explicit *columns*
    (``src/vk_engine.cpp:1636-1652``) and combines ``rotY * rotX * rotZ``.
    Columns-of-glm == transpose of the row-major array literal, so each
    factor below is written as the transpose of the glm literal.
    """
    tx, ty, tz = np.radians(np.asarray(angles_deg, dtype=np.float64))
    cx, sx = np.cos(tx), np.sin(tx)
    cy, sy = np.cos(ty), np.sin(ty)
    cz, sz = np.cos(tz), np.sin(tz)
    # glm::mat3(col0, col1, col2) -> math matrix with those columns.
    rx = np.array([[1, 0, 0], [0, cx, sx], [0, -sx, cx]], dtype=np.float32)
    ry = np.array([[cy, 0, -sy], [0, 1, 0], [sy, 0, cy]], dtype=np.float32)
    rz = np.array([[cz, sz, 0], [-sz, cz, 0], [0, 0, 1]], dtype=np.float32)
    return (ry @ rx @ rz).astype(np.float32)
