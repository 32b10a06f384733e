"""BVH8: collapse the binary SAH tree into 8-wide nodes for packet traversal.

Wide nodes amortize the packet kernel's scalar-unit costs (stack pops, meta
reads, hit-mask transfers) over 8 children per visit: the binary kernel pays
~6 scalar syncs per tree edge, the wide kernel ~1.  Children within a node
are sorted along the node's dominant axis so the kernel can push them in
back-to-front order with a statically unrolled loop (direction picked by the
packet's direction sign — near child pops first).

Layout (flat, kernel-friendly):
* ``boxes``  (W*8, 8) f32: per child slot min3|max3|pad2; empty slots carry
  NaN bounds so the slab test can never report a hit.
* ``meta``   (W*8 + 1, 4) i32: per slot ``tri_start|tri_count|0|0`` for leaf
  children, ``wide_id|0`` for interior children; the extra last row is the
  traversal entry point (an interior pseudo-slot pointing at wide root 0).
* ``axis``   (W,) i32: child-sort axis per wide node.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .bvh import BVHForest

ARITY = 8


@dataclass
class WideBVH:
    boxes: np.ndarray  # (W*8, 8) f32
    meta: np.ndarray  # (W*8+1, 4) i32
    axis: np.ndarray  # (W,) i32
    n_wide: int

    @property
    def entry_code(self) -> int:
        return self.n_wide * ARITY


def collapse(forest: BVHForest, root: int) -> WideBVH:
    """Collapse the binary tree rooted at ``root`` into a BVH8."""
    index = forest.index
    count = forest.tri_count
    nmin = forest.node_min
    nmax = forest.node_max

    def area(i):
        e = np.maximum(nmax[i] - nmin[i], 0.0)
        return float(e[0] * e[1] + e[1] * e[2] + e[2] * e[0])

    # BFS worklist: each popped binary node becomes one wide node whose slots
    # are gathered by repeatedly expanding the largest-area interior slot.
    wide_children = []  # list of lists of binary node ids
    wide_axis = []
    work = [int(root)]
    ids = {int(root): 0}
    while work:
        b = work.pop(0)
        slots = [b]
        while len(slots) < ARITY:
            cand, cand_area = -1, -1.0
            for si, node in enumerate(slots):
                if count[node] == 0:
                    a = area(node)
                    if a > cand_area:
                        cand, cand_area = si, a
            if cand < 0:
                break
            node = slots.pop(cand)
            slots.insert(cand, int(index[node]) + 1)
            slots.insert(cand, int(index[node]))
        centers = np.array([(nmin[s] + nmax[s]) / 2 for s in slots])
        ext = centers.max(axis=0) - centers.min(axis=0)
        ax = int(np.argmax(ext))
        order = np.argsort(centers[:, ax], kind="stable")
        slots = [slots[i] for i in order]
        wide_children.append(slots)
        wide_axis.append(ax)
        for s in slots:
            if count[s] == 0:  # interior child -> its own wide node
                if s not in ids:
                    ids[s] = len(ids)
                    work.append(s)

    n_wide = len(wide_children)
    boxes = np.zeros((n_wide * ARITY, 8), np.float32)
    # Empty slots: NaN bounds — every slab comparison is false, so they can
    # never be hit (inverted +/-1e30 boxes WOULD hit: the slab min/max swap
    # turns them into the full interval).
    boxes[:, 0:6] = np.nan
    meta = np.zeros((n_wide * ARITY + 1, 4), np.int32)
    meta[:, 1] = -1  # empty marker (never popped anyway)

    # wide ids were assigned in BFS discovery order == wide_children order?
    # ids maps binary -> wide id; wide_children[i] corresponds to the i-th
    # *popped* work item.  Reconstruct mapping by replaying.
    # (wide_children was appended in pop order; ids assigned in push order;
    # BFS with FIFO means pop order == push order, so they agree.)
    for w, slots in enumerate(wide_children):
        for si, s in enumerate(slots):
            row = w * ARITY + si
            boxes[row, 0:3] = nmin[s]
            boxes[row, 3:6] = nmax[s]
            if count[s] > 0:  # leaf
                meta[row, 0] = index[s]
                meta[row, 1] = count[s]
            else:
                meta[row, 0] = ids[s]
                meta[row, 1] = 0
                # child-order axis of the TARGET wide node, read at pop time
                meta[row, 2] = wide_axis[ids[s]]
    # entry pseudo-slot: interior pointing at wide node 0
    meta[n_wide * ARITY] = (0, 0, wide_axis[0], 0)
    return WideBVH(
        boxes=boxes,
        meta=meta,
        axis=np.asarray(wide_axis, np.int32),
        n_wide=n_wide,
    )
