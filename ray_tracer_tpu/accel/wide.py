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


def _collapse_cut(forest: BVHForest, root: int):
    """Choose the binary->wide cut by slot-distribution DP.

    Area-weighted variant of Ylitie et al. 2017 ("Efficient Incoherent Ray
    Traversal on GPUs through Compressed Wide BVHs") adapted to this
    kernel's cost model: a wide-node visit costs a constant (8 dense slab
    tests) regardless of slot fill, and leaf-row tests cost the same
    wherever the leaf slot lives — so the only structural cost is
    ``sum(area(wide node))`` (expected visits per random ray ~ area).  The
    DP packs subtrees into slots to minimize it; vs the old greedy
    expansion this roughly halves the wide-node count (fill 4.1 -> ~7)
    on Sponza-scale meshes, shrinking the per-packet node union that
    dominates incoherent bounce-ray traversal.

    Level-synchronous numpy DP (children strictly after parents in the
    builder's layout is NOT guaranteed across objects, so order by depth).

    Returns ``wide_children``: list of lists of binary node ids (slot sets),
    wide node 0 = root.
    """
    index = forest.index
    count = forest.tri_count
    nmin = forest.node_min
    nmax = forest.node_max
    n_nodes = index.shape[0]

    # depth-order the subtree under root
    depth = np.full(n_nodes, -1, np.int32)
    order = []
    stack = [int(root)]
    depth[root] = 0
    while stack:
        n = stack.pop()
        order.append(n)
        if count[n] == 0:
            l = int(index[n])
            depth[l] = depth[l + 1] = depth[n] + 1
            stack += [l, l + 1]
    order = np.asarray(order, np.int32)
    is_leaf = count[order] > 0

    e = np.maximum(nmax - nmin, 0.0)
    area = e[:, 0] * e[:, 1] + e[:, 1] * e[:, 2] + e[:, 2] * e[:, 0]

    INF = np.float64(1e30)
    # cost[n, j] = min cost of subtree n occupying j+1 slots (j in 0..7);
    # kbest[n, j] = slots given to the left child at the optimum (0 = "make
    # n a wide node / n is a leaf slot"); karg8[n] = the left-child slot
    # count of n's OWN 8 child slots when it becomes a wide node.
    cost = np.full((n_nodes, ARITY), INF)
    kbest = np.zeros((n_nodes, ARITY), np.int8)
    karg8 = np.ones(n_nodes, np.int8)
    cost[order[is_leaf]] = 0.0

    interior = order[~is_leaf]
    for d in range(int(depth[order].max()), -1, -1):
        nodes = interior[depth[interior] == d]
        if nodes.size == 0:
            continue
        l = index[nodes]
        r = l + 1
        # dist[j] = min over k of cost[l, k slots] + cost[r, j-k slots]
        dist = np.full((ARITY + 1, nodes.size), INF)
        argk = np.zeros((ARITY + 1, nodes.size), np.int8)
        for j in range(2, ARITY + 1):
            best = np.full(nodes.size, INF)
            bk = np.zeros(nodes.size, np.int8)
            for k in range(1, j):
                c = cost[l, k - 1] + cost[r, j - k - 1]
                better = c < best
                best = np.where(better, c, best)
                bk = np.where(better, np.int8(k), bk)
            dist[j] = best
            argk[j] = bk
        as_wide = area[nodes] + dist[ARITY]
        cost[nodes, 0] = as_wide
        karg8[nodes] = argk[ARITY]
        # kbest == 0 means "become a wide node here"
        for j in range(1, ARITY):
            split = dist[j + 1]
            use_split = split < as_wide
            cost[nodes, j] = np.where(use_split, split, as_wide)
            kbest[nodes, j] = np.where(use_split, argk[j + 1], np.int8(0))

    # ---- reconstruct: expand each wide node's 8 slots
    def slots_of(n, j):
        """Slot set for subtree n given j available slots (j >= 1)."""
        if count[n] > 0 or j == 1 or kbest[n, j - 1] == 0:
            # leaf slot, or interior that becomes its own wide node
            return [int(n)]
        k = int(kbest[n, j - 1])
        l = int(index[n])
        return slots_of(l, k) + slots_of(l + 1, j - k)

    wide_children = []
    work = [int(root)]
    seen = {int(root): 0}
    while work:
        b = work.pop(0)
        if count[b] > 0:  # degenerate single-leaf root
            wide_children.append([b])
            continue
        k = int(karg8[b])
        l = int(index[b])
        slots = slots_of(l, k) + slots_of(l + 1, ARITY - k)
        wide_children.append(slots)
        for s in slots:
            if count[s] == 0 and s not in seen:
                seen[s] = len(seen)
                work.append(s)
    return wide_children, seen


def collapse(forest: BVHForest, root: int) -> WideBVH:
    """Collapse the binary tree rooted at ``root`` into a BVH8."""
    index = forest.index
    count = forest.tri_count
    nmin = forest.node_min
    nmax = forest.node_max

    wide_children_raw, ids = _collapse_cut(forest, root)
    wide_children = []
    wide_axis = []
    for slots in wide_children_raw:
        centers = np.array([(nmin[s] + nmax[s]) / 2 for s in slots])
        ext = centers.max(axis=0) - centers.min(axis=0)
        ax = int(np.argmax(ext))
        order = np.argsort(centers[:, ax], kind="stable")
        wide_children.append([slots[i] for i in order])
        wide_axis.append(ax)

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
