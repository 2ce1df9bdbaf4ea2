"""Cloth constraint topology: grid cloths and arbitrary quad meshes.

The reference builds grid cloth constraints in C++ (CreateSpringGrid,
reference: PyFlex/bindings/helpers.h:838-925) and derives mesh-cloth edge
classes in Python (load_cloth, reference: environment/tasks.py:39-102).
Both produce three spring classes: stretch (1-ring), bend (2-ring) and shear
(diagonals), each with its own stiffness (softgym_cloth.h:109-131).

TPU-first design: for grid cloths we do NOT materialize edge lists at all —
the solver consumes the six (offset, rest, stiffness-class) stencil classes
directly as shifted-array arithmetic (see solver.py), so a GridTopology is a
handful of scalars.  Mesh cloths (shirts) get padded edge arrays for a
gather/segment-sum path.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from flingbot_tpu.engine.state import MAX_GRID_DIM, PARTICLE_RADIUS

SQRT2 = float(np.sqrt(2.0))

# Stencil classes for grid cloth: (dy, dx, rest_in_spacings, stiffness_class)
# stiffness classes: 0=stretch, 1=bend, 2=shear
# Matches CreateSpringGrid (helpers.h:872-925): stretch = 1-neighbors,
# bend = 2-neighbors along rows/cols, shear = both diagonals.
GRID_STENCIL_CLASSES = (
    (0, 1, 1.0, 0),
    (1, 0, 1.0, 0),
    (0, 2, 2.0, 1),
    (2, 0, 2.0, 1),
    (1, 1, SQRT2, 2),
    (1, -1, SQRT2, 2),
)


class GridTopology(struct.PyTreeNode):
    """Grid cloth topology. dimx varies fastest (index = y * dimx + x),
    matching CreateSpringGrid's flat layout (helpers.h:845-855)."""

    dimx: jnp.ndarray  # i32 scalar (dynamic, per task)
    dimy: jnp.ndarray  # i32 scalar
    stiffness: jnp.ndarray  # (3,) f32: stretch, bend, shear
    spacing: jnp.ndarray  # f32 scalar, rest spacing between particles
    # static padded grid extent (shared across a vmapped batch)
    max_dimx: int = struct.field(pytree_node=False, default=MAX_GRID_DIM)
    max_dimy: int = struct.field(pytree_node=False, default=MAX_GRID_DIM)
    # statically known dimx==max_dimx and dimy==max_dimy: the canonical
    # flat index (y*dimx+x) IS the lattice index, so the lattice view is a
    # reshape instead of a gather (saves ~150 ms/step at 512 envs)
    full_grid: bool = struct.field(pytree_node=False, default=False)

    @property
    def capacity(self) -> int:
        return self.max_dimx * self.max_dimy


class MeshTopology(struct.PyTreeNode):
    """Arbitrary-mesh cloth topology with padded per-class edge arrays.

    Besides the flat edge list, carries VERTEX-CENTRIC incidence tables
    (nbr_*, shape (D, N) with the particle axis innermost/lane-aligned):
    for every vertex, its <= D incident spring neighbors with per-slot rest
    length and stiffness.  The spring solve gathers through these tables
    instead of scatter-adding over the edge list — TPU scatter is the
    measured mesh-path bottleneck (250 ms/env-step on v5e at the old
    edge-scatter formulation, 2026-08-19 probe), while gathers cost
    ~ns/element (CLAUDE.md perf facts)."""

    edges: jnp.ndarray  # (E, 2) i32, padded (pad rows point at capacity slot)
    rest: jnp.ndarray  # (E,) f32 rest lengths
    stiffness: jnp.ndarray  # (E,) f32 per-edge stiffness
    edge_mask: jnp.ndarray  # (E,) bool
    degree: jnp.ndarray  # (N,) f32 number of constraints per particle
    triangles: jnp.ndarray  # (T, 3) i32, padded
    tri_mask: jnp.ndarray  # (T,) bool
    rest_positions: jnp.ndarray  # (N, 3) f32 rest pose (self-collide filter)
    nbr_idx: jnp.ndarray  # (D, N) i32 incident-spring neighbor vertex ids
    nbr_rest: jnp.ndarray  # (D, N) f32 per-slot rest length
    nbr_stiff: jnp.ndarray  # (D, N) f32 per-slot stiffness (0 on pad slots)
    nbr_mask: jnp.ndarray  # (D, N) bool slot validity


class LayeredGridTopology(struct.PyTreeNode):
    """Shirt (two-panel garment) topology embedded in ONE grid lattice so the
    spring solve is pure stencil arithmetic — the TPU-first fix for the mesh
    path's gather wall (measured 118 ms/env-step at batch 16 on v5e vs
    0.47 ms for the 100x100 grid stencil, runs/round4/mesh_probe2.json).

    The procedural shirts (env/shirts.py, standing in for the reference's
    Cloth3D garments, reference: environment/tasks.py:131-142) are two raster
    grid panels sewn along seams.  Every vertex gets exactly one lattice slot:
    front-panel (and sewn) vertices at row r, back-panel vertices at row
    H2 + r.  Every spring then joins two slots at a FIXED lattice offset:
    intra-panel springs are the six CreateSpringGrid stencil classes
    (helpers.h:872-925), and seam springs (back-panel edges reaching a sewn
    vertex, plus bend pairs that straddle the seam, tasks.py:71-102 bend
    derivation) fall into a small family of cross-layer offsets
    (H2 + a, b), |a|,|b| <= 2.  The builder verifies the offset re-expression
    covers the mesh's edge set EXACTLY (same edges, same rest lengths, same
    per-vertex degrees) — the layered solve is the same constraint system as
    MeshTopology, only laid out for shifted-array arithmetic.

    Per-class arrays are keyed at the BASE slot: class k joins slot (y, x)
    to slot (y + offsets[k][0], x + offsets[k][1]); stiff == 0 marks
    no-edge slots (doubles as the mask)."""

    rest: jnp.ndarray  # (K, H, W) f32 per-slot rest length
    stiff: jnp.ndarray  # (K, H, W) f32 per-slot stiffness, 0 = no edge
    count: jnp.ndarray  # (H, W) f32 per-slot constraint degree
    active: jnp.ndarray  # (H, W) bool slot holds a real vertex
    rest_positions: jnp.ndarray  # (H*W, 3) f32 rest pose (contact filter)
    triangles: jnp.ndarray  # (T, 3) i32 grid-slot ids, padded
    tri_mask: jnp.ndarray  # (T,) bool
    mesh_slot: jnp.ndarray  # (Vcap,) i32 lattice slot of each mesh vertex
    grid_src: jnp.ndarray  # (H*W,) i32 mesh vertex feeding each slot (0 pad)
    num_verts: jnp.ndarray  # i32 scalar
    # static (shared across a vmapped task-set bucket)
    offsets: tuple = struct.field(pytree_node=False)  # ((dy, dx), ...)
    H: int = struct.field(pytree_node=False, default=0)
    W: int = struct.field(pytree_node=False, default=0)
    vert_capacity: int = struct.field(pytree_node=False, default=0)

    @property
    def capacity(self) -> int:
        return self.H * self.W


def grid_positions(
    dimx: int, dimy: int, lower=(0.0, 0.0, 0.0), spacing: float = PARTICLE_RADIUS
) -> np.ndarray:
    """Particle positions of a flat grid cloth laid out in the x-z plane.

    Matches CreateSpringGrid's layout: position = lower + spacing*(x, 0, y)
    with flat index y*dimx + x (helpers.h:845-855 with dz=1, so the grid's
    'y' steps world z).
    """
    xs = np.arange(dimx) * spacing
    zs = np.arange(dimy) * spacing
    zz, xx = np.meshgrid(zs, xs, indexing="ij")  # (dimy, dimx)
    pos = np.stack(
        [xx + lower[0], np.full_like(xx, lower[1]), zz + lower[2]], axis=-1
    )
    return pos.reshape(-1, 3).astype(np.float32)


def build_grid_topology(
    dimx: int,
    dimy: int,
    stiffness=(0.9, 1.0, 0.9),
    spacing: float = PARTICLE_RADIUS,
    max_dimx: int = MAX_GRID_DIM,
    max_dimy: int = MAX_GRID_DIM,
) -> GridTopology:
    full = isinstance(dimx, int) and isinstance(dimy, int) \
        and dimx == max_dimx and dimy == max_dimy
    return GridTopology(
        dimx=jnp.int32(dimx),
        dimy=jnp.int32(dimy),
        stiffness=jnp.asarray(stiffness, jnp.float32),
        spacing=jnp.float32(spacing),
        max_dimx=max_dimx,
        max_dimy=max_dimy,
        full_grid=full,
    )


def grid_spring_edges(dimx: int, dimy: int):
    """Explicit (edges, rest_in_spacings, stiffness_class) lists for a grid.

    Reference semantics: CreateSpringGrid (helpers.h:872-925).  Used by the
    generic mesh path and by tests cross-checking the stencil solver.
    Returns (edges (E,2) int64, rest (E,) float, cls (E,) int in {0,1,2}).
    """
    idx = np.arange(dimx * dimy).reshape(dimy, dimx)
    edges, rests, clss = [], [], []

    def add(a, b, rest, c):
        e = np.stack([a.reshape(-1), b.reshape(-1)], axis=1)
        edges.append(e)
        rests.append(np.full(e.shape[0], rest))
        clss.append(np.full(e.shape[0], c, np.int64))

    # stretch: horizontal + vertical 1-neighbors
    add(idx[:, :-1], idx[:, 1:], 1.0, 0)
    add(idx[:-1, :], idx[1:, :], 1.0, 0)
    # bend: 2-neighbors
    add(idx[:, :-2], idx[:, 2:], 2.0, 1)
    add(idx[:-2, :], idx[2:, :], 2.0, 1)
    # shear: both diagonals
    add(idx[:-1, :-1], idx[1:, 1:], SQRT2, 2)
    add(idx[:-1, 1:], idx[1:, :-1], SQRT2, 2)

    return (
        np.concatenate(edges),
        np.concatenate(rests),
        np.concatenate(clss),
    )


def load_cloth(path: str):
    """Load a quad-mesh cloth OBJ and derive spring classes.

    Same contract as the reference loader (environment/tasks.py:39-102):
      returns (vertices (V,3), triangle_faces (2F,3),
               stretch_edges (M1,2), bend_edges (M2,2), shear_edges (M3,2))
    - stretch: the 4 sides of every quad
    - shear:   the 2 diagonals of every quad
    - bend:    all pairs of distinct stretch-neighbors of a vertex that are
               not already shear edges
    """
    vertices, faces = [], []
    with open(path, "r") as f:
        for line in f:
            if line.startswith("v "):
                vertices.append([float(t) for t in line.split()[1:4]])
            elif line.startswith("f "):
                toks = line.split()[1:]
                face = [int(t.split("/")[0]) - 1 for t in toks]
                if len(face) != 4:
                    raise ValueError("load_cloth requires a quad mesh")
                faces.append(face)
    vertices = np.array(vertices, np.float64)
    faces = np.array(faces, np.int64)

    # interleaved (f0_t0, f0_t1, f1_t0, ...) triangle ordering
    tri = np.stack([faces[:, [0, 1, 2]], faces[:, [0, 2, 3]]], axis=1).reshape(-1, 3)

    def as_sorted_set(pairs):
        pairs = np.sort(pairs.reshape(-1, 2), axis=1)
        return set(map(tuple, pairs.tolist()))

    stretch = as_sorted_set(
        np.concatenate(
            [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 3]], faces[:, [3, 0]]]
        )
    )
    shear = as_sorted_set(np.concatenate([faces[:, [0, 2]], faces[:, [1, 3]]]))

    neighbours = {v: set() for v in range(len(vertices))}
    for a, b in stretch:
        neighbours[a].add(b)
        neighbours[b].add(a)
    bend = set()
    for v, nbrs in neighbours.items():
        nbrs = sorted(nbrs)
        for i in range(len(nbrs) - 1):
            for j in range(i + 1, len(nbrs)):
                e = (nbrs[i], nbrs[j])
                if e not in shear:
                    bend.add(e)

    return (
        vertices,
        tri,
        np.array(sorted(stretch), np.int64).reshape(-1, 2),
        np.array(sorted(bend), np.int64).reshape(-1, 2),
        np.array(sorted(shear), np.int64).reshape(-1, 2),
    )


def build_mesh_topology(
    rest_positions: np.ndarray,
    stretch_edges: np.ndarray,
    bend_edges: np.ndarray,
    shear_edges: np.ndarray,
    faces: np.ndarray,
    stiffness=(0.9, 1.0, 0.9),
    capacity: "int | None" = None,
    edge_capacity: "int | None" = None,
    tri_capacity: "int | None" = None,
    degree_capacity: "int | None" = None,
) -> MeshTopology:
    """Build a padded MeshTopology. Rest lengths come from the rest pose
    (reference: helpers.h:144-150 CreateSpring measures current positions)."""
    rest_positions = np.asarray(rest_positions, np.float32).reshape(-1, 3)
    n = rest_positions.shape[0]
    cap = capacity or n

    per_class = [
        np.asarray(e, np.int64).reshape(-1, 2)
        for e in (stretch_edges, bend_edges, shear_edges)
    ]
    edges = np.concatenate([e for e in per_class if e.size] or [np.zeros((0, 2), np.int64)])
    stiff = np.concatenate(
        [np.full(len(e), stiffness[c], np.float32) for c, e in enumerate(per_class)]
        or [np.zeros((0,), np.float32)]
    )
    rest = np.linalg.norm(
        rest_positions[edges[:, 0]] - rest_positions[edges[:, 1]], axis=1
    ).astype(np.float32) if len(edges) else np.zeros((0,), np.float32)

    ne = len(edges)
    ecap = edge_capacity or ne
    assert ecap >= ne
    pad_e = ecap - ne
    # padding edges reference the dead slot `cap` -> caller allocates cap+1?
    # No: point them at particle 0 with mask False and stiffness 0.
    edges_p = np.concatenate([edges, np.zeros((pad_e, 2), np.int64)])
    rest_p = np.concatenate([rest, np.ones(pad_e, np.float32)])
    stiff_p = np.concatenate([stiff, np.zeros(pad_e, np.float32)])
    mask = np.arange(ecap) < ne

    degree = np.zeros(cap, np.float32)
    np.add.at(degree, edges[:, 0], 1.0)
    np.add.at(degree, edges[:, 1], 1.0)

    faces = np.asarray(faces, np.int64).reshape(-1, 3)
    nt = len(faces)
    tcap = tri_capacity or nt
    assert tcap >= nt
    faces_p = np.concatenate([faces, np.zeros((tcap - nt, 3), np.int64)])
    tmask = np.arange(tcap) < nt

    rest_pad = np.concatenate(
        [rest_positions, np.full((cap - n, 3), 1e6, np.float32)]
    )

    # vertex-centric incidence tables (gather-only spring solve; see the
    # MeshTopology docstring).  Built on host in numpy: each real edge is
    # bucketed under BOTH endpoints; slot = rank within the vertex's group.
    # degree_capacity must be STATIC across a task set (vmapped topologies
    # stack) — callers pass it; default covers the measured shirt sets
    # (max degree 18 over data_r3/shirt_eval_16).
    deg_cap = degree_capacity or max(int(degree.max()) if ne else 1, 1)
    assert not ne or int(degree.max()) <= deg_cap, (
        f"mesh degree {int(degree.max())} exceeds degree_capacity {deg_cap}")
    nbr_idx = np.zeros((deg_cap, cap), np.int32)
    nbr_rest = np.ones((deg_cap, cap), np.float32)
    nbr_stiff = np.zeros((deg_cap, cap), np.float32)
    nbr_mask = np.zeros((deg_cap, cap), bool)
    if ne:
        ends = np.concatenate([edges, edges[:, ::-1]])  # (2E, [v, other])
        rr = np.concatenate([rest, rest])
        ss = np.concatenate([stiff, stiff])
        order = np.argsort(ends[:, 0], kind="stable")
        v_sorted = ends[order, 0]
        slot = np.arange(len(v_sorted)) - np.searchsorted(
            v_sorted, v_sorted)  # rank within each vertex group
        nbr_idx[slot, v_sorted] = ends[order, 1]
        nbr_rest[slot, v_sorted] = rr[order]
        nbr_stiff[slot, v_sorted] = ss[order]
        nbr_mask[slot, v_sorted] = True

    return MeshTopology(
        edges=jnp.asarray(edges_p, jnp.int32),
        rest=jnp.asarray(rest_p),
        stiffness=jnp.asarray(stiff_p),
        edge_mask=jnp.asarray(mask),
        degree=jnp.asarray(degree),
        triangles=jnp.asarray(faces_p, jnp.int32),
        tri_mask=jnp.asarray(tmask),
        rest_positions=jnp.asarray(rest_pad),
        nbr_idx=jnp.asarray(nbr_idx),
        nbr_rest=jnp.asarray(nbr_rest),
        nbr_stiff=jnp.asarray(nbr_stiff),
        nbr_mask=jnp.asarray(nbr_mask),
    )


def grid_mesh_topology(
    dimx: int,
    dimy: int,
    stiffness=(0.9, 1.0, 0.9),
    spacing: float = PARTICLE_RADIUS,
    **caps,
) -> MeshTopology:
    """Grid cloth expressed through the generic mesh path (used in tests to
    cross-check the stencil solver)."""
    edges, rest_sp, cls = grid_spring_edges(dimx, dimy)
    rest_positions = grid_positions(dimx, dimy, spacing=spacing)
    tri = grid_triangles_np(dimx, dimy)
    per_class = [edges[cls == c] for c in range(3)]
    return build_mesh_topology(
        rest_positions, per_class[0], per_class[1], per_class[2], tri,
        stiffness=stiffness, **caps,
    )


# --------------------------------------------------------------------------
# layered-grid shirt topology (see LayeredGridTopology docstring)
# --------------------------------------------------------------------------

import dataclasses


@dataclasses.dataclass(frozen=True)
class LayeredSpec:
    """Static layered-lattice bucket shared by every task in a set (vmapped
    topologies must stack): lattice extent, layer offset, the offset-class
    union, and padded capacities.  Hashable -> usable as a jit static."""

    H: int
    W: int
    H2: int  # back-panel row offset
    offsets: tuple  # tuple[(dy, dx)] normalized final lattice offsets
    vert_capacity: int
    tri_capacity: int


def _layered_layout(verts, stretch_edges):
    """Recover the panel lattice from rest positions: per-vertex integer
    (row, col, layer).  Returns None when the mesh is not a 2-layer lattice
    (arbitrary Cloth3D geometry falls back to MeshTopology)."""
    v = np.asarray(verts, np.float64).reshape(-1, 3)
    e = np.asarray(stretch_edges, np.int64).reshape(-1, 2)
    if len(v) == 0 or len(e) == 0:
        return None
    d = np.abs(v[e[:, 0]] - v[e[:, 1]])[:, [0, 2]]
    s = float(np.median(d.max(axis=1)))  # lattice spacing (xz projection)
    if not np.isfinite(s) or s < 1e-6:
        return None
    cf = (v[:, 0] - v[:, 0].min()) / s
    rf = (v[:, 2] - v[:, 2].min()) / s
    c = np.round(cf).astype(np.int64)
    r = np.round(rf).astype(np.int64)
    if np.abs(cf - c).max() > 0.25 or np.abs(rf - r).max() > 0.25:
        return None  # vertices off-lattice
    y = v[:, 1]
    thick = float(np.abs(y).max())
    if thick < 1e-9:
        layer = np.zeros(len(v), np.int64)  # single flat sheet
    else:
        eps = 0.25 * thick
        # sewn (y ~ 0) vertices live in the front layer (0)
        layer = np.where(y < -eps, 1, 0).astype(np.int64)
    key = (layer << 40) | (r << 20) | c
    if len(np.unique(key)) != len(v):
        return None  # slot collision -> not a clean 2-layer lattice
    return r, c, layer


def _normalize_offset(dl, dy, dx):
    """Canonical direction for an edge expressed in (dlayer, drow, dcol):
    base at the lexicographically smaller endpoint.  Returns (flip, key)."""
    if (dl, dy, dx) < (0, 0, 0):
        return True, (-dl, -dy, -dx)
    return False, (dl, dy, dx)


def _layered_edge_classes(verts, per_class_edges, stiffness):
    """Group every mesh edge by its (dlayer, drow, dcol) lattice offset.
    Returns (layout, {(dl,dy,dx): (base_vert_ids, other_vert_ids, stiff)})
    or None when the mesh is not layered-lattice representable."""
    layout = _layered_layout(verts, per_class_edges[0])
    if layout is None:
        return None
    r, c, layer = layout
    groups = {}
    for cls, edges in enumerate(per_class_edges):
        edges = np.asarray(edges, np.int64).reshape(-1, 2)
        if not len(edges):
            continue
        a, b = edges[:, 0], edges[:, 1]
        dl = layer[b] - layer[a]
        dy = r[b] - r[a]
        dx = c[b] - c[a]
        for i in range(len(edges)):
            flip, key = _normalize_offset(int(dl[i]), int(dy[i]), int(dx[i]))
            base, other = (b[i], a[i]) if flip else (a[i], b[i])
            groups.setdefault(key, []).append(
                (int(base), int(other), float(stiffness[cls])))
    return layout, groups


def compute_layered_spec(task_arrays, round_to=8,
                         max_offset_classes=40) -> "LayeredSpec | None":
    """Build the static LayeredSpec covering a list of task mesh-array dicts
    (keys mesh_verts / mesh_*_edges / mesh_faces).  None when any task is
    not layered-representable or the offset-class union is too wide (cost is
    linear in classes; an irregular mesh explodes the union)."""
    rmax = cmax = vmax = tmax = 0
    union = set()
    for t in task_arrays:
        verts = np.asarray(t["mesh_verts"], np.float64).reshape(-1, 3)
        per_class = [np.asarray(t[k], np.int64).reshape(-1, 2) for k in
                     ("mesh_stretch_edges", "mesh_bend_edges",
                      "mesh_shear_edges")]
        out = _layered_edge_classes(verts, per_class, (1.0, 1.0, 1.0))
        if out is None:
            return None
        (r, c, _layer), groups = out
        rmax = max(rmax, int(r.max()))
        cmax = max(cmax, int(c.max()))
        vmax = max(vmax, len(verts))
        tmax = max(tmax, np.asarray(t["mesh_faces"]).size // 3)
        union |= set(groups)
    if not union or len(union) > max_offset_classes:
        return None
    H2 = rmax + 3  # >= 2 guard rows (bend shifts reach dy=2)
    offsets = tuple(sorted(
        (dl * H2 + dy, dx) for dl, dy, dx in union))

    def _up(v, m):
        return int((v + m - 1) // m * m)

    return LayeredSpec(
        H=_up(H2 + rmax + 1, round_to),
        W=_up(cmax + 1, round_to),
        H2=H2,
        offsets=offsets,
        vert_capacity=_up(vmax, 256),
        tri_capacity=_up(tmax, 256),
    )


def build_layered_topology(
    rest_positions: np.ndarray,
    stretch_edges: np.ndarray,
    bend_edges: np.ndarray,
    shear_edges: np.ndarray,
    faces: np.ndarray,
    stiffness,
    spec: LayeredSpec,
) -> LayeredGridTopology:
    """Express a 2-layer lattice mesh as a LayeredGridTopology under `spec`.

    Raises ValueError when the mesh does not fit the spec (off-lattice
    vertices, unknown offset class, slot conflict) — callers building from a
    task FILE should derive the spec from the same file (tasks.
    detect_layered_spec), which guarantees fit; the checks make silent
    physics corruption impossible."""
    verts = np.asarray(rest_positions, np.float64).reshape(-1, 3)
    n = len(verts)
    per_class = [np.asarray(e, np.int64).reshape(-1, 2) for e in
                 (stretch_edges, bend_edges, shear_edges)]
    out = _layered_edge_classes(verts, per_class, stiffness)
    if out is None:
        raise ValueError("mesh is not layered-lattice representable")
    (r, c, layer), groups = out
    H, W, H2 = spec.H, spec.W, spec.H2
    if int(r.max()) >= H2 - 2 or int(c.max()) >= W:
        raise ValueError("mesh exceeds LayeredSpec lattice extent")
    off_index = {o: k for k, o in enumerate(spec.offsets)}
    K = len(spec.offsets)

    row = r + layer * H2  # lattice row per vertex
    slot = row * W + c

    rest_arr = np.zeros((K, H, W), np.float32)
    stiff_arr = np.zeros((K, H, W), np.float32)
    count = np.zeros((H, W), np.float32)
    for (dl, dy, dx), items in groups.items():
        key = (dl * H2 + dy, dx)
        if key not in off_index:
            raise ValueError(f"offset {key} not in LayeredSpec.offsets")
        k = off_index[key]
        base = np.array([it[0] for it in items], np.int64)
        other = np.array([it[1] for it in items], np.int64)
        stf = np.array([it[2] for it in items], np.float32)
        br, bc = row[base], c[base]
        if np.any(stiff_arr[k, br, bc] != 0.0):
            raise ValueError("duplicate edge at one (offset, slot)")
        rest_arr[k, br, bc] = np.linalg.norm(
            verts[base] - verts[other], axis=1).astype(np.float32)
        stiff_arr[k, br, bc] = stf
        np.add.at(count, (br, bc), 1.0)
        np.add.at(count, (row[other], c[other]), 1.0)

    active = np.zeros((H, W), bool)
    active[row, c] = True
    grid_src = np.zeros(H * W, np.int32)
    grid_src[slot] = np.arange(n, dtype=np.int32)
    rest_pad = np.full((H * W, 3), 1e6, np.float32)
    rest_pad[slot] = verts.astype(np.float32)

    mesh_slot = np.zeros(spec.vert_capacity, np.int32)
    if n > spec.vert_capacity:
        raise ValueError("mesh exceeds LayeredSpec.vert_capacity")
    mesh_slot[:n] = slot

    faces = np.asarray(faces, np.int64).reshape(-1, 3)
    nt = len(faces)
    if nt > spec.tri_capacity:
        raise ValueError("mesh exceeds LayeredSpec.tri_capacity")
    tri_slots = slot[faces]  # (T, 3) lattice slots
    tri_pad = np.zeros((spec.tri_capacity - nt, 3), np.int64)
    tri = np.concatenate([tri_slots, tri_pad])
    tmask = np.arange(spec.tri_capacity) < nt

    return LayeredGridTopology(
        rest=jnp.asarray(rest_arr),
        stiff=jnp.asarray(stiff_arr),
        count=jnp.asarray(count),
        active=jnp.asarray(active),
        rest_positions=jnp.asarray(rest_pad),
        triangles=jnp.asarray(tri, jnp.int32),
        tri_mask=jnp.asarray(tmask),
        mesh_slot=jnp.asarray(mesh_slot),
        grid_src=jnp.asarray(grid_src),
        num_verts=jnp.int32(n),
        offsets=spec.offsets,
        H=H,
        W=W,
        vert_capacity=spec.vert_capacity,
    )


def grid_triangles_dynamic(dimx, dimy, max_dimx: int, max_dimy: int):
    """Padded (T, 3) triangle ids + (T,) mask for a grid cloth with DYNAMIC
    (traced) dims — the on-device analog of grid_triangles_np, usable under
    vmap over a task batch (canonical flat index = y * dimx + x).  Feeds the
    renderer's surface super-sampling (render/rasterizer.py)."""
    n_cells = (max_dimx - 1) * (max_dimy - 1)
    t = jnp.arange(2 * n_cells, dtype=jnp.int32)
    cell = t // 2
    second = (t % 2) == 1
    cx = cell % (max_dimx - 1)
    cy = cell // (max_dimx - 1)
    ok = (cx < dimx - 1) & (cy < dimy - 1)
    a = cy * dimx + cx
    b = a + 1
    c = a + dimx + 1
    d = a + dimx
    tri = jnp.where(
        second[:, None],
        jnp.stack([a, c, d], axis=1),
        jnp.stack([a, b, c], axis=1))
    tri = jnp.where(ok[:, None], tri, 0)
    return tri, ok


def grid_triangles_np(dimx: int, dimy: int) -> np.ndarray:
    """Triangles of a grid cloth, matching CreateSpringGrid's triangulation
    (helpers.h:855-864): per quad, (x-1,y-1),(x,y-1),(x,y) and
    (x-1,y-1),(x,y),(x-1,y)."""
    idx = np.arange(dimx * dimy).reshape(dimy, dimx)
    a = idx[:-1, :-1].reshape(-1)
    b = idx[:-1, 1:].reshape(-1)
    c = idx[1:, 1:].reshape(-1)
    d = idx[1:, :-1].reshape(-1)
    t1 = np.stack([a, b, c], axis=1)
    t2 = np.stack([a, c, d], axis=1)
    return np.stack([t1, t2], axis=1).reshape(-1, 3)
