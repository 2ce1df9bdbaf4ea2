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
