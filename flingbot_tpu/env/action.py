"""Dense action selection: masked argmax over the spatial action space.

The reference walks candidate pixels in descending value order, lazily
checking validity (in-bounds after inverse transform), dual-arm
reachability, and the conservative grasp-circle cloth test until one
passes (get_max_value_valid_action, environment/simEnv.py:560-661 with
check_action, simEnv.py:202-260).  Validity is action-independent, so on
TPU we compute ALL validity masks up front as arrays and take one masked
argmax — semantically identical, with zero host round-trips.  The
grasp-circle test uses the eroded cloth mask warped through the same
transform stack as the observation (observation.py), masking out pixels
whose primitive would no-op (fling: both circles off cloth, simEnv.py:287;
drag/place: p1 off cloth, simEnv.py:324,350).

Per-primitive grasp-point geometry (get_action_params, simEnv.py:517-537):
  fling/stretchdrag: p1/p2 = selected pixel +- pix_grasp_dist rows
  drag:              p2 = p1 + pix_drag_dist rows
  place:             p2 = p1 + pix_place_dist rows
Reachability (check_action_reachability, simEnv.py:543-558): fling needs
left arm -> p1 and right arm -> p2; drag/place need one arm to reach both.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from flingbot_tpu.engine.solver import shift2d
from flingbot_tpu.env.observation import Observation
from flingbot_tpu.learning.transforms import transform_pixels_to_source
from flingbot_tpu.render.camera import pixel_to_world

NEG_INF = -1e30


class ActionSelection(NamedTuple):
    valid: jnp.ndarray  # bool — a valid action existed
    prim_idx: jnp.ndarray  # i32 index into the primitive list
    transform_idx: jnp.ndarray  # i32
    row: jnp.ndarray  # i32 pixel in transformed view
    col: jnp.ndarray
    rotation: jnp.ndarray  # f32 degrees
    scale: jnp.ndarray  # f32
    value: jnp.ndarray  # f32 selected Q value
    p1_world: jnp.ndarray  # (3,)
    p2_world: jnp.ndarray  # (3,)
    p1_grasp: jnp.ndarray  # bool — conservative grasp circle on cloth
    p2_grasp: jnp.ndarray
    pretransform_pixels: jnp.ndarray  # (2, 2) float (row, col) source px
    action_mask: jnp.ndarray  # (D, D) one-hot at the selected pixel


def _pair_offsets(primitives: Sequence[str], pix_grasp_dist, pix_drag_dist,
                  pix_place_dist):
    o1, o2, pairing = [], [], []
    for p in primitives:
        if p in ("fling", "stretchdrag"):
            o1.append(pix_grasp_dist)
            o2.append(-pix_grasp_dist)
            pairing.append(0)  # left->p1, right->p2
        elif p == "drag":
            o1.append(0)
            o2.append(pix_drag_dist)
            pairing.append(1)  # one arm reaches both
        elif p == "place":
            o1.append(0)
            o2.append(pix_place_dist)
            pairing.append(1)
        else:
            raise ValueError(p)
    return tuple(o1), tuple(o2), tuple(pairing)


@functools.partial(
    jax.jit,
    static_argnames=(
        "primitives", "pix_grasp_dist", "pix_drag_dist", "pix_place_dist",
    ),
)
def select_action(
    value_maps: jnp.ndarray,  # (P, T, D, D)
    obs: Observation,
    rotations: jnp.ndarray,  # (R,)
    primitives: Sequence[str] = ("fling",),
    pix_grasp_dist: int = 8,
    pix_drag_dist: int = 10,
    pix_place_dist: int = 10,
) -> ActionSelection:
    P, T, D, _ = value_maps.shape
    o1s, o2s, pairings = _pair_offsets(
        primitives, pix_grasp_dist, pix_drag_dist, pix_place_dist)

    reach_l = obs.mask_stack[:, 1] > 0.5
    reach_r = obs.mask_stack[:, 2] > 0.5
    grasp_w = obs.mask_stack[:, 3] > 0.5  # warped grasp-circle-on-cloth
    inb = obs.mask_stack[:, 4] > 0.5

    ri = jnp.arange(D)
    # edge crop in both axes (the (**) crop, simEnv.py:564-567)
    crop = (
        (ri >= pix_grasp_dist) & (ri < D - pix_grasp_dist)
    )
    crop2d = crop[:, None] & crop[None, :]

    def shifted(m, dy):
        # value at (y+dy, x); out-of-range -> False
        return jax.vmap(lambda a: shift2d(a, dy, 0, fill=False))(m)

    masks = []
    for o1, o2, pairing in zip(o1s, o2s, pairings):
        p1_in = shifted(inb, o1)
        p2_in = shifted(inb, o2)
        if pairing == 0:
            reach_ok = shifted(reach_l, o1) & shifted(reach_r, o2)
            # fling/stretchdrag no-op unless at least one grasp circle
            # lands on cloth (simEnv.py:287); mask those pixels out so the
            # argmax moves to the next-best executable action, matching
            # the reference's candidate-rejection scan (simEnv.py:560-661)
            grasp_ok_p = shifted(grasp_w, o1) | shifted(grasp_w, o2)
        else:
            left_both = shifted(reach_l, o1) & shifted(reach_l, o2)
            right_both = shifted(reach_r, o1) & shifted(reach_r, o2)
            reach_ok = left_both | right_both
            # drag/place no-op unless p1's grasp circle is on cloth
            # (simEnv.py:324,350)
            grasp_ok_p = shifted(grasp_w, o1)
        masks.append(p1_in & p2_in & reach_ok & grasp_ok_p & crop2d[None])
    valid = jnp.stack(masks)  # (P, T, D, D)

    masked = jnp.where(valid, value_maps, NEG_INF)
    flat_idx = jnp.argmax(masked.reshape(-1))
    best = masked.reshape(-1)[flat_idx]
    any_valid = best > NEG_INF / 2
    # fall back to the unmasked argmax when nothing is valid (the primitive
    # then no-ops via grasp flags and the env's no-movement early exit fires)
    flat_idx = jnp.where(
        any_valid, flat_idx, jnp.argmax(value_maps.reshape(-1)))
    value = value_maps.reshape(-1)[flat_idx]

    prim_idx = flat_idx // (T * D * D)
    rem = flat_idx % (T * D * D)
    t = rem // (D * D)
    rem = rem % (D * D)
    row = rem // D
    col = rem % D

    n_scales = obs.adaptive_scales.shape[0]
    rotation = rotations[t // n_scales]
    scale = obs.adaptive_scales[t % n_scales]

    off1 = jnp.asarray(o1s)[prim_idx]
    off2 = jnp.asarray(o2s)[prim_idx]
    px_t = jnp.stack([
        jnp.stack([row + off1, col]),
        jnp.stack([row + off2, col]),
    ]).astype(jnp.float32)  # (2, 2) transformed-view pixels

    S = obs.depth.shape[0]
    src_px = transform_pixels_to_source(px_t, rotation, scale, S, D)  # (2,2)

    def sample(img, px):
        r = jnp.clip(jnp.round(px[0]).astype(jnp.int32), 0, S - 1)
        c = jnp.clip(jnp.round(px[1]).astype(jnp.int32), 0, S - 1)
        return img[r, c]

    d1 = sample(obs.depth, src_px[0])
    d2 = sample(obs.depth, src_px[1])
    p1w = pixel_to_world(src_px[0, 0], src_px[0, 1], d1, S)
    p2w = pixel_to_world(src_px[1, 0], src_px[1, 1], d2, S)
    g1 = sample(obs.grasp_ok, src_px[0]) & any_valid
    g2 = sample(obs.grasp_ok, src_px[1]) & any_valid

    action_mask = jnp.zeros((D, D), jnp.float32).at[row, col].set(1.0)

    return ActionSelection(
        valid=any_valid,
        prim_idx=prim_idx.astype(jnp.int32),
        transform_idx=t.astype(jnp.int32),
        row=row.astype(jnp.int32),
        col=col.astype(jnp.int32),
        rotation=rotation,
        scale=scale,
        value=value,
        p1_world=p1w,
        p2_world=p2w,
        p1_grasp=g1,
        p2_grasp=g2,
        pretransform_pixels=src_px,
        action_mask=action_mask,
    )
