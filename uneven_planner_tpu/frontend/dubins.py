"""Closed-form Dubins shortest paths, branchless JAX.

Replaces the reference's use of OMPL's DubinsStateSpace for the one-shot
goal connection (reference:
src/uneven_planner/front_end/include/front_end/kino_astar.h:242-271, radius
wheel_base/tan(max_steer) at front_end/src/kino_astar.cpp:33).  OMPL is only
used there for distance + interpolate, which is small closed-form math: all
six words (LSL, RSR, LSR, RSL, RLR, LRL) are evaluated with invalid words
masked to +inf, and interpolation walks the three segments of the best word.

Poses are (x, y, yaw); `rho` is the minimum turning radius.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

TWO_PI = 2.0 * math.pi

# segment type per word, encoded L=+1, S=0, R=-1 (plain numpy: module-level
# jnp constants would leak tracers if the module is first imported inside a
# trace)
WORD_TYPES = np.asarray([
    [1, 0, 1],    # LSL
    [-1, 0, -1],  # RSR
    [1, 0, -1],   # LSR
    [-1, 0, 1],   # RSL
    [-1, 1, -1],  # RLR
    [1, -1, 1],   # LRL
], dtype=np.int32)


def _mod2pi(x):
    return x - TWO_PI * jnp.floor(x / TWO_PI)


def _words(alpha, beta, d):
    """Segment lengths [6, 3] (turn lengths in radians, straight in rho
    units) for the six Dubins words; invalid words -> inf."""
    sa, ca = jnp.sin(alpha), jnp.cos(alpha)
    sb, cb = jnp.sin(beta), jnp.cos(beta)
    c_ab = jnp.cos(alpha - beta)
    big = jnp.inf

    # LSL
    tmp = d + sa - sb
    p2 = 2 + d * d - 2 * c_ab + 2 * d * (sa - sb)
    p = jnp.sqrt(jnp.maximum(p2, 0.0))
    th = jnp.arctan2(cb - ca, tmp)
    lsl = jnp.stack([_mod2pi(-alpha + th), p, _mod2pi(beta - th)])
    lsl = jnp.where(p2 >= 0, lsl, big)

    # RSR
    tmp = d - sa + sb
    p2 = 2 + d * d - 2 * c_ab + 2 * d * (sb - sa)
    p = jnp.sqrt(jnp.maximum(p2, 0.0))
    th = jnp.arctan2(ca - cb, tmp)
    rsr = jnp.stack([_mod2pi(alpha - th), p, _mod2pi(-beta + th)])
    rsr = jnp.where(p2 >= 0, rsr, big)

    # LSR
    p2 = -2 + d * d + 2 * c_ab + 2 * d * (sa + sb)
    p = jnp.sqrt(jnp.maximum(p2, 0.0))
    th = jnp.arctan2(-ca - cb, d + sa + sb) - jnp.arctan2(-2.0, p)
    lsr = jnp.stack([_mod2pi(-alpha + th), p, _mod2pi(-_mod2pi(beta) + th)])
    lsr = jnp.where(p2 >= 0, lsr, big)

    # RSL
    p2 = d * d - 2 + 2 * c_ab - 2 * d * (sa + sb)
    p = jnp.sqrt(jnp.maximum(p2, 0.0))
    th = jnp.arctan2(ca + cb, d - sa - sb) - jnp.arctan2(2.0, p)
    rsl = jnp.stack([_mod2pi(alpha - th), p, _mod2pi(beta - th)])
    rsl = jnp.where(p2 >= 0, rsl, big)

    # RLR
    tmp = (6.0 - d * d + 2 * c_ab + 2 * d * (sa - sb)) / 8.0
    ok = jnp.abs(tmp) <= 1.0
    p = _mod2pi(TWO_PI - jnp.arccos(jnp.clip(tmp, -1.0, 1.0)))
    th = alpha - jnp.arctan2(ca - cb, d - sa + sb) + _mod2pi(p / 2.0)
    rlr = jnp.stack([_mod2pi(th), p,
                     _mod2pi(alpha - beta - th + _mod2pi(p))])
    rlr = jnp.where(ok, rlr, big)

    # LRL
    tmp = (6.0 - d * d + 2 * c_ab + 2 * d * (sb - sa)) / 8.0
    ok = jnp.abs(tmp) <= 1.0
    p = _mod2pi(TWO_PI - jnp.arccos(jnp.clip(tmp, -1.0, 1.0)))
    th = -alpha - jnp.arctan2(ca - cb, d + sa - sb) + p / 2.0
    lrl = jnp.stack([_mod2pi(th), p,
                     _mod2pi(_mod2pi(beta) - alpha - th + _mod2pi(p))])
    lrl = jnp.where(ok, lrl, big)

    return jnp.stack([lsl, rsr, lsr, rsl, rlr, lrl])


def _normalize(q0, q1, rho):
    dx = q1[0] - q0[0]
    dy = q1[1] - q0[1]
    D = jnp.sqrt(dx * dx + dy * dy)
    d = D / rho
    th = jnp.arctan2(dy, dx)
    alpha = _mod2pi(q0[2] - th)
    beta = _mod2pi(q1[2] - th)
    return alpha, beta, d


def distance(q0, q1, rho):
    """Shortest Dubins path length between SE(2) poses."""
    alpha, beta, d = _normalize(q0, q1, rho)
    w = _words(alpha, beta, d)
    return jnp.min(jnp.sum(w, axis=1)) * rho


def _segment(pose, seg_len, seg_type):
    """Advance a normalized pose (rho=1) along one segment."""
    x, y, th = pose[0], pose[1], pose[2]
    straight = jnp.stack([x + seg_len * jnp.cos(th),
                          y + seg_len * jnp.sin(th), th])
    left = jnp.stack([x + jnp.sin(th + seg_len) - jnp.sin(th),
                      y - jnp.cos(th + seg_len) + jnp.cos(th),
                      th + seg_len])
    right = jnp.stack([x - jnp.sin(th - seg_len) + jnp.sin(th),
                       y + jnp.cos(th - seg_len) - jnp.cos(th),
                       th - seg_len])
    return jnp.where(seg_type == 0, straight,
                     jnp.where(seg_type == 1, left, right))


def sample(q0, q1, rho, s):
    """Pose at arc length s (in world units) along the shortest path."""
    alpha, beta, d = _normalize(q0, q1, rho)
    w = _words(alpha, beta, d)
    lens = jnp.sum(w, axis=1)
    best = jnp.argmin(lens)
    segs = w[best]
    types = jnp.asarray(WORD_TYPES)[best]

    t = s / rho  # normalized arc length
    pose = jnp.stack([jnp.zeros_like(t), jnp.zeros_like(t),
                      jnp.full_like(t, q0[2])])
    done0 = jnp.minimum(t, segs[0])
    pose = _segment(pose, done0, types[0])
    done1 = jnp.clip(t - segs[0], 0.0, segs[1])
    pose = _segment(pose, done1, types[1])
    done2 = jnp.clip(t - segs[0] - segs[1], 0.0, segs[2])
    pose = _segment(pose, done2, types[2])

    return jnp.stack([q0[0] + pose[0] * rho, q0[1] + pose[1] * rho,
                      pose[2]])


def sample_many(q0, q1, rho, ss):
    return jax.vmap(lambda s: sample(q0, q1, rho, s))(ss)
