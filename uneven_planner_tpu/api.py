"""High-level convenience API.

One-call equivalents of the reference's launch-file flows: build or load a
scene, plan one or many trajectories, track them.  Thin wrappers over the
composable modules — everything here stays jittable or host-side explicit.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

from uneven_planner_tpu.config import SceneConfig, scene_config
from uneven_planner_tpu.solver import alm


def load_or_build_scene(name: str, cache_dir: str = "data",
                        dtype=np.float32):
    """Terrain grid for a scene: synthetic hill, or PCD-built (npz-cached)
    reference scene — the reference's .map-cache startup behavior
    (uneven_map.cpp:166-167)."""
    import jax
    import jax.numpy as jnp
    from uneven_planner_tpu.terrain import build, grid as tgrid, io
    from uneven_planner_tpu.terrain.synthetic import make_synthetic_grid

    scfg = scene_config(name)
    if name == "hill":
        return scfg, jax.device_put(make_synthetic_grid(scfg.map,
                                                        dtype=dtype))
    os.makedirs(cache_dir, exist_ok=True)
    cache = os.path.join(cache_dir, f"{name}.npz")
    if os.path.exists(cache):
        data = io.load_map_npz(cache)
    else:
        cloud = io.load_scene_cloud(name)
        g = build.construct_map(cloud, scfg.map)
        data = np.asarray(g.data)
        io.save_map_npz(cache, data)
    grid = tgrid.from_buffers(
        jnp.asarray(data, dtype), scfg.map.min_cnormal, scfg.map.max_rho,
        scfg.map.xy_resolution, scfg.map.yaw_resolution,
        scfg.map.map_origin, scfg.map.gravity)
    return scfg, jax.device_put(grid)


def plan(grid, scfg: SceneConfig, start, goal,
         shape: Optional[alm.ProblemShape] = None,
         lbfgs_overrides: Optional[dict] = None):
    """Plan one trajectory: batched search + ALM optimize.

    Returns (KinoResult, ALMResult).  Jit-compatible; vmap for batches.
    """
    import jax.numpy as jnp
    from uneven_planner_tpu import manager
    from uneven_planner_tpu.frontend import kino_init

    shape = shape or alm.ProblemShape(piece_xy=10, piece_yaw=20, int_K=16)
    kres = kino_init.plan(grid, scfg.frontend, jnp.asarray(start),
                          jnp.asarray(goal))
    x0, bound = manager.init_guess_fixed_jax(
        kres.path, kres.path_mask, scfg.manager, shape.piece_xy,
        shape.piece_yaw)
    ares = alm.solve_flat(x0, bound, shape, grid, scfg.alm,
                     lbfgs_overrides=lbfgs_overrides
                     or {"mem_size": 8, "max_iterations": 250})
    return kres, ares


def plan_batch(grid, scfg: SceneConfig, starts, goals, **kwargs):
    import jax
    return jax.vmap(lambda s, g: plan(grid, scfg, s, g, **kwargs))(
        starts, goals)
