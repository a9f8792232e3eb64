"""Visualization exports (uneven_map.cpp:181-265 field/normal/SO(2)
markers; kino_astar.cpp:266-276 expanded nodes)."""

import dataclasses

import numpy as np

from uneven_planner_tpu.config import MapConfig, scene_config
from uneven_planner_tpu.terrain.synthetic import make_synthetic_grid
from uneven_planner_tpu.utils import vis

CFG = MapConfig(xy_resolution=0.4, yaw_resolution=1.1)


def test_field_and_normals(tmp_path):
    grid = make_synthetic_grid(CFG)
    cloud = vis.field_cloud(grid, yaw=0.0)
    nx, ny, _ = grid.voxel_num
    assert 0 < cloud.shape[0] <= nx * ny and cloud.shape[1] == 4
    # heights match the field, sigma is the intensity channel
    assert np.isfinite(cloud).all()
    segs = vis.normal_segments(grid, yaw=0.0)
    assert segs.shape[1:] == (2, 3)
    d = segs[:, 1] - segs[:, 0]
    # normals have the fixed 1.5*res length and point upward (c > 0)
    np.testing.assert_allclose(np.linalg.norm(d, axis=1),
                               1.5 * CFG.xy_resolution, rtol=1e-5)
    assert (d[:, 2] > 0).all()

    pts, so2segs = vis.so2_pose_markers(grid)
    assert pts.shape[0] == so2segs.shape[0] > 0

    occ = vis.occupancy_cloud(grid)
    assert occ.shape[0] + cloud.shape[0] == nx * ny

    vis.save_ply(str(tmp_path / "f.ply"), cloud[:, :3],
                 intensity=cloud[:, 3])
    txt = (tmp_path / "f.ply").read_text().splitlines()
    assert txt[0] == "ply" and f"element vertex {cloud.shape[0]}" in txt[2]
    vis.save_csv(str(tmp_path / "s.csv"), segs, header="x1,y1,z1,x2,y2,z2")
    assert len((tmp_path / "s.csv").read_text().splitlines()) \
        == segs.shape[0] + 1


def test_expanded_nodes_export():
    import jax
    import jax.numpy as jnp

    from uneven_planner_tpu.frontend import kino_init

    scfg = scene_config("hill")
    fe = dataclasses.replace(scfg.frontend, frontier_size=64, max_rounds=40)
    grid = make_synthetic_grid(CFG)
    start = jnp.asarray([-3.0, -3.0, 0.0])
    goal = jnp.asarray([-1.0, -3.0, 0.0])
    res = jax.jit(lambda s, g: kino_init.plan(grid, fe, s, g,
                                              with_arena=True))(start, goal)
    assert res.arena is not None and res.arena_parent is not None
    nodes = vis.expanded_nodes(res.arena, res.arena_parent)
    assert nodes.shape[0] >= 1  # at least the start
    # all expanded nodes lie inside the map
    assert (np.abs(nodes[:, :2]) <= 5.0 + 1e-6).all()
