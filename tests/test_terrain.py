import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uneven_planner_tpu.config import MapConfig
from uneven_planner_tpu.terrain import grid as tgrid
from uneven_planner_tpu.terrain.synthetic import make_synthetic_grid, hill_height

# Small grid: compiles are expensive on the 2-core test machine.
TEST_CFG = MapConfig(xy_resolution=0.2, yaw_resolution=0.45)


@pytest.fixture(scope="module")
def grid():
    return make_synthetic_grid(TEST_CFG)


def _sample_poses(n=32, seed=0):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(-4.0, 4.0, size=(n, 2))
    yaw = rng.uniform(-np.pi, np.pi, size=(n, 1))
    return jnp.asarray(np.concatenate([xy, yaw], axis=1))


def test_normalize_so2():
    yaws = jnp.asarray([0.0, 3.2, -3.2, 7.0, -7.0, 2 * np.pi, -2 * np.pi])
    wrapped = tgrid.normalize_so2(yaws)
    assert np.all(np.abs(wrapped) <= np.pi + 1e-12)
    np.testing.assert_allclose(np.sin(wrapped), np.sin(yaws), atol=1e-12)
    np.testing.assert_allclose(np.cos(wrapped), np.cos(yaws), atol=1e-12)


def test_lookup_and_grads(grid):
    """One jitted program covering: value accuracy, cell-center exactness,
    yaw periodicity, hand-vs-autodiff gradients, 7-tuple chain rule."""
    poses = _sample_poses(24)

    @jax.jit
    def batch_eval(poses):
        get = lambda p: tgrid.get_terrain(grid, p)
        vals = jax.vmap(get)(poses)
        shifted = poses.at[:, 2].set(tgrid.normalize_so2(poses[:, 2] + 2 * np.pi))
        vals_shift = jax.vmap(get)(shifted)

        def sigma_zb_c(p):
            v = get(p)
            return jnp.array([v[1], v[2], v[3], tgrid.get_c(v)])

        hand = jax.vmap(lambda p: tgrid.get_terrain_with_grad(grid, p)[1])(poses)
        auto = jax.vmap(jax.jacfwd(sigma_zb_c))(poses)

        seven = lambda p: tgrid.get_terrain_variables(grid, p)
        v7_hand, g7_hand = jax.vmap(lambda p: tgrid.get_all_with_grad(grid, p))(poses)
        v7_auto = jax.vmap(seven)(poses)
        g7_auto = jax.vmap(jax.jacfwd(seven))(poses)
        return vals, vals_shift, hand, auto, v7_hand, g7_hand, v7_auto, g7_auto

    vals, vals_shift, hand, auto, v7_hand, g7_hand, v7_auto, g7_auto = \
        jax.tree.map(np.asarray, batch_eval(poses))

    # interpolated z tracks the analytic height field
    z_true = hill_height(np.asarray(poses[:, 0]), np.asarray(poses[:, 1]))
    np.testing.assert_allclose(vals[:, 0], z_true, atol=3e-2)
    # SO(2): yaw +- 2pi identical
    np.testing.assert_allclose(vals, vals_shift, atol=1e-9)
    # corner-difference gradient == autodiff (uneven_map.h:258-315)
    np.testing.assert_allclose(hand, auto, rtol=1e-7, atol=1e-9)
    # 7-tuple chain rule == autodiff (uneven_map.h:317-377)
    np.testing.assert_allclose(v7_hand, v7_auto, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(g7_hand, g7_auto, rtol=1e-6, atol=1e-8)


def test_exact_at_cell_center(grid):
    idx = jnp.asarray([20, 17, 4])
    pos = tgrid.index_to_pos(grid, idx)
    val = tgrid.get_terrain(grid, pos)
    np.testing.assert_allclose(np.asarray(val),
                               np.asarray(grid.data[20, 17, 4]), atol=1e-9)


def test_seven_tuple_flat_ground():
    cfg = TEST_CFG
    nx, ny, nyaw = cfg.voxel_num
    data = jnp.zeros((nx, ny, nyaw, 4))
    g = tgrid.from_buffers(data, cfg.min_cnormal, cfg.max_rho,
                           cfg.xy_resolution, cfg.yaw_resolution,
                           cfg.map_origin)
    v = tgrid.get_terrain_variables(g, jnp.asarray([0.3, -0.2, 0.7]))
    np.testing.assert_allclose(np.asarray(v),
                               [1.0, 0.0, 1.0, 0.0, 1.0, 1.0, 0.0], atol=1e-12)


def test_out_of_map_and_occupancy(grid):
    v = tgrid.get_terrain(grid, jnp.asarray([100.0, 0.0, 0.0]))
    np.testing.assert_array_equal(np.asarray(v), np.zeros(4))
    _, gr = tgrid.get_terrain_with_grad(grid, jnp.asarray([100.0, 0.0, 0.0]))
    np.testing.assert_array_equal(np.asarray(gr), np.zeros((4, 3)))
    nx, ny, nyaw = grid.voxel_num
    assert grid.occ.shape == (nx, ny, nyaw)
    np.testing.assert_array_equal(np.asarray(grid.occ_xy),
                                  np.asarray(jnp.any(grid.occ, axis=-1)))
    assert bool(tgrid.is_occupancy(grid, jnp.asarray([100.0, 0.0, 0.0])))


def test_se3_lift(grid):
    poses = _sample_poses(8, seed=3)

    @jax.jit
    def lift(poses):
        R, p3 = jax.vmap(lambda p: tgrid.se3_lift(grid, p))(poses)
        yaws = jax.vmap(tgrid.yaw_from_rotation)(R)
        return R, p3, yaws

    R, p3, yaws = jax.tree.map(np.asarray, lift(poses))
    for i in range(len(poses)):
        np.testing.assert_allclose(R[i].T @ R[i], np.eye(3), atol=1e-9)
    np.testing.assert_allclose(yaws, np.asarray(poses[:, 2]), atol=1e-9)
    z_true = hill_height(np.asarray(poses[:, 0]), np.asarray(poses[:, 1]))
    np.testing.assert_allclose(p3[:, 2], z_true, atol=3e-2)


def test_batched_lookup_matches_scalar(grid):
    poses = _sample_poses(64, seed=7)
    vb = tgrid.get_terrain_batch(grid, poses)
    v7b = tgrid.get_terrain_variables_batch(grid, poses)
    vs = jax.vmap(lambda p: tgrid.get_terrain(grid, p))(poses)
    v7s = jax.vmap(lambda p: tgrid.get_terrain_variables(grid, p))(poses)
    np.testing.assert_allclose(np.asarray(vb), np.asarray(vs), atol=1e-12)
    np.testing.assert_allclose(np.asarray(v7b), np.asarray(v7s), atol=1e-12)
    # out-of-map rows are zero
    far = jnp.asarray([[100.0, 0.0, 0.0]])
    np.testing.assert_array_equal(
        np.asarray(tgrid.get_terrain_batch(grid, far)), np.zeros((1, 4)))


def test_channel_major_lookup_matches_batch(grid):
    """get_terrain_variables_cm (transposed yaw-pair table, channel-major)
    must match the row-major batched lookup bitwise."""
    from uneven_planner_tpu.terrain import grid as tgrid
    gp = tgrid.with_pair_table(grid)
    rng = np.random.default_rng(3)
    M = 2000
    px = jnp.asarray(rng.uniform(-6, 6, M))
    py = jnp.asarray(rng.uniform(-6, 6, M))
    yw = jnp.asarray(rng.uniform(-np.pi, np.pi, M))
    tv_cm = tgrid.get_terrain_variables_cm(gp, px, py, yw)
    poses = jnp.stack([px, py, yw], axis=1)
    old = tgrid.LOOKUP_IMPL
    try:
        tgrid.LOOKUP_IMPL = "flat"
        tv_ref = tgrid.get_terrain_variables_batch(grid, poses).T
    finally:
        tgrid.LOOKUP_IMPL = old
    np.testing.assert_allclose(np.asarray(tv_cm), np.asarray(tv_ref),
                               rtol=2e-6, atol=2e-6)


def test_packed_lookup_matches_exact_within_bf16(grid):
    """The split hi+lo bf16 2-item lookup must match the exact channel-major
    path to the hi+lo reconstruction error (<= ~4e-6 relative on the stored
    field; slightly amplified through the 7-tuple math), including the
    clamped map edges and the wrapped yaw seam."""
    g32 = tgrid.TerrainGrid(
        data=jnp.asarray(np.asarray(grid.data, np.float32)),
        occ=grid.occ, occ_xy=grid.occ_xy,
        xy_resolution=grid.xy_resolution,
        yaw_resolution=grid.yaw_resolution, origin=grid.origin)
    g = tgrid.with_packed_table(tgrid.with_pair_table(g32))
    rng = np.random.default_rng(3)
    M = 512
    px = jnp.asarray(rng.uniform(-4.95, 4.95, M).astype(np.float32))
    py = jnp.asarray(rng.uniform(-4.95, 4.95, M).astype(np.float32))
    yaw = jnp.asarray(rng.uniform(-np.pi, np.pi, M).astype(np.float32))
    # force edge coverage: low/high strips in both x and y, yaw seam
    px = px.at[:8].set(jnp.asarray(g.origin[0] + 0.01, jnp.float32))
    py = py.at[8:16].set(jnp.asarray(g.origin[1] + 0.01, jnp.float32))
    px = px.at[16:24].set(jnp.asarray(-g.origin[0] - 0.01, jnp.float32))
    yaw = yaw.at[24:32].set(jnp.asarray(np.pi - 1e-3, jnp.float32))
    ex = tgrid.get_terrain_variables_cm(g, px, py, yaw, exact=True)
    pk = tgrid.get_terrain_variables_cm(g, px, py, yaw, exact=False)
    rel = np.abs(np.asarray(ex) - np.asarray(pk)) / \
        np.maximum(np.abs(np.asarray(ex)), 1.0)
    assert rel.max() < 5e-5, rel.max()


def test_packed16_lookup_matches_exact(grid):
    """The f16 packed table: hi-only mode must match the exact path to the
    f16 mantissa (~2.5e-4 relative on the stored field), exact mode (hi +
    f16 residual) to ~2e-7 — including clamped xy edges and the yaw seam."""
    g32 = tgrid.TerrainGrid(
        data=jnp.asarray(np.asarray(grid.data, np.float32)),
        occ=grid.occ, occ_xy=grid.occ_xy,
        xy_resolution=grid.xy_resolution,
        yaw_resolution=grid.yaw_resolution, origin=grid.origin)
    g = tgrid.with_packed_f16(tgrid.with_pair_table(g32))
    rng = np.random.default_rng(5)
    M = 512
    px = jnp.asarray(rng.uniform(-4.95, 4.95, M).astype(np.float32))
    py = jnp.asarray(rng.uniform(-4.95, 4.95, M).astype(np.float32))
    yaw = jnp.asarray(rng.uniform(-np.pi, np.pi, M).astype(np.float32))
    px = px.at[:8].set(jnp.asarray(g.origin[0] + 0.01, jnp.float32))
    py = py.at[8:16].set(jnp.asarray(g.origin[1] + 0.01, jnp.float32))
    px = px.at[16:24].set(jnp.asarray(-g.origin[0] - 0.01, jnp.float32))
    yaw = yaw.at[24:32].set(jnp.asarray(np.pi - 1e-3, jnp.float32))
    ex = np.asarray(tgrid.get_terrain_variables_cm(g, px, py, yaw,
                                                   exact=True))
    hi = np.asarray(tgrid.get_terrain_variables_cm_packed16(
        g, px, py, yaw, exact=False))
    full = np.asarray(tgrid.get_terrain_variables_cm_packed16(
        g, px, py, yaw, exact=True))
    rel_hi = np.abs(ex - hi) / np.maximum(np.abs(ex), 1.0)
    rel_full = np.abs(ex - full) / np.maximum(np.abs(ex), 1.0)
    assert rel_hi.max() < 4e-3, rel_hi.max()     # f16 + 7-tuple amplification
    assert rel_full.max() < 1e-5, rel_full.max()
    # dispatcher: exact=False must route through the f16 table when attached
    via = np.asarray(tgrid.get_terrain_variables_cm(g, px, py, yaw,
                                                    exact=False))
    np.testing.assert_array_equal(via, hi)


def test_mesh_to_cloud_roundtrip(tmp_path):
    """Mesh sampler (to_pcl.py equivalent): sample a unit-cube OBJ, check
    density/coverage, and round-trip through the PCD writer/reader."""
    from uneven_planner_tpu.terrain import mesh as tmesh
    from uneven_planner_tpu.terrain.io import read_pcd
    obj = tmp_path / "cube.obj"
    v = [(x, y, z) for x in (0, 1) for y in (0, 1) for z in (0, 1)]
    quads = [(1, 2, 4, 3), (5, 7, 8, 6), (1, 5, 6, 2),
             (3, 4, 8, 7), (1, 3, 7, 5), (2, 6, 8, 4)]
    with open(obj, "w") as f:
        for p in v:
            f.write(f"v {p[0]} {p[1]} {p[2]}\n")
        for q in quads:
            f.write("f " + " ".join(map(str, q)) + "\n")
    pts = tmesh.mesh_to_cloud(str(obj), n_points=20000, leaf=0.05)
    assert len(pts) > 1000
    assert pts.min() >= -1e-6 and pts.max() <= 1 + 1e-6
    # each face plane should be sampled
    for axis in range(3):
        assert (pts[:, axis] < 0.02).any() and (pts[:, axis] > 0.98).any()
    pcd = tmp_path / "cube.pcd"
    tmesh.save_pcd(str(pcd), pts)
    back = read_pcd(str(pcd))
    assert back.shape == pts.shape
    np.testing.assert_allclose(back, pts, atol=1e-5)


def test_sigma_cm_and_occ_batch_match_scalar(grid):
    """Channel-major sigma / occupancy batch lookups (the front end's hot
    path after the round-3 OOM fix) must match the scalar reference paths
    on all three table variants (raw / pair / packed)."""
    poses = _sample_poses(48, seed=3)
    px, py, yaw = poses[:, 0], poses[:, 1], tgrid.normalize_so2(poses[:, 2])
    g32 = jax.tree.map(lambda a: jnp.asarray(np.asarray(a), jnp.float32)
                       if a.dtype == jnp.float64 else a, grid)
    want = np.asarray(jax.vmap(
        lambda p: tgrid.terrain_sigma(g32, p))(poses.astype(jnp.float32)))

    raw = np.asarray(tgrid.terrain_sigma_cm(
        g32, px.astype(jnp.float32), py.astype(jnp.float32),
        yaw.astype(jnp.float32)))
    np.testing.assert_allclose(raw, want, rtol=1e-5, atol=1e-6)

    gp = tgrid.with_pair_table(g32)
    pair = np.asarray(tgrid.terrain_sigma_cm(
        gp, px.astype(jnp.float32), py.astype(jnp.float32),
        yaw.astype(jnp.float32)))
    np.testing.assert_allclose(pair, want, rtol=1e-5, atol=1e-6)

    gk = tgrid.with_packed_table(g32)
    packed = np.asarray(tgrid.terrain_sigma_cm(
        gk, px.astype(jnp.float32), py.astype(jnp.float32),
        yaw.astype(jnp.float32)))
    np.testing.assert_allclose(packed, want, rtol=1e-3, atol=1e-5)

    occ_scalar = np.asarray(jax.vmap(
        lambda p: tgrid.is_occupancy_xy(g32, p[:2]))(poses))
    occ_batch = np.asarray(tgrid.is_occupancy_xy_batch(g32, px, py))
    np.testing.assert_array_equal(occ_batch, occ_scalar)
