import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uneven_planner_tpu.config import (FrontendConfig, MapConfig, MPCConfig,
                                       scene_config)
from uneven_planner_tpu.minco import minco
from uneven_planner_tpu.minco.traj import SE2Traj, se2_state
from uneven_planner_tpu.mpc import traj_msg
from uneven_planner_tpu.parallel import pipeline
from uneven_planner_tpu.solver import alm
from uneven_planner_tpu.terrain.synthetic import make_synthetic_grid

TEST_MAP = MapConfig(xy_resolution=0.2, yaw_resolution=0.45)


def test_traj_msg_roundtrip_exact():
    """A MINCO trajectory with zero boundary v/a survives the wire-format
    round trip exactly (the controller re-solves the same system,
    traj_anal.hpp:125-181)."""
    rng = np.random.default_rng(0)
    N = 6
    inner = jnp.asarray(rng.normal(size=(N - 1, 2)))
    ts = jnp.asarray(rng.uniform(0.5, 1.2, size=N))
    zero = jnp.zeros((1, 2))
    head = jnp.concatenate([jnp.asarray([[0.5, -0.3]]), zero, zero])
    tail = jnp.concatenate([jnp.asarray([[2.0, 1.0]]), zero, zero])
    c_xy = minco.generate(inner, ts, head, tail)
    c_yaw = minco.generate(jnp.asarray(rng.normal(size=(N - 1, 1))), ts,
                           jnp.zeros((3, 1)), jnp.zeros((3, 1)))
    traj = SE2Traj(c_xy, ts, c_yaw, ts)

    msg = traj_msg.msg_from_traj(traj)
    back = traj_msg.traj_from_msg(msg)
    np.testing.assert_allclose(np.asarray(back.c_xy), np.asarray(traj.c_xy),
                               rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(back.c_yaw),
                               np.asarray(traj.c_yaw), rtol=1e-8, atol=1e-9)


def test_figure_eight_traj():
    traj = traj_msg.figure_eight(max_vel=0.4)
    t = jnp.asarray(0.0)
    pos, vel, _, yaw, _, _ = se2_state(traj, t)
    assert np.isfinite(np.asarray(pos)).all()
    # closed-ish curve: end returns near start
    end_pos, *_ = se2_state(traj, traj.total_duration)
    np.testing.assert_allclose(np.asarray(end_pos), np.asarray(pos),
                               atol=1e-6)


def test_full_pipeline_single_scenario():
    """search -> ALM -> wire round trip -> closed-loop MPC tracking, one
    jitted program."""
    scfg = scene_config("hill")
    scfg = dataclasses.replace(
        scfg,
        map=TEST_MAP,
        frontend=dataclasses.replace(scfg.frontend, frontier_size=128,
                                     max_rounds=60),
        mpc=dataclasses.replace(scfg.mpc, qp_max_iter=800),
    )
    grid = make_synthetic_grid(TEST_MAP)
    shape = alm.ProblemShape(piece_xy=10, piece_yaw=20, int_K=16)
    start = jnp.asarray([-3.0, -3.0, 0.0])
    goal = jnp.asarray([0.0, -3.0, 0.0])

    run = jax.jit(lambda s, g, gr: pipeline.plan_track_scenario(
        gr, scfg, s, g, shape, n_track_steps=400,
        lbfgs_overrides={"mem_size": 32, "max_iterations": 200},
        max_sqp_iter=3))
    res = run(start, goal, grid)
    assert bool(res.plan_success), "front end failed"
    assert bool(res.alm_converged), "back end failed"
    # centimeter-level on the ideal plant (reference intent: mpc.cpp
    # relinearizes to du_th=0.001 within a 10 ms budget; measured here
    # mean 1.07 cm / final 1.21 cm, gates allow ~2x margin)
    assert float(res.mean_track_err) < 0.02, \
        f"tracking error {float(res.mean_track_err)}"
    assert float(res.final_track_err) < 0.025
    assert float(res.non_hol) < 1.0


def test_full_pipeline_slip_plant():
    """Same scenario against the slip/actuator-lag plant (the analytic
    analog of the reference's Gazebo wheel-slip realism, README.md:86-89):
    the tracker must stay centimeter-level on a plant that does not match
    its internal kinematic model (measured mean 1.40 cm / final 1.60 cm)."""
    from uneven_planner_tpu.sim.rollout import PlantParams

    scfg = scene_config("hill")
    scfg = dataclasses.replace(
        scfg,
        map=TEST_MAP,
        frontend=dataclasses.replace(scfg.frontend, frontier_size=128,
                                     max_rounds=60),
        mpc=dataclasses.replace(scfg.mpc, qp_max_iter=800),
    )
    grid = make_synthetic_grid(TEST_MAP)
    shape = alm.ProblemShape(piece_xy=10, piece_yaw=20, int_K=16)
    start = jnp.asarray([-3.0, -3.0, 0.0])
    goal = jnp.asarray([0.0, -3.0, 0.0])
    plant = PlantParams(slip_lon=0.05, slip_lat=0.02,
                        v_tau=0.05, steer_tau=0.05)
    run = jax.jit(lambda s, g, gr: pipeline.plan_track_scenario(
        gr, scfg, s, g, shape, n_track_steps=400,
        lbfgs_overrides={"mem_size": 32, "max_iterations": 200},
        max_sqp_iter=3, plant_params=plant))
    res = run(start, goal, grid)
    assert bool(res.plan_success) and bool(res.alm_converged)
    assert float(res.mean_track_err) < 0.03, \
        f"slip-plant tracking error {float(res.mean_track_err)}"
    assert float(res.final_track_err) < 0.03


def test_forest_config_solve():
    """Hardest scene config (max_sig=0.001, rho_T=500, scaling off,
    run_forest.yaml deltas): the solver must still converge on smooth
    terrain with the tight sigma bound."""
    scfg = scene_config("forest")
    assert not scfg.alm.use_scaling and scfg.alm.max_sig == 0.001
    grid = make_synthetic_grid(dataclasses.replace(
        TEST_MAP, max_rho=scfg.map.max_rho), roughness=0.0005)
    from uneven_planner_tpu import manager
    from uneven_planner_tpu.config import ManagerConfig
    t = np.linspace(0, 1, 20)[:, None]
    path = np.concatenate(
        [(1 - t) * np.array([-3.0, -3.0]) + t * np.array([-1.0, -3.0]),
         np.zeros((20, 1))], axis=1)
    x0, bound = manager.init_guess_fixed(path, ManagerConfig(), 8, 16)
    shape = alm.ProblemShape(8, 16, 16)
    res = jax.jit(lambda x, b, g: alm.solve(
        x, b, shape, g, scfg.alm,
        lbfgs_overrides={"mem_size": 16, "max_iterations": 250}))(
        jnp.asarray(x0), jax.tree.map(jnp.asarray, bound), grid)
    # The reference exits forest solves at the ALM iteration cap with a
    # small residual (rho_T=500 resists the slow-down needed to clear the
    # velocity bound; alm_traj_opt.cpp:265-270 then publishes anyway).
    # Accept the same: tiny equality residual, small bounded inequality
    # residual, sigma bound actually satisfied.
    assert float(res.res_h) < 1e-3
    assert float(res.res_g) < 0.05, float(res.res_g)
    from uneven_planner_tpu.minco.traj import max_metrics
    m = jax.jit(lambda tr, g: max_metrics(tr, g, 1024))(res.traj, grid)
    assert float(m["max_vx"]) < scfg.alm.max_vel * 1.1
    assert float(m["max_sig"]) <= scfg.alm.max_sig


def test_api_plan():
    from uneven_planner_tpu import api
    scfg = scene_config("hill")
    scfg = dataclasses.replace(
        scfg, map=TEST_MAP,
        frontend=dataclasses.replace(scfg.frontend, frontier_size=128,
                                     max_rounds=60))
    grid = make_synthetic_grid(TEST_MAP)
    kres, ares = jax.jit(lambda s, g, gr: api.plan(
        gr, scfg, s, g, lbfgs_overrides={"mem_size": 16,
                                         "max_iterations": 150}))(
        jnp.asarray([-3.0, -3.0, 0.0]), jnp.asarray([0.0, -3.0, 0.0]), grid)
    assert bool(kres.success) and bool(ares.converged)


def test_chunked_pipeline_matches_fused():
    """The two-phase TPU path (jitted plan+solve then host-chunked
    tracking) must reproduce the fused single-jit pipeline."""
    scfg = scene_config("hill")
    scfg = dataclasses.replace(
        scfg,
        map=TEST_MAP,
        frontend=dataclasses.replace(scfg.frontend, frontier_size=128,
                                     max_rounds=60),
    )
    grid = make_synthetic_grid(TEST_MAP)
    shape = alm.ProblemShape(6, 12, 8)
    starts = jnp.asarray([[-3.0, -3.0, 0.0], [-3.2, -2.5, 0.3]])
    goals = jnp.asarray([[-1.5, -3.0, 0.0], [-1.8, -2.2, 0.3]])
    ovr = {"mem_size": 8, "max_iterations": 250}
    fused = jax.jit(lambda s, g: pipeline.plan_track_batch(
        grid, scfg, s, g, shape, n_track_steps=50,
        lbfgs_overrides=ovr))(starts, goals)
    chunked = pipeline.plan_track_batch_chunked(
        grid, scfg, starts, goals, shape, n_track_steps=50,
        lbfgs_overrides=ovr, chunk_ticks=16)
    np.testing.assert_array_equal(np.asarray(fused.plan_success),
                                  np.asarray(chunked.plan_success))
    np.testing.assert_array_equal(np.asarray(fused.alm_converged),
                                  np.asarray(chunked.alm_converged))
    np.testing.assert_allclose(np.asarray(fused.mean_track_err),
                               np.asarray(chunked.mean_track_err),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(fused.final_track_err),
                               np.asarray(chunked.final_track_err),
                               rtol=1e-5, atol=1e-6)
