import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uneven_planner_tpu.config import MPCConfig
from uneven_planner_tpu.minco import minco
from uneven_planner_tpu.minco.traj import SE2Traj
from uneven_planner_tpu.mpc import tracker
from uneven_planner_tpu.sim import rollout
from uneven_planner_tpu.solver import admm_qp


# --------------------------- ADMM QP solver ---------------------------------

def test_qp_equality_constrained_matches_kkt():
    """With l == u the QP reduces to an equality-constrained problem with a
    closed-form KKT solution."""
    rng = np.random.default_rng(0)
    n, m = 12, 5
    L = rng.normal(size=(n, n))
    P = jnp.asarray(L @ L.T + n * np.eye(n))
    q = jnp.asarray(rng.normal(size=n))
    A = jnp.asarray(rng.normal(size=(m, n)))
    b = jnp.asarray(rng.normal(size=m))
    sol = jax.jit(lambda: admm_qp.solve_qp(P, q, A, b, b, eps_abs=1e-10,
                                           eps_rel=1e-10, max_iter=20000))()
    KKT = np.block([[np.asarray(P), np.asarray(A).T],
                    [np.asarray(A), np.zeros((m, m))]])
    rhs = np.concatenate([-np.asarray(q), np.asarray(b)])
    xy = np.linalg.solve(KKT, rhs)
    np.testing.assert_allclose(np.asarray(sol.x), xy[:n], atol=1e-6)


def test_qp_box_constrained_kkt_residuals():
    """Random strictly-convex box QPs: ADMM solution must satisfy KKT."""
    rng = np.random.default_rng(1)
    for trial in range(3):
        n, m = 10, 16
        L = rng.normal(size=(n, n))
        P = jnp.asarray(L @ L.T + n * np.eye(n))
        q = jnp.asarray(rng.normal(size=n) * 3)
        A = jnp.asarray(rng.normal(size=(m, n)))
        l = jnp.asarray(-np.abs(rng.normal(size=m)) - 0.1)
        u = jnp.asarray(np.abs(rng.normal(size=m)) + 0.1)
        sol = jax.jit(lambda P, q, A, l, u: admm_qp.solve_qp(
            P, q, A, l, u, eps_abs=1e-9, eps_rel=1e-9, max_iter=20000))(
            P, q, A, l, u)
        stat, prim, comp = admm_qp.kkt_residuals(P, q, A, l, u, sol.x, sol.y)
        assert float(stat) < 1e-5, f"stationarity {float(stat)}"
        assert float(prim) < 1e-6, f"primal feas {float(prim)}"
        assert float(comp) < 1e-4, f"complementarity {float(comp)}"


def test_qp_ruiz_adaptive_polish_improve_badly_scaled():
    """An ill-conditioned QP (mixed 1e-4..1e4 scales): with Ruiz
    equilibration + adaptive rho + polish the solver must reach KKT-grade
    accuracy in far fewer iterations than the plain ADMM loop."""
    rng = np.random.default_rng(7)
    n, m = 14, 20
    scales = 10.0 ** rng.uniform(-3, 3, size=n)
    L = rng.normal(size=(n, n)) * scales[None, :]
    P = jnp.asarray(L.T @ L + 1e-3 * np.diag(scales ** 2) + 1e-6 * np.eye(n))
    q = jnp.asarray(rng.normal(size=n) * scales)
    A = jnp.asarray(rng.normal(size=(m, n)) * scales[None, :])
    l = jnp.asarray(-np.abs(rng.normal(size=m)) - 0.1)
    u = jnp.asarray(np.abs(rng.normal(size=m)) + 0.1)

    full = jax.jit(lambda: admm_qp.solve_qp(
        P, q, A, l, u, eps_abs=1e-8, eps_rel=1e-8, max_iter=20000))()
    plain = jax.jit(lambda: admm_qp.solve_qp(
        P, q, A, l, u, eps_abs=1e-8, eps_rel=1e-8, max_iter=20000,
        ruiz=False, adaptive_rho=False, polish=False))()

    stat, prim, comp = admm_qp.kkt_residuals(P, q, A, l, u, full.x, full.y)
    assert float(stat) < 1e-6 and float(prim) < 1e-7 \
        and float(comp) < 1e-6, (float(stat), float(prim), float(comp))
    assert int(full.iters) < int(plain.iters), \
        (int(full.iters), int(plain.iters))


def test_qp_polish_reaches_machine_precision_active_set():
    """Polish solves the detected active set exactly: residuals drop to
    ~machine precision on a well-scaled box QP."""
    rng = np.random.default_rng(11)
    n, m = 10, 14
    L = rng.normal(size=(n, n))
    P = jnp.asarray(L @ L.T + n * np.eye(n))
    q = jnp.asarray(3 * rng.normal(size=n))
    A = jnp.asarray(rng.normal(size=(m, n)))
    l = jnp.asarray(-np.abs(rng.normal(size=m)) - 0.05)
    u = jnp.asarray(np.abs(rng.normal(size=m)) + 0.05)
    sol = jax.jit(lambda: admm_qp.solve_qp(
        P, q, A, l, u, eps_abs=1e-6, eps_rel=1e-6, max_iter=8000))()
    stat, prim, comp = admm_qp.kkt_residuals(P, q, A, l, u, sol.x, sol.y)
    assert float(stat) < 1e-9 and float(prim) < 1e-9, \
        (float(stat), float(prim), float(comp))


# --------------------------- MPC pieces -------------------------------------

CFG = MPCConfig()


def test_linearization_consistency():
    """A x + B u + C must equal the nonlinear step to first order at the
    linearization point (getLinearModel vs stateTrans, mpc.cpp:194-246)."""
    theta, vx, delta = 0.7, 0.4, 0.2
    A, B, C = tracker.linearize(jnp.asarray(theta), jnp.asarray(vx),
                                jnp.asarray(delta), CFG)
    state = jnp.asarray([1.0, 2.0, theta])
    u = jnp.asarray([vx, delta])
    lin = A @ state + B @ u + C
    nonlin = tracker.state_trans(state, u, CFG)
    np.testing.assert_allclose(np.asarray(lin), np.asarray(nonlin), atol=1e-9)


def test_smooth_yaw_wraps():
    xref = jnp.zeros((3, 5)).at[2].set(jnp.asarray(
        [3.0, 3.2, 3.4, -2.9, -2.7]))  # crosses +pi
    sm = tracker.smooth_yaw(xref, jnp.asarray(2.9))
    d = np.diff(np.asarray(sm[2]))
    assert np.all(np.abs(d) < np.pi / 2)
    np.testing.assert_allclose(np.sin(np.asarray(sm[2])),
                               np.sin(np.asarray(xref[2])), atol=1e-12)


def _straight_traj(length=2.0, vel=0.4):
    N = 4
    dur = length / vel
    xs = np.linspace(0.0, length, N + 1)
    inner = jnp.asarray(np.stack([xs[1:-1], np.zeros(N - 1)], axis=1))
    ts = jnp.full((N,), dur / N)
    head = jnp.asarray([[0.0, 0.0], [vel, 0.0], [0.0, 0.0]])
    tail = jnp.asarray([[length, 0.0], [vel, 0.0], [0.0, 0.0]])
    c_xy = minco.generate(inner, ts, head, tail)
    c_yaw = minco.generate(jnp.zeros((N - 1, 1)), ts, jnp.zeros((3, 1)),
                           jnp.zeros((3, 1)))
    return SE2Traj(c_xy, ts, c_yaw, ts)


@pytest.mark.parametrize("model_type", [tracker.DIFF, tracker.ACKER])
def test_closed_loop_tracking(model_type):
    """Closed-loop: the MPC must track a straight MINCO trajectory with
    small error from a perturbed start (test_mpc-mode analog)."""
    cfg = dataclasses.replace(CFG, model_type=model_type, qp_max_iter=1500)
    traj = _straight_traj()
    start = jnp.asarray([0.0, 0.05, 0.1])  # offset + heading error

    run = jax.jit(lambda: rollout.track_trajectory(
        traj, start, cfg, n_steps=150, max_sqp_iter=2))
    res = run()
    errs = np.asarray(res.errs)
    # converges onto the line and stays there
    assert errs[-1] < 0.03, f"final err {errs[-1]}"
    assert float(res.mean_err) < 0.06, f"mean err {float(res.mean_err)}"
    # commands respect the box bounds
    cmds = np.asarray(res.cmds)
    assert np.all(cmds[:, 0] <= cfg.max_speed + 1e-6)
    assert np.all(cmds[:, 0] >= cfg.min_speed - 1e-6)


def test_at_goal_zeroes_command():
    cfg = dataclasses.replace(CFG, qp_max_iter=1000)
    traj = _straight_traj(length=0.4)
    start = jnp.asarray([0.4, 0.0, 0.0])
    run = jax.jit(lambda: rollout.track_trajectory(
        traj, start, cfg, n_steps=260, max_sqp_iter=1))
    res = run()
    ag = np.asarray(res.at_goal)
    assert ag[-1], "should reach at_goal after duration + 1s"
    np.testing.assert_allclose(np.asarray(res.cmds)[ag], 0.0, atol=1e-12)


def test_ackermann_wheel_mapping():
    """Wheel mapping geometry (cmdvel2gazebo.py:96-135): inner wheel slower
    and steered sharper; straight line -> equal speeds, zero steer."""
    from uneven_planner_tpu.sim import ackermann as ak

    wc = ak.wheel_commands(jnp.asarray(0.02), jnp.asarray(0.3),
                           jnp.asarray(False))
    # left turn (positive steer): left is the inside wheel
    assert float(wc.rear_left) < float(wc.rear_right)
    assert float(wc.steer_left) > float(wc.steer_right) > 0
    # straight
    wc0 = ak.wheel_commands(jnp.asarray(0.02), jnp.asarray(0.0),
                            jnp.asarray(False))
    np.testing.assert_allclose(float(wc0.rear_left), float(wc0.rear_right))
    assert float(wc0.steer_left) == 0.0
    # dead-man zeroes everything
    wcs = ak.wheel_commands(jnp.asarray(0.02), jnp.asarray(0.3),
                            jnp.asarray(True))
    assert float(wcs.rear_left) == 0.0 and float(wcs.steer_left) == 0.0
    # rear-axle pose offset (true_state_pub.py:49-53)
    pose = ak.rear_axle_pose(jnp.asarray([1.0, 2.0, 0.0]))
    np.testing.assert_allclose(np.asarray(pose), [0.87, 2.0, 0.0], atol=1e-12)


# ------------------- golden control-sequence parity (BASELINE gate) ---------

def test_mpc_golden_control_sequence_parity_f64():
    """BASELINE config-2 acceptance gate: the production (f32) ADMM MPC path
    must reproduce the tracking QP's exact optimum to <1e-3 max
    control-sequence error, per tick, over a tracking episode at reference
    settings (T=30, dt=0.02, Acker bounds from run_hill.yaml:64-83).

    Golden values come from `utils.qp_ref.solve_qp_f64`, an f64 dense
    active-set solve certified by explicit KKT residuals (~1e-9) — the
    unique optimum OSQP approximates at its 1e-6 tolerance
    (mpc.cpp:513-542, :556-795).  The f64 mirror replays the same
    relinearization loop (same du/max-iter stopping rule, getCmd
    mpc.cpp:797-841) with the certified QP solutions."""
    from uneven_planner_tpu.mpc import traj_msg
    from uneven_planner_tpu.utils import qp_ref

    cfg = MPCConfig()  # reference defaults == run_hill.yaml mpc block
    traj = traj_msg.figure_eight(max_vel=0.4)
    T, d = cfg.predict_steps, cfg.delay_num
    H = T - d
    dimx = 3 * H
    max_sqp = 3

    step_f32 = jax.jit(
        lambda st, xr, dr, op, ob: tracker.mpc_step(
            st, xr, dr, op, ob, cfg, max_sqp_iter=max_sqp))

    def mirror_f64(state, xref, dref, output_prev):
        """Relinearization loop with certified f64 QP solves."""
        out = np.asarray(output_prev, np.float64)
        for _ in range(max_sqp):
            xbar = np.asarray(tracker.predict_motion(
                jnp.asarray(state, jnp.float64),
                jnp.asarray(out, jnp.float64), cfg))
            P, q, A, l, u = [np.asarray(a, np.float64)
                             for a in tracker.assemble_qp(
                                 jnp.asarray(xbar), jnp.asarray(out),
                                 jnp.asarray(xref, jnp.float64),
                                 jnp.asarray(dref, jnp.float64), cfg)]
            z, _ = qp_ref.solve_qp_f64(P, q, A, l, u)
            un = z[dimx:].reshape(H, 2).T
            new = out.copy()
            new[:, d:] = un
            du = np.sum(np.abs(new - out))
            out = new
            if du <= cfg.du_threshold:
                break
        return out

    # start slightly off the trajectory so the QP works (nonzero error)
    from uneven_planner_tpu.minco.traj import se2_state
    p0, _, _, yaw0, _, _ = [np.asarray(v)
                            for v in se2_state(traj, jnp.asarray(0.0))]
    state = np.array([p0[0] + 0.05, p0[1] - 0.03, yaw0 + 0.1], np.float64)
    output = np.zeros((2, T), np.float64)
    buff = np.zeros((max(d, 1), 2), np.float64)

    worst = 0.0
    t_now = 0.0
    for _ in range(20):
        refs, _ = tracker.get_ref_points(traj, jnp.asarray(t_now), cfg)
        refs = tracker.smooth_yaw(refs, jnp.asarray(state[2]))
        refs = np.asarray(refs, np.float64)
        dref = np.zeros_like(refs[:2])

        res = step_f32(jnp.asarray(state, jnp.float32),
                       jnp.asarray(refs, jnp.float32),
                       jnp.asarray(dref, jnp.float32),
                       jnp.asarray(output, jnp.float32),
                       jnp.asarray(buff, jnp.float32))
        u_f32 = np.asarray(res.output, np.float64)
        u_gold = mirror_f64(state, refs, dref, output)
        worst = max(worst, np.abs(u_f32 - u_gold).max())

        # advance the plant with the production command (both mirrors see
        # identical inputs each tick, so per-tick parity is what's tested)
        state = np.asarray(rollout.plant_step(
            jnp.asarray(state), jnp.asarray(u_gold[:, d]), cfg, 0.01),
            np.float64)
        output = u_gold
        t_now += 0.01

    assert worst < 1e-3, f"max control-sequence error {worst:.2e}"


def test_condensed_qp_matches_full_qp_f64():
    """The inputs-only condensed QP (assemble_qp_condensed) must have the
    SAME unique input optimum u* as the full state+input QP — the state
    elimination is exact because the reference QP has no state bounds
    (mpc.cpp:387-511).  Solved with the certified f64 active-set oracle on
    both forms at random linearization points."""
    from uneven_planner_tpu.utils import qp_ref

    rng = np.random.default_rng(7)
    for model in (tracker.DIFF, tracker.ACKER):
        cfg = dataclasses.replace(MPCConfig(), model_type=model,
                                  predict_steps=12)
        T, d = cfg.predict_steps, cfg.delay_num
        H = T - d
        dimx = 3 * H
        for _ in range(3):
            # realistic tick data: smooth arc reference, small perturbed
            # inputs (fully random QPs can defeat the active-set oracle's
            # certification; production-shaped ones are what parity is for)
            curv = rng.uniform(-0.8, 0.8)
            v0 = rng.uniform(0.2, 0.5)
            ts = np.arange(T) * cfg.dt
            yawr = curv * v0 * ts
            xr = np.cumsum(v0 * cfg.dt * np.cos(yawr))
            yr = np.cumsum(v0 * cfg.dt * np.sin(yawr))
            state = jnp.asarray(
                [xr[0] + rng.normal() * 0.03, yr[0] + rng.normal() * 0.03,
                 yawr[0] + rng.normal() * 0.05], jnp.float64)
            output = jnp.asarray(np.stack([
                np.full(T, v0) + rng.normal(size=T) * 0.02,
                np.full(T, curv * 0.1) + rng.normal(size=T) * 0.02]),
                jnp.float64)
            xref = jnp.asarray(np.stack([xr, yr, yawr]), jnp.float64)
            dref = jnp.zeros_like(xref[:2])
            xbar = tracker.predict_motion(state, output, cfg)
            full = [np.asarray(a, np.float64) for a in
                    tracker.assemble_qp(xbar, output, xref, dref, cfg)]
            cond = [np.asarray(a, np.float64) for a in
                    tracker.assemble_qp_condensed(xbar, output, xref, dref,
                                                  cfg)]
            z_full, _ = qp_ref.solve_qp_f64(*full)
            u_cond, _ = qp_ref.solve_qp_f64(*cond)
            np.testing.assert_allclose(u_cond, z_full[dimx:],
                                       rtol=1e-6, atol=1e-8)


def test_pure_jax_cholesky_matches_lapack():
    """_chol_upper_jax (the TPU path that avoids the crashing batched
    Cholesky custom-call) must match LAPACK's factor."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from uneven_planner_tpu.solver import admm_qp

    rng = np.random.default_rng(0)
    for n in (5, 31, 150):
        A1 = rng.normal(size=(n, n)).astype(np.float64)
        M = A1 @ A1.T + n * np.eye(n)
        U = np.asarray(jax.jit(admm_qp._chol_upper_jax)(jnp.asarray(M)))
        np.testing.assert_allclose(U.T @ U, M, rtol=1e-10, atol=1e-8)
        assert np.allclose(U, np.triu(U))
    # batched under vmap
    Ms = np.stack([a @ a.T + 10 * np.eye(12)
                   for a in rng.normal(size=(4, 12, 12))])
    Us = np.asarray(jax.jit(jax.vmap(admm_qp._chol_upper_jax))(
        jnp.asarray(Ms)))
    for M, U in zip(Ms, Us):
        np.testing.assert_allclose(U.T @ U, M, rtol=1e-10, atol=1e-8)


def test_teleop_state_machine_and_world_tf():
    """Teleop key-state semantics (keyboard_control.py:30-84) and the
    world->base_footprint transform (world_tf_pub.py:1-30 equivalent)."""
    from uneven_planner_tpu.sim import ackermann as ak
    from uneven_planner_tpu.sim import teleop

    s = teleop.TeleopState()
    assert teleop.command(s) is None           # nothing held -> no publish
    s = teleop.key_down(s, "w")
    assert teleop.command(s) == (1.0, 0.0)     # bang-bang forward
    s = teleop.key_down(s, "a")
    assert teleop.command(s) == (1.0, 0.5)
    s = teleop.key_down(s, "s")                # opposite cancels forward
    assert s.down and not s.up
    assert teleop.command(s) == (-1.0, 0.5)
    s = teleop.key_down(s, "d")
    assert s.right and not s.left
    assert teleop.command(s) == (-1.0, -0.5)
    s = teleop.key_up(s, "s")
    s = teleop.key_up(s, "d")
    assert teleop.command(s) is None

    # world_tf: quaternion round-trips the terrain-lift rotation
    from uneven_planner_tpu.config import MapConfig
    from uneven_planner_tpu.terrain.grid import se3_lift
    from uneven_planner_tpu.terrain.synthetic import make_synthetic_grid
    grid = make_synthetic_grid(MapConfig(xy_resolution=0.25,
                                         yaw_resolution=0.6))
    pose = jnp.asarray([0.7, -0.4, 0.9])
    p, q = ak.world_tf(grid, pose)
    R, p_ref = se3_lift(grid, pose)
    np.testing.assert_allclose(np.asarray(p), np.asarray(p_ref), atol=1e-6)
    x, y, z, w = [float(v) for v in q]
    Rq = np.array([
        [1 - 2*(y*y + z*z), 2*(x*y - z*w), 2*(x*z + y*w)],
        [2*(x*y + z*w), 1 - 2*(x*x + z*z), 2*(y*z - x*w)],
        [2*(x*z - y*w), 2*(y*z + x*w), 1 - 2*(x*x + y*y)],
    ])
    np.testing.assert_allclose(Rq, np.asarray(R), atol=1e-5)


def test_mpc_step_keeps_previous_output_on_solver_failure():
    """A non-finite QP solution (e.g. a failed KKT factorization) must not
    poison the carried output: mpc_step falls back to the previous tick's
    inputs — the reference's OSQP-failure behavior (mpc.cpp:526-539)."""
    cfg = MPCConfig()
    T, d = cfg.predict_steps, cfg.delay_num
    prev = jnp.asarray(np.tile([[0.3], [0.1]], (1, T)), jnp.float32)
    buff = jnp.zeros((max(d, 1), 2), jnp.float32)
    state = jnp.asarray([0.0, 0.0, 0.0], jnp.float32)
    refs_bad = jnp.full((3, T), jnp.nan, jnp.float32)  # poisons q -> sol.x
    dref = jnp.zeros((2, T), jnp.float32)
    res = jax.jit(lambda: tracker.mpc_step(state, refs_bad, dref, prev,
                                           buff, cfg, max_sqp_iter=1))()
    out = np.asarray(res.output)
    assert np.isfinite(out).all(), "output must stay finite on QP failure"
    np.testing.assert_allclose(out[:, d:], np.asarray(prev)[:, d:],
                               atol=0.0)
    np.testing.assert_allclose(np.asarray(res.cmd),
                               np.asarray(prev)[:, d], atol=0.0)
