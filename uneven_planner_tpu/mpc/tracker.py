"""Iterative-linearization tracking MPC with a batched ADMM QP.

TPU-native re-design of the reference MPC controller (reference:
src/uneven_planner/mpc_controller/src/mpc.cpp).  Same condensed QP:
variables z = [states x_1..x_H ; inputs u_0..u_{H-1}] (H = predict_steps -
delay_num), quadratic tracking cost (mpc.cpp:335-385), linearized dynamics
equalities (:387-447), input-rate inequalities (:449-472), input box bounds
(:474-511) — but assembled densely as one jit-traced program and solved by
the batched ADMM QP (solver/admm_qp.py) instead of per-tick OSQP setup.

The relinearization loop (getCmd, mpc.cpp:797-841) runs under
`lax.while_loop` with the du threshold; the wall-clock budget of the
reference becomes an iteration cap.  Supports DIFF and ACKER models
(getLinearModel, mpc.cpp:194-229) and input-delay compensation via the
output buffer (mpc.cpp:544-553,835-839).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from uneven_planner_tpu.config import MPCConfig
from uneven_planner_tpu.minco.traj import SE2Traj, se2_state
from uneven_planner_tpu.solver import admm_qp

DIFF = 1
ACKER = 2


# ---------------------------------------------------------------------------
# Model (mpc.cpp:194-246)
# ---------------------------------------------------------------------------

def linearize(theta, vx, delta, cfg: MPCConfig):
    """A, B, C of x+ = A x + B u + C about (theta, vx, delta)."""
    dt = cfg.dt
    ct, st = jnp.cos(theta), jnp.sin(theta)
    if cfg.model_type == DIFF:
        B = jnp.array([[ct * dt, 0.0], [st * dt, 0.0], [0.0, dt]])
    else:
        td = jnp.tan(delta)
        cd2 = jnp.cos(delta) ** 2
        B = jnp.array([
            [ct * dt, 0.0],
            [st * dt, 0.0],
            [dt * td / cfg.wheel_base,
             dt * vx / (cfg.wheel_base * cd2)],
        ])
    # eye dtype must follow the inputs: under jax_enable_x64 a default f64
    # eye would silently promote A (and the dynamics rows assembled from
    # it) above an f32 QP's dtype, tripping scatter dtype-promotion errors
    A = jnp.eye(3, dtype=B.dtype).at[0, 2].set(-B[1, 0] * vx) \
        .at[1, 2].set(B[0, 0] * vx)
    C = jnp.array([-A[0, 2] * theta, -A[1, 2] * theta,
                   (-B[2, 1] * delta) if cfg.model_type == ACKER else 0.0])
    return A, B, C


def state_trans(state, u, cfg: MPCConfig):
    """Clipped nonlinear forward step (stateTrans, mpc.cpp:231-246)."""
    vx = jnp.clip(u[0], cfg.min_speed, cfg.max_speed)
    if cfg.model_type == DIFF:
        w = jnp.clip(u[1], -cfg.max_omega, cfg.max_omega)
        dtheta = w * cfg.dt
    else:
        delta = jnp.clip(u[1], -cfg.max_steer, cfg.max_steer)
        dtheta = vx / cfg.wheel_base * jnp.tan(delta) * cfg.dt
    return jnp.array([
        state[0] + vx * jnp.cos(state[2]) * cfg.dt,
        state[1] + vx * jnp.sin(state[2]) * cfg.dt,
        state[2] + dtheta,
    ])


def predict_motion(now_state, output, cfg: MPCConfig):
    """Nonlinear rollout with the current output sequence
    (predictMotion, mpc.cpp:248-260).  output: [2, T] -> states [T+1, 3]."""
    def step(s, u):
        s1 = state_trans(s, u, cfg)
        return s1, s1
    _, states = jax.lax.scan(step, now_state, output.T)
    return jnp.concatenate([now_state[None, :], states], axis=0)


# ---------------------------------------------------------------------------
# Condensed QP assembly (mpc.cpp:322-511 / 556-752)
# ---------------------------------------------------------------------------

def assemble_qp(xbar, output, xref, dref, cfg: MPCConfig):
    """Dense (P, q, A, l, u) for the reference QP at linearization points
    xbar (states [T+1,3]) / output (inputs [2,T]).

    Variable layout: [x_1..x_H (3H), u_0..u_{H-1} (2H)]; the reference's
    'states' are x_{delay+1}.. and inputs u_{delay}.., matching its
    delay-shifted indexing.
    """
    T, d = cfg.predict_steps, cfg.delay_num
    H = T - d
    dimx, dimu = 3 * H, 2 * H
    nx = dimx + dimu
    Q, R, Rd = cfg.matrix_q, cfg.matrix_r, cfg.matrix_rd
    dtype = xbar.dtype

    # ---- Hessian (mpc.cpp:344-385): diagonal + u_k/u_{k+1} couplings
    diag = np.zeros(nx)
    diag[0:dimx:3] = 2 * Q[0]
    diag[1:dimx:3] = 2 * Q[1]
    diag[2:dimx:3] = 2 * Q[2]
    # input diagonal; note the reference adds Q[2] to the v-input weight
    # (its dref velocity-tracking term, mpc.cpp:363-369)
    diag[dimx:nx:2] = 2 * (R[0] + 2 * Rd[0] + Q[2])
    diag[dimx + 1:nx:2] = 2 * (R[1] + 2 * Rd[1])
    diag[dimx] = diag[nx - 2] = 2 * (R[0] + Rd[0] + Q[2])
    diag[dimx + 1] = diag[nx - 1] = 2 * (R[1] + Rd[1])
    P = jnp.asarray(np.diag(diag), dtype)
    off_r = np.arange(dimx + 2, nx)
    off_c = off_r - 2
    off_v = np.where((off_r - dimx) % 2 == 0, -2 * Rd[0], -2 * Rd[1])
    P = P.at[off_r, off_c].set(jnp.asarray(off_v, dtype))
    P = P.at[off_c, off_r].set(jnp.asarray(off_v, dtype))

    # ---- gradient (mpc.cpp:335-341)
    q = jnp.zeros((nx,), dtype)
    q = q.at[0:dimx:3].set(-2 * Q[0] * xref[0, d:])
    q = q.at[1:dimx:3].set(-2 * Q[1] * xref[1, d:])
    q = q.at[2:dimx:3].set(-2 * Q[2] * xref[2, d:])
    q = q.at[dimx:nx:2].set(-2 * Q[2] * dref[0, d:])

    # ---- linearizations at xbar[j+d]
    js = jnp.arange(H) + d
    thetas = xbar[js, 2]
    vxs = output[0, js]
    deltas = output[1, js]
    As, Bs, Cs = jax.vmap(lambda th, v, de: linearize(th, v, de, cfg))(
        thetas, vxs, deltas)

    mx, my, mz = dimu, dimx, 2 * H - 2
    nc = mx + my + mz
    Amat = jnp.zeros((nc, nx), dtype)
    l = jnp.zeros((nc,), dtype)
    u = jnp.zeros((nc,), dtype)

    # input box rows (mpc.cpp:474-488)
    r = np.arange(0, mx, 2)
    Amat = Amat.at[r, dimx + r].set(1.0)
    Amat = Amat.at[r + 1, dimx + r + 1].set(1.0)
    l = l.at[r].set(cfg.min_speed)
    u = u.at[r].set(cfg.max_speed)
    in_hi = cfg.max_omega if cfg.model_type == DIFF else cfg.max_steer
    l = l.at[r + 1].set(-in_hi)
    u = u.at[r + 1].set(in_hi)

    # dynamics equality rows (mpc.cpp:387-447): x_{j+1} - A_j x_j - B_j u_j
    # = C_j (x_0 term moves to the rhs for j=0)
    rows = mx + np.arange(my)
    Amat = Amat.at[rows, np.arange(my)].set(1.0)  # identity on x_{j+1}
    b0 = As[0] @ xbar[d] + Cs[0]
    bvec = jnp.concatenate([b0, Cs[1:].reshape(-1)])
    l = l.at[rows].set(bvec)
    u = u.at[rows].set(bvec)
    for j in range(H):
        r0 = mx + 3 * j
        cu = dimx + 2 * j
        Amat = Amat.at[r0 + 0, cu].set(-Bs[j, 0, 0])
        Amat = Amat.at[r0 + 1, cu].set(-Bs[j, 1, 0])
        if cfg.model_type == ACKER:
            Amat = Amat.at[r0 + 2, cu].set(-Bs[j, 2, 0])
        Amat = Amat.at[r0 + 2, cu + 1].set(-Bs[j, 2, 1])
        if j >= 1:
            cx = 3 * (j - 1)
            Amat = Amat.at[r0 + 0, cx + 0].set(-1.0)
            Amat = Amat.at[r0 + 1, cx + 1].set(-1.0)
            Amat = Amat.at[r0 + 2, cx + 2].set(-1.0)
            Amat = Amat.at[r0 + 0, cx + 2].set(-As[j, 0, 2])
            Amat = Amat.at[r0 + 1, cx + 2].set(-As[j, 1, 2])

    # input-rate rows (mpc.cpp:449-472,505-511)
    rr = mx + my + np.arange(0, mz, 2)
    k = np.arange(mz // 2)
    Amat = Amat.at[rr, dimx + 2 * k].set(-1.0)
    Amat = Amat.at[rr, dimx + 2 * k + 2].set(1.0)
    Amat = Amat.at[rr + 1, dimx + 2 * k + 1].set(-1.0)
    Amat = Amat.at[rr + 1, dimx + 2 * k + 3].set(1.0)
    rate_hi = cfg.max_comega if cfg.model_type == DIFF else cfg.max_csteer
    l = l.at[rr].set(-cfg.max_cv)
    u = u.at[rr].set(cfg.max_cv)
    l = l.at[rr + 1].set(-rate_hi)
    u = u.at[rr + 1].set(rate_hi)

    return P, q, Amat, l, u


def _input_block(cfg: MPCConfig, H: int, dref, dtype):
    """Input-only Hessian block Pu [2H, 2H] and gradient qu [2H] — the
    u-rows of the reference Hessian (mpc.cpp:344-385): R + Rd
    difference-chain couplings, with Q[2] added to the v weight for the
    dref velocity-tracking term (mpc.cpp:363-369)."""
    d = cfg.delay_num
    Q, R, Rd = cfg.matrix_q, cfg.matrix_r, cfg.matrix_rd
    dimu = 2 * H
    diag = np.zeros(dimu)
    diag[0::2] = 2 * (R[0] + 2 * Rd[0] + Q[2])
    diag[1::2] = 2 * (R[1] + 2 * Rd[1])
    diag[0] = diag[dimu - 2] = 2 * (R[0] + Rd[0] + Q[2])
    diag[1] = diag[dimu - 1] = 2 * (R[1] + Rd[1])
    Pu = np.diag(diag)
    off_r = np.arange(2, dimu)
    off_v = np.where(off_r % 2 == 0, -2 * Rd[0], -2 * Rd[1])
    Pu[off_r, off_r - 2] = off_v
    Pu[off_r - 2, off_r] = off_v
    qu = jnp.zeros((dimu,), dtype).at[0::2].set(-2 * Q[2] * dref[0, d:])
    return jnp.asarray(Pu, dtype), qu


def assemble_qp_condensed(xbar, output, xref, dref, cfg: MPCConfig):
    """Inputs-only condensed QP — exact elimination of the state variables.

    The reference QP (mpc.cpp:322-511) has NO state bounds: states appear
    only in the quadratic tracking cost and the linearized dynamics
    equalities.  Substituting x = F u + w (the linear dynamics response)
    eliminates them exactly, leaving n = 2H variables and
    nc = 2H + (2H - 2) input box + input-rate rows — the same unique u*
    as the full QP at ~15x cheaper KKT factorizations and ~6x cheaper
    ADMM matvecs (the [n, n] SPD inverse is the dominant per-tick cost
    on this TPU, see admm_qp._spd_inverse).

      x_{k+1} = A_k x_k + B_k u_k + C_k,  x_0 = xbar[d]
      => P~ = F' Px F + Pu,  q~ = F' (Px w + qx) + qu
    """
    T, d = cfg.predict_steps, cfg.delay_num
    H = T - d
    dimu = 2 * H
    Q = cfg.matrix_q
    dtype = xbar.dtype

    js = jnp.arange(H) + d
    As, Bs, Cs = jax.vmap(lambda th, v, de: linearize(th, v, de, cfg))(
        xbar[js, 2], output[0, js], output[1, js])

    # free response w_k (k=1..H) and input response F [H, 3, 2H]
    ucols = jnp.arange(dimu)

    def prop(carry, inp):
        wk, Fk = carry
        A, B, C, k = inp
        sel = ((ucols[None, :] // 2) == k).astype(dtype)       # [1, 2H]
        sel2 = jnp.stack([sel[0] * (ucols % 2 == 0),
                          sel[0] * (ucols % 2 == 1)]).astype(dtype)
        w1 = A @ wk + C
        F1 = A @ Fk + B @ sel2
        return (w1, F1), (w1, F1)

    init = (xbar[d].astype(dtype), jnp.zeros((3, dimu), dtype))
    _, (ws, Fs) = jax.lax.scan(
        prop, init, (As, Bs, Cs, jnp.arange(H)))
    w = ws.reshape(-1)                  # [3H]
    F = Fs.reshape(3 * H, dimu)         # [3H, 2H]

    Px = jnp.tile(jnp.asarray([2 * Q[0], 2 * Q[1], 2 * Q[2]], dtype), H)
    qx = (-2 * jnp.asarray(Q, dtype)[:, None] * xref[:, d:]).T.reshape(-1)

    Pu, qu = _input_block(cfg, H, dref, dtype)
    PxF = Px[:, None] * F
    P = jnp.matmul(F.T, PxF, precision=jax.lax.Precision.HIGHEST) + Pu
    q = F.T @ (Px * w + qx) + qu

    # constraints: input box + input-rate rows (mpc.cpp:449-511)
    mz = dimu - 2
    nc = dimu + mz
    Amat = jnp.zeros((nc, dimu), dtype)
    l = jnp.zeros((nc,), dtype)
    u = jnp.zeros((nc,), dtype)
    r = np.arange(0, dimu, 2)
    Amat = Amat.at[np.arange(dimu), np.arange(dimu)].set(1.0)
    l = l.at[r].set(cfg.min_speed)
    u = u.at[r].set(cfg.max_speed)
    in_hi = cfg.max_omega if cfg.model_type == DIFF else cfg.max_steer
    l = l.at[r + 1].set(-in_hi)
    u = u.at[r + 1].set(in_hi)
    rr = dimu + np.arange(0, mz, 2)
    k = np.arange(mz // 2)
    Amat = Amat.at[rr, 2 * k].set(-1.0)
    Amat = Amat.at[rr, 2 * k + 2].set(1.0)
    Amat = Amat.at[rr + 1, 2 * k + 1].set(-1.0)
    Amat = Amat.at[rr + 1, 2 * k + 3].set(1.0)
    rate_hi = cfg.max_comega if cfg.model_type == DIFF else cfg.max_csteer
    l = l.at[rr].set(-cfg.max_cv)
    u = u.at[rr].set(cfg.max_cv)
    l = l.at[rr + 1].set(-rate_hi)
    u = u.at[rr + 1].set(rate_hi)
    return P, q, Amat, l, u


# ---------------------------------------------------------------------------
# Relinearization loop (getCmd, mpc.cpp:797-841)
# ---------------------------------------------------------------------------

class MPCStepResult(NamedTuple):
    cmd: jax.Array           # [2] (v, omega-or-steer)
    output: jax.Array        # [2, T] full planned input sequence
    output_buff: jax.Array   # [max(delay,1), 2] rotated delay buffer
    qp_iters: jax.Array
    sqp_iters: jax.Array
    du: jax.Array


def mpc_step(now_state, xref, dref, output_prev, output_buff,
             cfg: MPCConfig, max_sqp_iter: int | None = None
             ) -> MPCStepResult:
    """One control tick: relinearize/solve until du < du_threshold."""
    T, d = cfg.predict_steps, cfg.delay_num
    H = T - d
    dimx = 3 * H
    max_sqp = max_sqp_iter if max_sqp_iter is not None else cfg.max_iter

    def qp_pass(output, y_prev):
        xbar = predict_motion(now_state, output, cfg)
        if cfg.qp_condense:
            P, q, A, l, u = assemble_qp_condensed(xbar, output, xref, dref,
                                                  cfg)
            # warm start: previous inputs (primal), dual carried across
            # relinearizations — the OSQP warm-start of mpc.cpp:518
            x_ws = output[:, d:].T.reshape(-1)
        else:
            P, q, A, l, u = assemble_qp(xbar, output, xref, dref, cfg)
            # primal from the nonlinear rollout (near-feasible for the
            # dynamics rows) + previous inputs
            x_ws = jnp.concatenate([xbar[d + 1:].reshape(-1),
                                    output[:, d:].T.reshape(-1)])
        sol = admm_qp.solve_qp(
            P, q, A, l, u, rho=cfg.qp_rho, sigma=cfg.qp_sigma,
            alpha=cfg.qp_alpha, eps_abs=cfg.qp_abs_tol,
            eps_rel=cfg.qp_rel_tol, max_iter=cfg.qp_max_iter,
            x0=x_ws, y0=y_prev, polish=cfg.qp_polish,
            adaptive_rho=cfg.qp_adaptive_rho,
            fixed_iters=cfg.qp_scan_iters)
        xu = sol.x if cfg.qp_condense else sol.x[dimx:]
        un = xu.reshape(H, 2).T                    # [2, H]
        # solver-failure recovery (reference: an OSQP failure silently
        # keeps the previous output, mpc.cpp:526-539): a non-finite QP
        # solution — e.g. a numerically indefinite KKT factorization,
        # which the pure-JAX Cholesky deliberately surfaces as NaN
        # (admm_qp._chol_upper_jax) — must not poison the carried output
        ok = jnp.all(jnp.isfinite(un))
        un = jnp.where(ok, un, output[:, d:])
        y_out = jnp.where(ok, sol.y, y_prev)
        out = output
        if d > 0:
            out = out.at[:, :d].set(output_buff[:d].T)
        out = out.at[:, d:].set(un)
        return out, sol.iters, y_out

    nc = (4 * H - 2) if cfg.qp_condense else (2 * H + dimx + 2 * H - 2)

    class S(NamedTuple):
        output: jax.Array
        y: jax.Array
        it: jax.Array
        qp_iters: jax.Array
        du: jax.Array
        done: jax.Array

    def cond(s: S):
        return ~s.done

    def body(s: S):
        out, qpi, y = qp_pass(s.output, s.y)
        du = jnp.sum(jnp.abs(out - s.output))
        it = s.it + 1
        return S(output=out, y=y, it=it, qp_iters=s.qp_iters + qpi, du=du,
                 done=(du <= cfg.du_threshold) | (it >= max_sqp))

    init = S(output=output_prev, y=jnp.zeros((nc,), now_state.dtype),
             it=jnp.asarray(0, jnp.int32),
             qp_iters=jnp.asarray(0, jnp.int32),
             du=jnp.asarray(jnp.inf, now_state.dtype),
             done=jnp.asarray(False))
    if max_sqp <= 8:
        # Unroll small relinearization loops at trace time (masked, so the
        # du_threshold early exit keeps its semantics).  Not an
        # optimization: on this TPU platform a batched linalg custom-call
        # nested under TWO while_loop levels (sqp while around the ADMM
        # while) miscompiles and CRASHES the TPU worker at batch >= ~256
        # (kernel fault; isolated round 4 — single-level nesting at the
        # same sizes is fine).  Unrolling removes the outer level.  The
        # reference's 150-iteration cap (mpc.cpp:797-841) keeps the
        # while_loop path; production callers pass max_sqp_iter=3.
        out = init
        for _ in range(max_sqp):
            nxt = body(out)
            out = jax.tree.map(
                lambda new, old: jnp.where(out.done, old, new), nxt, out)
    else:
        out = jax.lax.while_loop(cond, body, init)

    cmd = out.output[:, d]
    if d > 0:
        new_buff = jnp.concatenate(
            [output_buff[1:d], cmd[None, :],
             output_buff[d:]], axis=0)
    else:
        new_buff = output_buff
    return MPCStepResult(cmd=cmd, output=out.output, output_buff=new_buff,
                         qp_iters=out.qp_iters, sqp_iters=out.it, du=out.du)


# ---------------------------------------------------------------------------
# Reference sampling + yaw smoothing (TrajAnalyzer::getRefPoints,
# traj_anal.hpp:485-573; smooth_yaw, mpc.h:140-169)
# ---------------------------------------------------------------------------

def get_ref_points(traj: SE2Traj, t_now, cfg: MPCConfig):
    """[3, T] reference poses at t_now + k*dt (clamped at the goal) and the
    at_goal flag (true past duration + 1 s)."""
    T = cfg.predict_steps
    dur = traj.total_duration
    ts = jnp.minimum(t_now + jnp.arange(T, dtype=t_now.dtype) * cfg.dt, dur)

    def one(t):
        pos, _, _, yaw, _, _ = se2_state(traj, t)
        return jnp.array([pos[0], pos[1], yaw])

    refs = jax.vmap(one)(ts).T
    at_goal = t_now > dur + 1.0
    return refs, at_goal


def _wrap_towards(d):
    """Closed form of the reference's two sequential wrap loops
    (mpc.h:142-153): subtract 2pi while d >= pi/2, then add 2pi while
    d <= -pi/2."""
    two_pi = 2 * math.pi
    k = jnp.where(d >= math.pi / 2,
                  jnp.floor((d - math.pi / 2) / two_pi) + 1.0, 0.0)
    d = d - two_pi * k
    mneg = jnp.where(d <= -math.pi / 2,
                     jnp.floor((-d - math.pi / 2) / two_pi) + 1.0, 0.0)
    return d + two_pi * mneg


def smooth_yaw(xref, now_theta):
    """Unwrap the reference yaw sequence toward the current heading."""
    th0 = now_theta + _wrap_towards(xref[2, 0] - now_theta)

    def step(prev, ref):
        th = prev + _wrap_towards(ref - prev)
        return th, th

    _, rest = jax.lax.scan(step, th0, xref[2, 1:])
    return xref.at[2, :].set(jnp.concatenate([th0[None], rest]))
