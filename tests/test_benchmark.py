import dataclasses
import os

import jax.numpy as jnp
import numpy as np

from uneven_planner_tpu.bench import tracking_benchmark as tb
from uneven_planner_tpu.config import MPCConfig
from uneven_planner_tpu.minco import minco
from uneven_planner_tpu.minco.traj import SE2Traj


def _mk_traj(length=1.2, vel=0.4, N=4):
    dur = length / vel
    xs = np.linspace(0.0, length, N + 1)
    inner = jnp.asarray(np.stack([xs[1:-1], np.zeros(N - 1)], axis=1))
    ts = jnp.full((N,), dur / N)
    z = jnp.zeros((1, 2))
    head = jnp.concatenate([jnp.asarray([[0.0, 0.0]]), z, z])
    tail = jnp.concatenate([jnp.asarray([[length, 0.0]]), z, z])
    c_xy = minco.generate(inner, ts, head, tail)
    c_yaw = minco.generate(jnp.zeros((N - 1, 1)), ts, jnp.zeros((3, 1)),
                           jnp.zeros((3, 1)))
    return SE2Traj(c_xy, ts, c_yaw, ts)


def test_proposed_format_roundtrip(tmp_path):
    trajs = [_mk_traj(), _mk_traj(length=0.9)]
    path = str(tmp_path / "trajs_proposed.txt")
    tb.save_proposed_file(path, trajs)
    kind, loaded = tb.load_benchmark_file(path)
    assert kind == "proposed"
    assert len(loaded) == 2
    for orig, back in zip(trajs, loaded):
        np.testing.assert_allclose(np.asarray(back.c_xy),
                                   np.asarray(orig.c_xy), atol=1e-9)


def test_wangs_and_jians_loaders(tmp_path):
    # Wangs: one trajectory, 2 pieces, straight line x = t
    rows = []
    for _ in range(1):
        row = ["2"]
        for piece in range(2):
            row.append("1.0")  # duration
            cmat = np.zeros((3, 6))
            cmat[0, 4] = 1.0           # x = t (descending: t^5..1)
            cmat[0, 5] = float(piece)  # offset
            rows.append(None)
            row += [str(v) for v in cmat.reshape(-1)]
        rows = [" ".join(row)]
    wf = str(tmp_path / "trajs_Wangs.txt")
    open(wf, "w").write("\n".join(rows) + "\n")
    kind, ws = tb.load_benchmark_file(wf)
    assert kind == "Wangs"
    pos, vel = tb._poly3_state(ws[0], jnp.asarray(1.5))
    np.testing.assert_allclose(np.asarray(pos), [1.5, 0.0, 0.0], atol=1e-12)
    np.testing.assert_allclose(np.asarray(vel), [1.0, 0.0, 0.0], atol=1e-12)

    jf = str(tmp_path / "trajs_Jians.txt")
    pts = [(0.1 * k, 0.0, 0.0) for k in range(5)]
    open(jf, "w").write(
        "5 0.5 " + " ".join(f"{x} {y} {th}" for x, y, th in pts) + "\n")
    kind, js = tb.load_benchmark_file(jf)
    assert kind == "Jians"
    assert js[0].points.shape == (5, 3)
    refs, at_goal = tb.ref_points_for("Jians", js[0], jnp.asarray(0.6),
                                      MPCConfig())
    assert refs.shape[0] == 3
    assert not bool(at_goal)


def test_episode_loop_writes_err_file(tmp_path):
    trajs = [_mk_traj(length=0.8)]
    path = str(tmp_path / "trajs_proposed.txt")
    tb.save_proposed_file(path, trajs)
    out = str(tmp_path / "err_trajs.txt")
    cfg = dataclasses.replace(MPCConfig(), qp_max_iter=600)
    results, total = tb.run_benchmark(path, cfg, out_path=out,
                                      max_sqp_iter=1, max_steps=400)
    assert len(results) == 1
    assert results[0].mean_err < 0.05, results[0]
    lines = open(out).read().strip().splitlines()
    assert lines[-1].startswith("all_mean_track_err:")
    assert abs(float(lines[-1].split(":")[1]) - total) < 1e-9
