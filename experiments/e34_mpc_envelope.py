"""e34 (round 5): re-probe the TPU worker fault envelope for batched MPC
tracking with the CONDENSED QP.

The round-4 fault map ((8x50)/(256x8) execute, (8x150)/(256x25) crash —
PLATFORM_NOTES §13) was measured with the 150-var full QP; the condensed
QP's programs are ~15x smaller.  Each (batch x ticks) probe runs in a
SUBPROCESS (a worker kernel-fault kills the process, not the sweep).  If
the envelope grew, rollout.track_trajectory_batched's 2048 lane-tick cap
can be raised for more ticks/s.
"""
import os, subprocess, sys

HERE = os.path.dirname(os.path.abspath(__file__))

CODE = """
import sys, time
sys.path.insert(0, {root!r})
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", {root!r} + "/.jax_cache")
from uneven_planner_tpu.config import scene_config
from uneven_planner_tpu.mpc import traj_msg
from uneven_planner_tpu.sim import rollout

B, TICKS = {B}, {T}
cfg = scene_config("hill").mpc
f8 = traj_msg.figure_eight(0.4, dtype=jnp.float32)
s0 = np.zeros((B, 3), np.float32); s0[:, 2] = np.pi / 4
# single fused dispatch of exactly B x TICKS (bypass the production cap)
init = rollout._roll_init(jnp.asarray(s0[0]), cfg, jnp.float32)
init = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), init)
fn = rollout._chunk_fn(cfg, TICKS, 0.01, 2, None, False)
t0 = time.time()
s, out = fn(f8, init)
err = float(np.asarray(out[2]).mean())
print(f"OK {{B}}x{{TICKS}} wall={{time.time()-t0:.1f}}s err={{err:.4f}}",
      flush=True)
"""

root = os.path.dirname(HERE)
for B, T in ((8, 150), (256, 25), (256, 32), (64, 128), (256, 64),
             (512, 64), (256, 128)):
    code = CODE.format(root=root, B=B, T=T)
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=1500)
        lines = [ln for ln in (r.stdout + r.stderr).splitlines()
                 if ln and not ln.startswith("WARNING")]
        tag = lines[-1][:120] if lines else "(no output)"
        print(f"({B:4d} x {T:3d}) exit={r.returncode}: {tag}", flush=True)
        if r.returncode != 0:
            # first crash bounds the envelope upward; larger products
            # would also crash
            pass
    except subprocess.TimeoutExpired:
        print(f"({B:4d} x {T:3d}) TIMEOUT", flush=True)
