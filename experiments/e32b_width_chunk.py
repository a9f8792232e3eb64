"""e32b: the w4096 inflation is a LONG-CHUNK compile artifact (e32: 16-step
chunks are bitwise width-identical through 192 steps, while c128 programs
at w4096 inflate evals 1.23x).  Pin the divergent chunk length and test
whether w4096 with short chunks is now inflation-free AND faster than two
w2048 dispatches."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
exec(open(os.path.join(os.path.dirname(__file__),
                       "e32_width_repro.py")).read().split(
    "# ---- part 1")[0])

# part A: bitwise divergence with c128 programs
import dataclasses
p = alm.lbfgs_params_from(cfg.alm)
p = dataclasses.replace(p, **OVR)
scal = jax.jit(lambda xs_, bs_, g: jax.vmap(
    lambda x, b: alm._make_scaling(x, b, shape, g, cfg.alm))(xs_, bs_))
init = jax.jit(jax.vmap(lambda x: alm.flat_init(x, shape, cfg.alm, p)))
run128 = jax.jit(lambda st, bd, sc, g: jax.vmap(
    lambda s_, b_, c_: alm.flat_run(s_, b_, c_, shape, g, cfg.alm, p,
                                    128))(st, bd, sc))
sc_all = scal(xs, bs, grid)
sub = lambda t: jax.tree.map(lambda a: a[:512], t)
st_w = init(xs)
st_n = init(xs[:512])
bs_n, sc_n = sub(bs), sub(sc_all)
for chunk in range(3):
    st_w = run128(st_w, bs, sc_all, grid)
    st_n = run128(st_n, bs_n, sc_n, grid)
    a = np.asarray(sub(st_w).x); b = np.asarray(st_n.x)
    neq = int(np.any(~((a == b) | (np.isnan(a) & np.isnan(b))),
                     axis=1).sum())
    ae = np.asarray(sub(st_w).evals); be = np.asarray(st_n.evals)
    print(f"c128 chunk {chunk}: x differs on {neq}/512 lanes; "
          f"evals differ on {int((ae != be).sum())}", flush=True)

# part B: w4096 solves with short chunks — inflation + wall
for cs in (16, 32, 64):
    t0 = time.time()
    res = alm.solve_flat_compacted(xs, bs, shape, grid, cfg.alm,
                                   lbfgs_overrides=OVR, chunk_steps=cs,
                                   buckets=(1, 4, 16), max_dispatch=4096,
                                   retry_width=None)
    dt = time.time() - t0
    ev = np.asarray(res.evals)
    conv = np.asarray(res.converged)
    print(f"W=4096 c{cs:3d} wall={dt:6.1f}s conv={conv.mean()*100:5.1f}% "
          f"evals mean={ev.mean():6.1f} (w512 reference: 197.6)",
          flush=True)
