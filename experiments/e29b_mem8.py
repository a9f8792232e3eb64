"""e29b: mem8 steady-state (e29's mem8 wall was compile-contaminated) and
the knn-warm x mem8 composition."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
exec(open(os.path.join(os.path.dirname(__file__),
                       "e29_warmknn.py")).read().split("# ---- pilot")[0])

px, pb, pf = make_batch(512, sort=False)
pres = alm.solve_flat_compacted(px, pb, shape, grid, cfg.alm,
                                lbfgs_overrides=OVR, chunk_steps=CS,
                                buckets=(1, 4, 16), max_dispatch=W,
                                return_duals=True)
pconv = np.asarray(pres.converged)
plam = np.asarray(pres.duals.lam)[pconv]
pmu = np.asarray(pres.duals.mu)[pconv]
prho = np.asarray(pres.duals.rho)[pconv]
pfeat = pf[pconv]
mean_warm = alm.DualState(lam=jnp.asarray(plam.mean(0)),
                          mu=jnp.asarray(pmu.mean(0)),
                          rho=jnp.asarray(float(np.median(prho)),
                                          jnp.float32))

def knn_warm(feats):
    sc = np.concatenate([np.ones(16), [0.5, 0.2]])
    d = np.linalg.norm((feats[:, None, :] - pfeat[None, :, :]) * sc,
                       axis=-1)
    nn = np.argmin(d, axis=1)
    return alm.DualState(lam=jnp.asarray(plam[nn]),
                         mu=jnp.asarray(pmu[nn]),
                         rho=jnp.asarray(prho[nn]))

# warmup mem8 programs with a throwaway batch
wx, wb, wf = make_batch(256, sort=False)
run(wx, wb, None, "mem8-compile-warmup", mem=8)

for tag, mk, mem in (("mean-warm mem8 (hot)", lambda f: mean_warm, 8),
                     ("knn-warm mem8", knn_warm, 8),
                     ("knn-warm mem16 (ctrl)", knn_warm, 16)):
    xs, bs, fs = make_batch(B)
    run(xs, bs, mk(fs), tag, mem=mem)
