"""Build and cache terrain maps for all reference scenes.

The batched TPU map constructor replaces the reference's multi-minute
per-cell KD-tree sweep (uneven_map.cpp:317-417; README warns about the
wait).  Caches both the fast .npz tensor and, optionally, the reference's
CSV `.map` format for cross-checking with the reference implementation.

Usage: python examples/build_maps.py [--scenes desert forest ...]
       [--csv] [--out data/]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SCENES = ["desert", "forest", "mountain", "vocano"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", nargs="+", default=SCENES)
    ap.add_argument("--out", default="data")
    ap.add_argument("--csv", action="store_true",
                    help="also write the reference CSV .map format")
    ap.add_argument("--chunk", type=int, default=65536)
    args = ap.parse_args()

    from uneven_planner_tpu.config import scene_config
    from uneven_planner_tpu.terrain import build, io
    from uneven_planner_tpu.utils import native

    os.makedirs(args.out, exist_ok=True)
    for scene in args.scenes:
        scfg = scene_config(scene)
        t0 = time.time()
        try:
            cloud = native.pcd_load(
                os.path.join(io.REFERENCE_MAPS_DIR, f"{scene}.pcd"))
        except Exception:
            cloud = io.load_scene_cloud(scene)
        t_load = time.time() - t0
        t0 = time.time()
        grid = build.construct_map(cloud, scfg.map, chunk=args.chunk)
        t_build = time.time() - t0
        nx, ny, nyaw = grid.voxel_num
        n_fits = nx * ny * nyaw * scfg.map.iter_num
        print(f"[{scene}] {len(cloud)} pts -> {nx}x{ny}x{nyaw} grid; "
              f"load {t_load:.1f}s, {n_fits/1e6:.1f}M fits in "
              f"{t_build:.1f}s ({n_fits/max(t_build,1e-9)/1e6:.2f}M fits/s)",
              flush=True)
        data = np.asarray(grid.data)
        io.save_map_npz(os.path.join(args.out, f"{scene}.npz"), data)
        if args.csv:
            t0 = time.time()
            native.map_csv_write(
                os.path.join(args.out, f"{scene}.map"),
                np.asarray(data, np.float64))
            print(f"[{scene}] CSV cache in {time.time()-t0:.1f}s")
        occ = float(np.asarray(grid.occ).mean())
        print(f"[{scene}] occupancy fraction {occ*100:.1f}%")


if __name__ == "__main__":
    main()
