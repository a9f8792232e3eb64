"""Typed configuration for the TPU-native uneven-terrain planner.

The reference system (ZJU-FAST-Lab/uneven_planner) configures itself through
per-scene ROS YAML parameter blobs (reference:
src/uneven_planner/plan_manager/params/run_hill.yaml and siblings, loaded in
each component's init()).  Here the same ~60 tunables are first-class typed
dataclasses with per-scene presets.  Field names and defaults mirror the
reference YAML so a user of the reference can map their configs 1:1.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class MapConfig:
    """Terrain-map construction / lookup parameters.

    Mirrors reference `uneven_map` params (run_hill.yaml:2-14) and the derived
    quantities computed in UnevenMap::init (uneven_map.cpp:73-121).
    """

    iter_num: int = 2
    map_size_x: float = 10.0
    map_size_y: float = 10.0
    ellipsoid_x: float = 0.2
    ellipsoid_y: float = 0.1
    ellipsoid_z: float = 0.1
    xy_resolution: float = 0.05
    yaw_resolution: float = 0.1
    min_cnormal: float = 0.8
    max_rho: float = 0.05
    gravity: float = 9.81
    mass: float = 1.0
    # Body-x probe offset used when fitting the local plane
    # (uneven_map.cpp:342: world_pos.head(2) += xb.head(2) * 0.12).
    probe_offset: float = 0.12

    @property
    def map_size_yaw(self) -> float:
        # uneven_map.cpp:96: map_size[2] = 2π + 5e-2
        return 2.0 * math.pi + 5e-2

    @property
    def map_origin(self) -> Tuple[float, float, float]:
        return (-self.map_size_x / 2.0, -self.map_size_y / 2.0,
                -self.map_size_yaw / 2.0)

    @property
    def voxel_num(self) -> Tuple[int, int, int]:
        return (int(math.ceil(self.map_size_x / self.xy_resolution)),
                int(math.ceil(self.map_size_y / self.xy_resolution)),
                int(math.ceil(self.map_size_yaw / self.yaw_resolution)))


@dataclasses.dataclass(frozen=True)
class FrontendConfig:
    """Kinodynamic initializer parameters.

    Mirrors reference `kino_astar` params (run_hill.yaml:16-30).  The search
    itself is replaced by a batched sampling initializer, but the scoring
    weights, lattice controls, and collision interval keep the same meaning
    (kino_astar.cpp:138-195).
    """

    yaw_resolution: float = 3.15
    lambda_heu: float = 1.0
    weight_r2: float = 1.0
    weight_so2: float = 0.5
    weight_v_change: float = 0.0
    weight_delta_change: float = 0.0
    weight_sigma: float = 10.0
    time_interval: float = 0.3
    collision_interval: float = 0.06
    oneshot_range: float = 1.0
    wheel_base: float = 0.26
    max_steer: float = 0.5
    max_vel: float = 0.5
    # Batched-search sizing (new, TPU-native): number of frontier states kept
    # per wavefront round and max rounds.
    frontier_size: int = 1024
    max_rounds: int = 160
    # Dedup cell size for the parallel search; None -> min(map resolution,
    # half the per-round arc progress) so a primitive always escapes its
    # cell.
    dedup_resolution: float | None = None
    # Yaw bin width for search dedup.  The reference's 3.15 rad half-plane
    # bins cannot represent wall-following maneuvers (a heading of 0.9 and
    # pi/2 share a cell, so the better-oriented state is pruned); finer bins
    # keep the batched search complete in cluttered maps.
    dedup_yaw_resolution: float = 0.6


@dataclasses.dataclass(frozen=True)
class ALMConfig:
    """PHR-ALM + L-BFGS trajectory-optimizer parameters.

    Mirrors reference `alm_traj_opt` params (run_hill.yaml:32-55) read in
    ALMTrajOpt::init (alm_traj_opt.cpp:5-29).
    """

    rho_T: float = 100000.0
    rho_ter: float = 10.0
    max_vel: float = 0.5
    max_acc_lon: float = 5.0
    max_acc_lat: float = 10.0
    max_kap: float = 2.1
    min_cxi: float = 0.8
    max_sig: float = 0.05
    use_scaling: bool = True
    rho: float = 1.0
    beta: float = 1000.0
    gamma: float = 1.0
    epsilon_con: float = 1.0e-3
    max_iter: int = 10
    g_epsilon: float = 1.0e-3
    min_step: float = 1.0e-32
    inner_max_iter: int = 10000
    delta: float = 1.0e-4
    mem_size: int = 256
    past: int = 3
    int_K: int = 16
    # Constants baked into the reference sources (alm_traj_opt.h:16-19).
    delta_sigl: float = 0.01
    cur_scale: float = 10.0
    sig_scale: float = 1000.0
    scale_trick_jerk: float = 1000.0
    # L-BFGS line-search constants (lbfgs.hpp defaults, lbfgs.hpp:76-128).
    max_linesearch: int = 64
    f_dec_coeff: float = 1.0e-4
    s_curv_coeff: float = 0.9
    cautious_factor: float = 1.0e-6
    machine_prec: float = 1.0e-16
    # Noise-tolerant Armijo slack (see lbfgs.LBFGSParams.f_noise_rel);
    # 0.0 keeps the reference's exact Lewis-Overton comparisons.
    f_noise_rel: float = 0.0


@dataclasses.dataclass(frozen=True)
class ManagerConfig:
    """Init-guess construction parameters (run_hill.yaml:57-62,
    plan_manager.cpp:5-12)."""

    piece_len: float = 0.3
    mean_vel: float = 0.5
    init_time_times: float = 1.2
    yaw_piece_times: float = 2.0
    init_sig_vel: float = 0.05


@dataclasses.dataclass(frozen=True)
class MPCConfig:
    """Tracking-MPC parameters (run_hill.yaml:64-83, mpc.cpp:7-32)."""

    du_threshold: float = 0.001
    dt: float = 0.02
    max_iter: int = 150
    predict_steps: int = 30
    delay_num: int = 0
    max_omega: float = 24.0
    max_domega: float = 10.0
    max_speed: float = 0.8
    min_speed: float = -0.8
    max_accel: float = 10.0
    matrix_q: Tuple[float, float, float] = (100.0, 100.0, 2.0)
    matrix_r: Tuple[float, float] = (0.01, 0.01)
    matrix_rd: Tuple[float, float] = (0.01, 100.0)
    max_steer: float = 0.505
    max_dsteer: float = 1.5
    wheel_base: float = 0.26
    model_type: int = 2  # 0=OMINI, 1=DIFF, 2=ACKER
    # ADMM QP solver settings (OSQP-equivalent; mpc.cpp:517-521 uses
    # tol 1e-6, warm start, 30000 iter cap — the batched solver uses a fixed
    # iteration budget with the same tolerances).
    qp_abs_tol: float = 1.0e-6
    qp_rel_tol: float = 1.0e-6
    qp_max_iter: int = 2000
    qp_rho: float = 0.1
    qp_sigma: float = 1.0e-6
    qp_alpha: float = 1.6
    # Active-set polish after ADMM convergence.  Off for the 100 Hz tick —
    # the reference's OSQP run leaves polish at its default (off), and each
    # polish costs an extra dense KKT factorization per relinearization.
    qp_polish: bool = False
    # Fixed ADMM trip count for QP solves nested inside the tracking scan
    # (solver/admm_qp.solve_qp fixed_iters): numerically identical to the
    # early-exit while_loop, required on TPU where while-under-scan
    # miscompiles (see admm_qp.py).  ~covers warm-started MPC QPs at 1e-6
    # tolerances with margin.
    qp_scan_iters: int = 400
    # Condense the QP to inputs-only (exact: the reference QP has no state
    # bounds, mpc.cpp:387-511, so states are eliminated through the
    # linearized dynamics).  n drops 5H -> 2H: ~15x cheaper KKT
    # factorizations (the dominant per-tick cost on this TPU) at the same
    # unique optimum — the golden-parity gate (tests/test_mpc.py) runs
    # against the f64 full-QP KKT oracle either way.
    qp_condense: bool = True
    # In-loop adaptive rho (OSQP §5.2) refactorizes the KKT inside the ADMM
    # loop; under vmap lax.cond evaluates BOTH branches, so every iteration
    # would pay a full refactorization (measured 4.8 s/tick).  The tracking
    # QPs are Ruiz-equilibrated and warm-started, where a fixed rho with the
    # equality boost converges within the scan budget (golden-parity gate,
    # tests/test_mpc.py); off by default for the 100 Hz path.
    qp_adaptive_rho: bool = False

    @property
    def max_comega(self) -> float:
        return self.max_domega * self.dt

    @property
    def max_csteer(self) -> float:
        return self.max_dsteer * self.dt

    @property
    def max_cv(self) -> float:
        return self.max_accel * self.dt


@dataclasses.dataclass(frozen=True)
class SceneConfig:
    name: str = "hill"
    map: MapConfig = dataclasses.field(default_factory=MapConfig)
    frontend: FrontendConfig = dataclasses.field(default_factory=FrontendConfig)
    alm: ALMConfig = dataclasses.field(default_factory=ALMConfig)
    manager: ManagerConfig = dataclasses.field(default_factory=ManagerConfig)
    mpc: MPCConfig = dataclasses.field(default_factory=MPCConfig)


def scene_config(name: str) -> SceneConfig:
    """Per-scene presets.

    Scene deltas mirror the reference param files: run_vocano.yaml:12,40
    (max_rho/max_sig = 0.08) and run_forest.yaml:12,33,40-41 (max_rho/max_sig
    = 0.001, rho_T = 500, use_scaling off); hill/desert/mountain share the
    base config.
    """
    base = SceneConfig(name=name)
    if name in ("hill", "desert", "mountain"):
        return base
    if name in ("vocano", "volcano"):
        return dataclasses.replace(
            base,
            name="vocano",
            map=dataclasses.replace(base.map, max_rho=0.08),
            alm=dataclasses.replace(base.alm, max_sig=0.08),
        )
    if name == "forest":
        return dataclasses.replace(
            base,
            map=dataclasses.replace(base.map, max_rho=0.001),
            alm=dataclasses.replace(
                base.alm, max_sig=0.001, rho_T=500.0, use_scaling=False),
        )
    raise ValueError(f"unknown scene: {name}")
