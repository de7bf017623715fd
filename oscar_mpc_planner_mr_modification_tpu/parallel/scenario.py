"""SH-MPC scenario optimization as a batched JAX program.

Reference: mpc_planner_modules/src/scenario_constraints.cpp:31-130 + the external
``scenario_module``: 4 OpenMP solver clones, each drawing its own scenario samples
from the Gaussian obstacle predictions, building 24 halfspace constraints per stage
from the support scenarios, solving, and returning the lowest-cost feasible plan.

This module reproduces the *scenario-optimization machinery* that external
package provides (invoked at scenario_constraints.cpp:85,110-130), not just the
parallel shell:

- **Sample-size calibration**: the number of scenarios S is computed from the
  risk level epsilon, the confidence beta and a bound on the number of support
  scenarios, using the posterior risk bound of the nonconvex scenario approach
  (Campi, Garatti, Ramponi 2018, "A general scenario theory for nonconvex
  optimization and decision making"): with confidence >= 1 - beta,
  ``V(x*) <= eps(s*)`` where ``eps(k) = 1 - (beta / (S * C(S,k)))^(1/(S-k))``
  and s* is the observed number of support scenarios. ``scenario_sample_size``
  inverts this: the smallest S with ``eps(max_support) <= epsilon``.
- **Integrated sampling**: scenario trajectories are drawn as integrated noise
  (random-walk increments reconstructed from the per-step marginal sigmas, then
  cumulatively summed) - the sampler's IntegrateAndTranslateToMeanAndVariance
  capability - so samples are temporally consistent trajectories, not
  independent per-stage clouds.
- **Support-scenario selection with pruning**: per stage, the free-space
  polytope is built greedily from the nearest scenario discs; a scenario whose
  disc already lies in the excluded halfplane of a selected constraint is
  *dominated* and pruned without consuming one of the 24 constraint rows. If
  non-dominated scenarios remain after all rows are used the stage is
  UNDER-COVERED and the optimizer reports it (``last_uncovered``) - the failure
  mode the round-1 closest-24 heuristic could hit silently.
- **Support counting + posterior certificate**: after the solve, the number of
  active constraint rows is counted and ``posterior_epsilon`` turns it into the
  a-posteriori risk certificate for the returned trajectory.

The solver axis stays a vmap dimension: the 4 (or more) solves run as one
batched XLA/Pallas program. Scaling the number of parallel scenario solvers is
a batch-size change, not a threading change.
"""

from __future__ import annotations

import numpy as np
from scipy.special import gammaln

import jax
import jax.numpy as jnp

from ..modules.scenario_constraints import N_SCENARIO_CONSTRAINTS
from ..ops.sqp import (make_buffered_packed_solve, make_fleet_sqp_solver,
                       make_sqp_solver, SQPResult, unpack_results)
from ..types import PredictionType


# ---------------------------------------------------------------------------
# Scenario-optimization theory (the scenario_module's calibration role)
# ---------------------------------------------------------------------------
def _log_binom(n: int, k) -> np.ndarray:
    k = np.asarray(k)
    return gammaln(n + 1) - gammaln(k + 1) - gammaln(n - k + 1)


def posterior_epsilon(S: int, k: int, beta: float) -> float:
    """A-posteriori risk bound of the nonconvex scenario approach.

    With confidence >= 1 - beta, the violation probability of a scenario
    solution with k support scenarios out of S samples satisfies
    ``V <= 1 - (beta / (S * C(S,k)))^(1/(S-k))`` (Campi-Garatti-Ramponi 2018,
    Theorem 1). Returns 1.0 when k >= S (no generalization possible).
    """
    if k >= S:
        return 1.0
    log_t = (np.log(beta) - np.log(S) - _log_binom(S, k)) / (S - k)
    return float(1.0 - np.exp(log_t))


def scenario_sample_size(epsilon: float, beta: float, max_support: int,
                         s_max: int = 200_000) -> int:
    """Smallest sample count S with ``posterior_epsilon(S, max_support) <= eps``.

    This is the a-priori calibration the SH-MPC formulation needs: bound the
    number of support scenarios (the polytope facets actually touching the
    solution), then size the sample set so the risk certificate meets the
    requested (epsilon, beta) even in the worst admissible support case.
    """
    assert 0.0 < epsilon < 1.0 and 0.0 < beta < 1.0 and max_support >= 1
    lo, hi = max_support + 1, max_support + 2
    while posterior_epsilon(hi, max_support, beta) > epsilon:
        hi *= 2
        if hi > s_max:
            raise ValueError(
                f"sample size exceeds {s_max} for eps={epsilon}, beta={beta}, "
                f"support={max_support}")
    while lo < hi:
        mid = (lo + hi) // 2
        if posterior_epsilon(mid, max_support, beta) <= epsilon:
            hi = mid
        else:
            lo = mid + 1
    return int(hi)


def select_support_halfspaces(pos, centers, margins, n_rows):
    """Greedy free-space polytope from scenario discs, with domination pruning.

    pos: (2,) linearization point. centers: (M, 2) scenario disc centers.
    margins: (M,) disc radii (obstacle radius + robot radius). Returns
    (a (n_sel, 2), b (n_sel,), sel_idx (n_sel,), n_uncovered).

    A disc j is *dominated* by an already-selected halfspace (a_i, b_i) when it
    lies entirely in the excluded halfplane: ``a_i @ c_j - margin_j >= b_i`` -
    any point satisfying constraint i then cannot be inside disc j, so j needs
    no row of its own (the scenario_module's scenario-pruning capability).
    Discs are visited nearest-first (most binding first); ``n_uncovered``
    counts non-dominated discs left when the row budget runs out - the
    under-coverage signal.
    """
    M = centers.shape[0]
    if M == 0:
        return (np.zeros((0, 2)), np.zeros(0), np.zeros(0, dtype=int), 0)
    diff = centers - pos[None]
    dist = np.linalg.norm(diff, axis=1)
    # Degenerate: linearization point exactly at a disc center
    deg = dist < 1e-9
    diff[deg] = np.array([1.0, 0.0])
    dist[deg] = 1e-9
    a_all = diff / dist[:, None]  # (M, 2) unit normals toward each disc
    b_all = np.sum(a_all * centers, axis=1) - margins  # (M,)
    order = np.argsort(dist - margins)  # nearest disc boundary first

    sel = []
    covered = np.zeros(M, dtype=bool)
    for j in order:
        if covered[j]:
            continue
        if len(sel) == n_rows:
            break
        sel.append(j)
        # Prune every disc entirely inside this halfspace's excluded side
        covered |= (centers @ a_all[j]) - margins >= b_all[j] - 1e-12
    n_uncovered = int(np.count_nonzero(~covered))
    sel = np.asarray(sel, dtype=int)
    return a_all[sel], b_all[sel], sel, n_uncovered


def select_support_halfspaces_batch(pos, centers, margins, n_rows):
    """Vectorized :func:`select_support_halfspaces` over arbitrary batch axes.

    pos: (..., 2) linearization points; centers: (..., M, 2) scenario disc
    centers (broadcastable against pos's batch axes); margins: (M,) or
    (..., M). Returns ``(a (..., n_rows, 2), b (..., n_rows),
    valid (..., n_rows) bool, n_uncovered (...))``; unfilled rows carry the
    far-away dummy (a = (1, 0), b = 1e4). Equivalent to the scalar greedy
    selection cell-by-cell (per round, each cell selects its nearest
    non-dominated disc and prunes everything in the new excluded halfplane);
    the loop is over the <= n_rows selection rounds, every other axis is
    numpy-vectorized — this is what lets the SH-MPC host fill cover
    (solvers x stages x discs) without a Python cell loop."""
    pos = np.asarray(pos, dtype=float)
    centers = np.asarray(centers, dtype=float)
    batch = np.broadcast_shapes(pos.shape[:-1], centers.shape[:-2])
    M = centers.shape[-2]
    a_sel = np.zeros(batch + (n_rows, 2))
    a_sel[..., 0] = 1.0
    b_sel = np.full(batch + (n_rows,), 1.0e4)
    valid = np.zeros(batch + (n_rows,), dtype=bool)
    if M == 0:
        return a_sel, b_sel, valid, np.zeros(batch, dtype=int)
    centers = np.broadcast_to(centers, batch + (M, 2))
    margins = np.broadcast_to(np.asarray(margins, dtype=float), batch + (M,))
    diff = centers - pos[..., None, :]
    dist = np.linalg.norm(diff, axis=-1)
    deg = dist < 1e-9
    diff = np.where(deg[..., None], np.array([1.0, 0.0]), diff)
    dist = np.maximum(dist, 1e-9)
    a_all = diff / dist[..., None]
    b_all = np.sum(a_all * centers, axis=-1) - margins
    key = dist - margins

    covered = np.zeros(batch + (M,), dtype=bool)
    for r in range(n_rows):
        left = ~np.all(covered, axis=-1)  # cells with non-dominated discs
        if not left.any():
            break
        masked = np.where(covered, np.inf, key)
        j = np.argmin(masked, axis=-1)
        aj = np.take_along_axis(a_all, j[..., None, None], axis=-2)[..., 0, :]
        bj = np.take_along_axis(b_all, j[..., None], axis=-1)[..., 0]
        a_sel[..., r, :] = np.where(left[..., None], aj, a_sel[..., r, :])
        b_sel[..., r] = np.where(left, bj, b_sel[..., r])
        valid[..., r] = left
        dom = (np.einsum("...mk,...k->...m", centers, aj) - margins
               >= bj[..., None] - 1e-12)
        covered |= dom & left[..., None]
    n_uncovered = np.count_nonzero(~covered, axis=-1)
    return a_sel, b_sel, valid, n_uncovered


class ScenarioOptimizer:
    def __init__(self, solver, settings, seed: int = 0):
        self.solver = solver
        self.settings = settings
        scfg = settings["scenario_constraints"]
        self.n_solvers = int(scfg["parallel_solvers"])
        self.robot_radius = float(settings["robot_radius"])
        # (epsilon, beta) -> sample size; an explicit n_samples overrides (for
        # tests / quick runs), otherwise calibrate from the risk settings.
        self.epsilon = float(settings["probabilistic"]["risk"])
        self.beta = float(scfg.get("confidence", 1e-2))
        self.max_support = int(scfg.get("max_support", 10))
        if scfg.get("n_samples"):
            self.n_samples = int(scfg["n_samples"])
        else:
            self.n_samples = scenario_sample_size(
                self.epsilon, self.beta, self.max_support)
        self.rng = np.random.default_rng(seed)
        # Backend ladder as in parallel/tmpc.py: fused whole-SQP kernel first
        # on TPU, per-iteration pallas fallback at runtime, XLA elsewhere;
        # solve+packing fused into one dispatch.
        on_tpu = (jax.devices()[0].platform == "tpu"
                  and solver.dtype == jnp.float32)
        self._fleet_backends = ["fused", "pallas"] if on_tpu else ["xla"]
        self._packed_solve = None  # n_sqp -> packed fn (lazy, w/ fallback)
        self.fleet_backend = None
        reg = solver.ocp.registry
        # (n_discs, 24) parameter columns: every disc gets its own polytope
        self.n_discs = int(settings["n_discs"])
        self._a1_idx = np.array([[
            reg.index(f"disc_{d}_scenario_constraint_{i}_a1")
            for i in range(N_SCENARIO_CONSTRAINTS)]
            for d in range(self.n_discs)])
        self._a2_idx = np.array([[
            reg.index(f"disc_{d}_scenario_constraint_{i}_a2")
            for i in range(N_SCENARIO_CONSTRAINTS)]
            for d in range(self.n_discs)])
        self._b_idx = np.array([[
            reg.index(f"disc_{d}_scenario_constraint_{i}_b")
            for i in range(N_SCENARIO_CONSTRAINTS)]
            for d in range(self.n_discs)])
        self._off_idx = np.array([
            reg.index(f"ego_disc_{d}_offset") for d in range(self.n_discs)])
        model = solver.ocp.model
        self._ipsi = (model.var_index("psi")
                      if "psi" in model.states else None)
        # samples: (n_solvers, n_samples, n_obs, N, 2)
        self._samples = None
        self._sample_radii = None
        self.best_solver_index = -1
        # Diagnostics of the last optimize()
        self.last_uncovered = 0  # max non-dominated discs dropped at any stage
        self.last_support = 0  # active-row count of the returned solution
        self.last_certificate = 1.0  # posterior_epsilon(S, last_support, beta)

    # -- sampling (scenario_constraints.cpp:110-130) -----------------------
    def sample_scenarios(self, data) -> None:
        """Draw per-solver scenario trajectories from the Gaussian predictions
        (the sampler's IntegrateAndTranslateToMeanAndVariance capability):
        noise is drawn as per-step *increments* matching the marginal sigmas
        (var_inc_k = sigma_k^2 - sigma_{k-1}^2) and integrated, so each sample
        is a temporally consistent trajectory."""
        N = self.solver.N
        obstacles = [o for o in data.dynamic_obstacles
                     if not o.prediction.empty()]
        n_obs = len(obstacles)
        if n_obs == 0:
            self._samples = None
            return
        means = np.zeros((n_obs, N, 2))
        stds = np.zeros((n_obs, N, 2))
        radii = np.zeros(n_obs)
        for i, obs in enumerate(obstacles):
            mode = obs.prediction.modes[0]
            gaussian = obs.prediction.type == PredictionType.GAUSSIAN
            for k in range(N):
                step = mode[min(k, len(mode) - 1)]
                means[i, k] = step.position
                if gaussian:
                    stds[i, k] = (step.major_radius, step.minor_radius)
            radii[i] = obs.radius
        var = stds**2
        var_inc = np.diff(var, axis=1, prepend=np.zeros((n_obs, 1, 2)))
        std_inc = np.sqrt(np.maximum(var_inc, 0.0))
        noise = self.rng.standard_normal(
            (self.n_solvers, self.n_samples, n_obs, N, 2))
        walk = np.cumsum(noise * std_inc[None, None], axis=3)
        self._samples = means[None, None] + walk
        self._sample_radii = radii

    def _build_packed_solve(self, backend, n_sqp):
        from ..ops.sqp import scale_iterations

        config = scale_iterations(self.solver.config, n_sqp)
        if backend == "xla":
            raw = make_sqp_solver(self.solver.ocp, config,
                                  dtype=self.solver.dtype)
            batched = jax.vmap(raw, in_axes=(0, None, 0))
        else:
            fleet = make_fleet_sqp_solver(self.solver.ocp, config,
                                          dtype=self.solver.dtype,
                                          backend=backend)

            def batched(params, xinit, z_init):
                P = params.shape[0]
                return fleet(params, jnp.tile(xinit[None], (P, 1)), z_init)

        sv = self.solver
        return make_buffered_packed_solve(
            batched, self.n_solvers, sv.N, sv.ocp.npar, sv.nx, sv.nvar, sv.dtype)

    def _solve_batch(self, params, xinit, warmstarts) -> SQPResult:
        """One dispatch + one packed readback, with the first call probing
        the backend ladder and the ITERATION count adapting to the remaining
        tick budget through the solver's precompiled n_sqp ladder + shared
        per-iteration EMA (see parallel/tmpc.py::_solve_batch; the reference
        sets solver_timeout per parallel scenario solver,
        scenario_constraints.cpp:58-108)."""
        import time as _time

        T, nz = self.solver.N + 1, self.solver.nvar
        args = (params, xinit, warmstarts)
        from ..ops.sqp import _phases_of

        n_full = sum(n for n, _ in _phases_of(self.solver.config))
        n = (self.solver.select_iterations() if self._packed_solve
             else n_full)  # probe the backend at full count first
        fn = self._packed_solve.get(n) if self._packed_solve else None
        if fn is not None:
            first_call = False
        elif self._packed_solve is not None:
            fn = self._build_packed_solve(self.fleet_backend, n)
            self._packed_solve[n] = fn
            first_call = True
        else:
            last_exc = None
            for i, backend in enumerate(self._fleet_backends):
                try:
                    fn = self._build_packed_solve(backend, n)
                    t0 = _time.perf_counter()
                    out = fn(*args)
                    self._packed_solve = {n: fn}
                    self.fleet_backend = backend
                    self.solver.note_solve_time(
                        n, _time.perf_counter() - t0, compile_call=True)
                    return unpack_results(out, T, nz)
                except Exception as exc:
                    last_exc = exc
                    if i + 1 < len(self._fleet_backends):
                        import warnings

                        warnings.warn(
                            f"fleet backend {backend!r} failed at first call "
                            f"({exc}); falling back to "
                            f"{self._fleet_backends[i + 1]!r}")
            raise last_exc
        t0 = _time.perf_counter()
        out = fn(*args)
        self.solver.note_solve_time(n, _time.perf_counter() - t0,
                                    compile_call=first_call)
        return unpack_results(out, T, nz)

    # -- optimize (scenario_constraints.cpp:58-108) ------------------------
    def optimize(self, state, data, module_data) -> int:
        if self._samples is None:
            self.sample_scenarios(data)
        if self._samples is None:
            return -999  # no obstacle data: fall back to the default solve

        P, N = self.n_solvers, self.solver.N
        params = np.repeat(self.solver.params.data[None], P, axis=0)
        warmstarts = np.repeat(self.solver._loaded_warmstart[None], P, axis=0)
        model = self.solver.ocp.model
        ix, iy = model.var_index("x"), model.var_index("y")

        self.last_uncovered = self._fill_scenario_constraints(
            params, warmstarts, ix, iy)

        results = self._solve_batch(params, self.solver._xinit, warmstarts)
        costs = results.cost
        success = results.success
        exit_codes = results.exit_code

        feasible = np.where(success)[0]
        if len(feasible) == 0:
            self.best_solver_index = -1
            return int(exit_codes[0])
        best = int(feasible[np.argmin(costs[feasible])])
        self.best_solver_index = best
        self.solver.load_result(SQPResult(
            z=results.z[best], cost=results.cost[best],
            eq_res=results.eq_res[best], qp_comp=results.qp_comp[best],
            success=results.success[best], exit_code=results.exit_code[best]))
        self.solver.params.data[...] = params[best]
        module_data.trajectory_cost = float(costs[best])

        # Support count + posterior risk certificate for the winner
        self.last_support = self._count_support(
            params[best], np.asarray(results.z[best]), ix, iy)
        self.last_certificate = posterior_epsilon(
            self.n_samples, self.last_support, self.beta)
        self._samples = None  # consume samples (resampled on new data)
        return int(exit_codes[best])

    def _disc_positions(self, traj, ix, iy):
        """(..., n_discs, 2) collision-disc centers along a trajectory
        (..., nvar): pose + offset_d * (cos psi, sin psi), mirroring
        modules.base.ego_disc_position."""
        base = traj[..., [ix, iy]]  # (..., 2)
        if self._ipsi is not None:
            psi = traj[..., self._ipsi]
        else:
            psi = np.zeros(traj.shape[:-1])
        heading = np.stack([np.cos(psi), np.sin(psi)], axis=-1)  # (..., 2)
        offs = self.solver.params.data[0, self._off_idx]  # (D,)
        return (base[..., None, :]
                + offs[..., :, None] * heading[..., None, :])

    def _fill_scenario_constraints(self, params, warmstarts, ix, iy) -> int:
        """Fill the 24 halfspace rows per (stage, disc) for every solver from
        its own scenario samples (support selection + domination pruning),
        fully vectorized over (solvers x stages x discs) via
        :func:`select_support_halfspaces_batch`; returns the max
        under-coverage over all cells."""
        n_rows = N_SCENARIO_CONSTRAINTS
        P, N = params.shape[0], self.solver.N
        samples = self._samples  # (P, S, n_obs, N, 2)
        S, n_obs = samples.shape[1], samples.shape[2]
        # C-order flatten of (S, n_obs) is sample-major: radii tile per sample
        margins = np.tile(self._sample_radii, S) + self.robot_radius  # (S*n_obs,)

        # Per-stage sample step (prediction step k-1 serves stage k)
        steps = np.minimum(np.arange(N - 1), samples.shape[3] - 1)
        pts = samples[:, :, :, steps]  # (P, S, n_obs, N-1, 2)
        pts = np.moveaxis(pts, 3, 1).reshape(P, N - 1, S * n_obs, 2)

        pos = self._disc_positions(warmstarts[:, 1:N], ix, iy)  # (P,N-1,D,2)
        a, b, _, n_unc = select_support_halfspaces_batch(
            pos, pts[:, :, None], margins, n_rows)  # batch (P, N-1, D)

        # Stage 0 (and any unfilled row) keeps the far-away dummy
        params[:, :, self._a1_idx] = 1.0
        params[:, :, self._a2_idx] = 0.0
        params[:, :, self._b_idx] = 1.0e4
        params[:, 1:N, self._a1_idx] = a[..., 0]
        params[:, 1:N, self._a2_idx] = a[..., 1]
        params[:, 1:N, self._b_idx] = b
        return int(np.max(n_unc)) if n_unc.size else 0

    def _count_support(self, params_p, Z, ix, iy, tol: float = 1e-4) -> int:
        """Number of scenario constraint rows active at the solution - the
        observed support-scenario count s* for the posterior certificate."""
        N = self.solver.N
        pos = self._disc_positions(Z[1:N], ix, iy)  # (N-1, D, 2)
        a1 = params_p[1:N][:, self._a1_idx]  # (N-1, D, n_rows)
        a2 = params_p[1:N][:, self._a2_idx]
        b = params_p[1:N][:, self._b_idx]
        real = b < 0.9e4
        g = (a1 * pos[..., 0][..., None] + a2 * pos[..., 1][..., None] - b)
        return int(np.count_nonzero(real & (np.abs(g) < tol)))
