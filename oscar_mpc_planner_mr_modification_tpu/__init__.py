"""TPU-native trajectory-optimization engine with the capabilities of the TU Delft
``mpc_planner`` / T-MPC++ stack (reference: Juleszwanen/oscar_mpc_planner_mr_modification).

This is a ground-up JAX/XLA/Pallas redesign, not a port:

- The reference's *offline* CasADi -> acados/ForcesPro codegen pipeline
  (``solver_generator/``) becomes plain function composition: control modules are pure
  JAX functions producing stage costs / constraint residuals, and "solver generation"
  is ``jax.jit`` compilation of the assembled OCP (:mod:`.solver.ocp`).
- The reference's *online* C++ runtime (``mpc_planner/``, ``mpc_planner_solver/``,
  ``mpc_planner_modules/``) becomes a batched SQP-RTI engine
  (:mod:`.ops.sqp`, :mod:`.ops.qp`) whose QP subproblems are solved by a primal-dual
  interior-point method with a Riccati (LQR) factorization - branch-free, statically
  shaped, and therefore ``vmap``-able over thousands of planner instances.
- The reference's OpenMP parallelism (T-MPC++ parallel homotopy solves,
  SH-MPC scenario solvers) becomes a vmapped batch axis (:mod:`.parallel`), with
  cross-host best-trajectory selection via ``psum``/``all_gather`` collectives.
- The ROS multi-robot layer (FSM, event-triggered trajectory communication, stale
  trajectory interpolation) is reproduced as host-side Python (:mod:`.multirobot`).
"""

__version__ = "0.1.0"

from . import utils  # noqa: F401
