"""Regenerate the frozen golden solver fixtures (see tests/test_golden.py).

Run only after an INTENTIONAL numerics change:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tests/golden/generate.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)


def main():
    from test_golden import GOLDEN_DIR, _case_specs, solve_case

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, setup, config in _case_specs():
        P, x0, z_init, result = solve_case(setup, config)
        assert bool(result.success), f"{name} did not solve"
        out = os.path.join(GOLDEN_DIR, f"{name}.npz")
        np.savez_compressed(
            out, P=P, x0=x0, z_init=z_init, Z=np.asarray(result.z),
            cost=np.asarray(result.cost), eq_res=np.asarray(result.eq_res))
        print(f"wrote {out}  cost={float(result.cost):.9f} "
              f"eq_res={float(result.eq_res):.2e}")


if __name__ == "__main__":
    main()
