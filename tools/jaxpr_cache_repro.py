"""Minimal repro: jax.jit wrappers of the SAME function share the global
jaxpr cache, so trace-time global reads (like parallel.mesh.space_fence's
context check) are frozen by whichever wrapper traces first.

Observed consequence (round 4): calling a detector's single-device
``_train_step_fn`` before ``make_spatial_train_step`` of the same bound
method reused a fence-less jaxpr inside the spatially-partitioned jit —
the with_sharding_constraint fences vanished and GSPMD returned wrong
losses (2.999 vs 2.911 on retina_net 2D patch 64, mesh (2,2)),
deterministically. Fix: spatial wrappers jit a FRESH CLOSURE that enters
the trace context inside the traced function (parallel/mesh.py).

Run: JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python tools/jaxpr_cache_repro.py
Expected output demonstrates the hazard:
    j1 (flag off): 1.0
    j2 (flag on): 1.0   <- WRONG-ish: flag ignored, cached jaxpr reused
    j3 closure (flag on): 2.0  <- fresh identity retraces correctly
"""

import jax
import jax.numpy as jnp

FLAG = []


def f(x):
    # trace-time global read, standing in for space_fence's context check
    return x * (2.0 if FLAG else 1.0)


def main():
    a = jnp.ones((4,))
    j1 = jax.jit(f)
    print("j1 (flag off):", float(j1(a)[0]))
    FLAG.append(1)
    j2 = jax.jit(f)  # separate wrapper, same function identity, same avals
    print("j2 (flag on):", float(j2(a)[0]))
    j3 = jax.jit(lambda x: f(x))  # fresh closure identity
    print("j3 closure (flag on):", float(j3(a)[0]))
    assert float(j2(a)[0]) == 1.0, "jaxpr cache no longer shared — hazard gone"
    assert float(j3(a)[0]) == 2.0


if __name__ == "__main__":
    main()
