#!/usr/bin/env python
"""Minimal repro: GSPMD mis-computes a scanned stacked-param conv stage when
an INTERNAL spatial extent shrinks below the 'space' shard count.

This is the bug behind the C5/C6 Y-extent cap in
``parallel/mesh.py::make_spatial_predict``. The sharded input itself is
always divisible by the shard count (jit enforces that); the hazard is the
backbone's strided downsampling: at patch Y=128 with 4-way space sharding,
C5 has Y=4 (fine) but a deeper level or a smaller image drops under the
shard count. This script reproduces the failure in isolation:

  f(x) = subsample(x, stride 2^n_down)           # delta kernels: exact
         then lax.scan over stacked IDENTITY conv blocks

so ``f`` is numerically exact subsampling and the spatially-sharded output
must match the unsharded one bit-for-bit. Measured on this image's jax
(CPU GSPMD, 8 virtual devices): at y_deep = Y / 2^n_down = 2 with 8-way
space sharding the partitioned program returns values WRONG BY ~1.0 — in
BOTH the lax.scan-over-stacked-params variant and the unrolled-loop variant
— while every configuration with y_deep >= n_space is bit-exact. (The
round-3 observation on the full model saw only the scan variant fail at its
geometry; this isolated repro shows the unrolled form is not safe either,
so the extent cap — not a scan->loop rewrite — is the correct fence.)

Run (no TPU needed — virtual CPU mesh):

    python tools/gspmd_scan_repro.py    # self-forces CPU + 8 devices

Prints one line per (y_deep, n_space, mode) with the max abs error vs the
unsharded reference; exits 0 if the expected pattern holds (every mode
exact in the cap's safe region y_deep >= n_space, at least one wrong
answer in the fenced region y_deep < n_space), 1 otherwise — so the
companion test fails loudly if a jax upgrade changes the behavior, at
which point the cap in make_spatial_predict can be revisited.
"""

import os
import sys

if __name__ == "__main__" and os.environ.get("JAX_PLATFORMS") != "cpu":
    # self-force CPU + 8 virtual devices (axon plugin must be skipped
    # BEFORE jax import; see CLAUDE.md)
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",
        XLA_FLAGS=(env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8").strip(),
    )
    os.execvpe(sys.executable, [sys.executable, os.path.abspath(__file__)], env)

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DEPTH = 4  # number of stacked identity blocks in the scan
CH = 8
Y_IN = 32  # input Y: always divisible by every shard count tested


def delta_kernel():
    # 3x3 delta kernel: SAME stride-1 conv with it is the identity map;
    # stride-2 conv with it is exact 2x subsampling
    k = np.zeros((3, 3, CH, CH), np.float32)
    for c in range(CH):
        k[1, 1, c, c] = 1.0
    return jnp.asarray(k)


def conv(x, k, stride=1):
    return lax.conv_general_dilated(
        x, k, (stride, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def make_f(n_down, mode):
    def f(x, ks):
        h = x
        for _ in range(n_down):  # exact subsampling to the deep extent
            h = conv(h, ks[0], stride=2)
        if mode == "scan":
            def body(c, k):
                return conv(c, k), None
            h = lax.scan(body, h, ks)[0]
        else:  # "loop": unrolled over unstacked params
            for i in range(DEPTH):
                h = conv(h, ks[i])
        return h
    return f


def run(n_down, n_space, mode):
    devs = jax.devices()[:n_space]
    mesh = Mesh(np.asarray(devs).reshape(1, n_space), ("data", "space"))
    x = jnp.asarray(np.random.RandomState(0).rand(1, Y_IN, 16, CH).astype(np.float32))
    stacked = jnp.stack([delta_kernel()] * DEPTH)
    f = make_f(n_down, mode)

    ref = np.asarray(jax.jit(f)(x, stacked))
    # output gathered on 'data' only — matches make_spatial_predict, and the
    # deep extent need not be divisible by (or even as large as) n_space
    jf = jax.jit(
        f,
        in_shardings=(NamedSharding(mesh, P("data", "space")), NamedSharding(mesh, P())),
        out_shardings=NamedSharding(mesh, P("data")),
    )
    out = np.asarray(jf(x, stacked))
    return float(np.abs(out - ref).max())


def main():
    results = {}
    for n_space in (4, 8):
        for n_down in (0, 1, 2, 3, 4):  # y_deep = 32, 16, 8, 4, 2
            y_deep = Y_IN >> n_down
            for mode in ("scan", "loop"):
                err = run(n_down, n_space, mode)
                results[(y_deep, n_space, mode)] = err
                flag = "" if err == 0.0 else "   <-- WRONG (sharded != unsharded)"
                print(
                    f"y_deep={y_deep:3d} n_space={n_space} mode={mode:4s} "
                    f"max|err|={err:.6f}{flag}"
                )

    safe_region_exact = all(
        v == 0.0 for (y, n, m), v in results.items() if y >= n
    )
    fenced_region_wrong = any(
        v > 0.0 for (y, n, m), v in results.items() if y < n
    )
    print(f"all modes exact at y_deep >= n_space (the cap's safe region): {safe_region_exact}")
    print(f"wrong answer exists at y_deep < n_space (the fenced region): {fenced_region_wrong}")
    if safe_region_exact and fenced_region_wrong:
        print("REPRO-PATTERN-HOLDS")
        return 0
    print("pattern CHANGED — revisit the make_spatial_predict cap")
    return 1


if __name__ == "__main__":
    sys.exit(main())
