#!/usr/bin/env python
"""Isolated conv throughput on the chip: what does XLA actually achieve?

Times single conv_general_dilated ops at the shapes that dominate the LIDC 3D
backbone, printing achieved TFLOP/s and MXU utilization (v5e bf16 peak 197T).
Decides whether backbone slowness is inherent conv lowering (attack with
reformulation/Pallas) or composition/layout effects (attack with fusion).

Measurement design (the third iteration — the first two were elided):
the conv is CHAINED into itself inside a lax.scan, so every iteration's
input is the previous iteration's output. Scalar input mixing does NOT work
here even with bf16-representable steps: XLA's algebraic simplifier hoists
scalar multiplies across convolutions (conv(s*x, w) == s*conv(x, w)), after
which the conv sub-computation's inputs are bit-identical across calls and
the content-addressed axon runtime elides it — the probe then reads >1000
TF/s on a 197 TF/s chip. Chained values cannot be rewritten away.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mdt_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PEAK = 197e12
N_ITERS = 16


def main():
    import jax
    import jax.numpy as jnp

    cases = [
        # name, input shape (B, Y, X, Z, Cin), Cout, kernel, stride
        ("c0_a 3^3 1->18 full", (4, 128, 128, 64, 1), 18, (3, 3, 3), (1, 1, 1)),
        ("c0_b 3^3 18->18 full", (4, 128, 128, 64, 18), 18, (3, 3, 3), (1, 1, 1)),
        ("stem 7^3 18->18 s221", (4, 128, 128, 64, 18), 18, (7, 7, 7), (2, 2, 1)),
        ("p0 3^3 36->36 full", (4, 128, 128, 64, 36), 36, (3, 3, 3), (1, 1, 1)),
        ("p2 3^3 36->36 /4", (4, 32, 32, 64, 36), 36, (3, 3, 3), (1, 1, 1)),
        ("head 3^3 64->64 /4", (4, 32, 32, 64, 64), 64, (3, 3, 3), (1, 1, 1)),
        ("stage2 3^3 18->18 /4", (4, 32, 32, 64, 18), 18, (3, 3, 3), (1, 1, 1)),
        ("head 3^3 64->64 /4 C128", (4, 32, 32, 64, 128), 128, (3, 3, 3), (1, 1, 1)),
        # z-folded equivalents (space-to-depth by f on z; kernel z-taps
        # t=ceil((f+k-1)/f); channels x f). Wall-time comparison vs the
        # unfolded case above IS the honest speedup estimate: the folded
        # banded weights compute their zero blocks densely, same as here.
        ("zf4 c0_b (3,3,2) 72", (4, 128, 128, 16, 72), 72, (3, 3, 2), (1, 1, 1)),
        ("zf2 c0_b (3,3,2) 36", (4, 128, 128, 32, 36), 36, (3, 3, 2), (1, 1, 1)),
        ("zf4 stem (7,7,3) 72", (4, 128, 128, 16, 72), 72, (7, 7, 3), (2, 2, 1)),
        ("zf2 p0 (3,3,2) 72", (4, 128, 128, 32, 72), 72, (3, 3, 2), (1, 1, 1)),
        ("zf4 stage2 (3,3,2) 72", (4, 32, 32, 16, 72), 72, (3, 3, 2), (1, 1, 1)),
        ("zf2 p2 (3,3,2) 72", (4, 32, 32, 32, 72), 72, (3, 3, 2), (1, 1, 1)),
        ("zf4 1x1 18->72 fullres", (4, 128, 128, 16, 72), 288, (1, 1, 1), (1, 1, 1)),
    ]
    for name, ishape, cout, ks, stride in cases:
        cin = ishape[-1]
        x = jnp.asarray(np.random.randn(*ishape).astype(np.float32), jnp.bfloat16)
        w = jnp.asarray(np.random.randn(*ks, cin, cout).astype(np.float32), jnp.bfloat16)
        # keep chained activations O(1): divide by fan-in scale each step
        inv_scale = jnp.bfloat16(1.0 / np.sqrt(np.prod(ks) * cin))
        chainable = stride == (1, 1, 1)  # output spatial == input spatial

        def one_conv(x_, w_):
            return jax.lax.conv_general_dilated(
                x_, w_, window_strides=stride, padding="SAME",
                dimension_numbers=("NHWDC", "HWDIO", "NHWDC"),
            )

        if chainable:
            @jax.jit
            def run(x_, w_):
                def body(y, _):
                    o = one_conv(y, w_) * inv_scale
                    # fold Cout back to Cin so the chain type-checks; the
                    # slice/pad is layout work only (no FLOPs to speak of)
                    if cout >= cin:
                        y2 = o[..., :cin]
                    else:
                        y2 = jnp.pad(o, [(0, 0)] * 4 + [(0, cin - cout)])
                    return y2, ()
                y, _ = jax.lax.scan(body, x_, None, length=N_ITERS)
                return y
        else:
            # strided: output shape differs; chain via a cheap nearest-
            # neighbor upsample back to input spatial dims
            ups = tuple(s for s in stride)

            @jax.jit
            def run(x_, w_):
                def body(y, _):
                    o = one_conv(y, w_) * inv_scale
                    for ax, s in enumerate(ups):
                        if s > 1:
                            o = jnp.repeat(o, s, axis=1 + ax)
                    o = o[:, : y.shape[1], : y.shape[2], : y.shape[3], :]
                    if cout >= cin:
                        o = o[..., :cin]
                    else:
                        o = jnp.pad(o, [(0, 0)] * 4 + [(0, cin - cout)])
                    return o, ()
                y, _ = jax.lax.scan(body, x_, None, length=N_ITERS)
                return y

        out = run(x, w)
        jax.block_until_ready(out)
        oshape = tuple(int(ishape[i] // stride[i - 1]) if 0 < i < 4 else ishape[i]
                       for i in range(4)) + (cout,)
        flops = 2 * np.prod(oshape) * np.prod(ks) * cin
        t0 = time.perf_counter()
        out = run(out, w)  # chained: input is previous output, never elided
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / N_ITERS
        print(f"{name:>26}: {dt*1e3:7.2f} ms  {flops/dt/1e12:6.1f} TF/s  "
              f"({flops/dt/PEAK*100:4.1f}% MXU)", flush=True)


if __name__ == "__main__":
    main()
