"""Shared FPN backbone (ResNet-50/101 encoder + top-down decoder), 2D + 3D.

TPU-native re-design of the reference backbone (``models/backbone.py:22-218``)
with identical topology and geometry:

  * encoder C1..C5(+C6): 7x7 stride-2 stem (stride (2,2,1) in 3D), 3x3
    stride-2 max pool ((2,2,1) in 3D), bottleneck ResBlocks with counts
    [3, 4, 6|23, 3] and expansion 4; stages C3..C5(C6) downsample
    isotropically (stride 2 in every spatial dim, including z);
  * decoder: 1x1 lateral convs + nearest x2 top-down upsampling, 3x3 output
    convs, ``end_filts`` channels at every level;
  * ``operate_stride1`` prepends U-Net-style full-resolution levels: a C0 stem
    before C1 and P1/P0 decoder levels using (bi/tri)linear (2,2,1) upsampling;
  * ``sixth_pooling`` appends C6/P6.

Differences are layout/idiom only: channel-last (b, y, x, (z), c) tensors so
XLA tiles convs straight onto the MXU, flax modules instead of nn.Module,
and a configurable compute dtype (bfloat16-ready).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def _kinit(name: Optional[str]):
    """Kernel init by config name (cf.weight_init; None = flax default)."""
    if name is None:
        return nn.initializers.lecun_normal()
    if name == "xavier_uniform":
        return nn.initializers.xavier_uniform()
    if name == "xavier_normal":
        return nn.initializers.xavier_normal()
    if name == "kaiming_uniform":
        return nn.initializers.he_uniform()
    if name == "kaiming_normal":
        return nn.initializers.he_normal()
    raise ValueError(f"unknown weight_init '{name}'")


def _zfold_backend_default():
    """Auto z-fold only on TPU backends (CPU/GPU convs don't lane-pad)."""
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:  # pragma: no cover - backend probing must never crash
        return False


def _zfold_policy(cin: int, cout: int, z_len: int, ks: int, stride_z: int) -> int:
    """Pick the space-to-depth factor for the minor spatial axis, or 1.

    TPU convs put the feature dim in the 128-wide lane axis; 18/36-channel
    tensors pad 7x/3.5x (the round-2 binding constraint). Folding the last
    spatial axis by ``f`` multiplies channels by ``f`` at a FLOP overhead of
    roughly ``t*f/ks`` (t = folded taps) from the banded zero blocks —
    measured net wins of 1.4-2.1x per conv (tools/convprobe.py). Strided
    folded axes are supported (banding absorbs the stride); tiny axes skip
    (pad overhead dominates).
    """
    if z_len < 16:
        return 1
    c = max(cin, cout)
    if c <= 32:
        return 4
    if c <= 36:
        return 2
    return 1


class _ZFoldedConv(nn.Module):
    """Conv computed with its minor spatial axis space-to-depth folded into
    the channel (lane) dim — 2D folds x, 3D folds z.

    Mathematically exact reformulation of ``nn.Conv``: the input is padded by
    the conv's padding on the folded axis, folded axis->channels by ``zfold``,
    and convolved with block-banded weights built on the fly from the LOGICAL
    kernel param —
    ``w_f[..., T, i*Cin+ci, j*Cout+co] = w[..., f*T+i-s*j, ci, co]``
    (zero outside [0, ks); ``s`` = the folded axis' stride, which becomes the
    block-axis conv stride), so folded output slot j of block zo is exactly
    original output position f*zo + j. Param names/shapes are identical to
    ``nn.Conv``: checkpoints are interchangeable with the unfolded path, and
    gradients flow to the logical params through the banded construction
    (no custom VJP).
    """

    dim: int
    features: int
    ks: int
    stride: tuple  # per-axis; stride on the folded (last spatial) axis ok
    pad: int
    zfold: int
    kernel_init: object
    dtype: object

    @nn.compact
    def __call__(self, x):
        d, f, k, p = self.dim, self.zfold, self.ks, self.pad
        s = self.stride[-1]
        Z, cin = x.shape[-2], x.shape[-1]
        lead = x.shape[:-2]  # (B, Y[, X])
        w = self.param("kernel", self.kernel_init, (k,) * d + (cin, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)

        z_out = -(-Z // s)  # SAME padding: ceil(Z / s)
        zb_out = -(-z_out // f)
        # folded taps: dz = f*T + i - s*j must cover [0, k) for all i, j
        t = (k - 1 + s * (f - 1)) // f + 1
        L = f * (s * (zb_out - 1) + t)  # padded length: left p, right to fit
        assert L - p - Z >= 0
        xp = jnp.pad(x, [(0, 0)] * d + [(p, L - p - Z), (0, 0)])
        xf = xp.reshape(lead + (L // f, f * cin))

        T = jnp.arange(t)[:, None, None]
        i = jnp.arange(f)[None, :, None]
        j = jnp.arange(f)[None, None, :]
        dz = f * T + i - s * j  # (t, f, f)
        wg = w[..., jnp.clip(dz, 0, k - 1), :, :]  # (k[, k], t, f, f, cin, cout)
        wg = jnp.where(((dz >= 0) & (dz < k))[..., None, None], wg, 0.0)
        # (..., t, i, cin, j, cout) -> (..., t, f*cin, f*cout)
        perm = tuple(range(d - 1)) + (d - 1, d, d + 2, d + 1, d + 3)
        wf = wg.transpose(perm).reshape((k,) * (d - 1) + (t, f * cin, f * self.features))

        dn = ("NHWDC", "HWDIO", "NHWDC") if d == 3 else ("NHWC", "HWIO", "NHWC")
        out = jax.lax.conv_general_dilated(
            xf.astype(self.dtype),
            wf.astype(self.dtype),
            window_strides=tuple(self.stride[:-1]) + (s,),
            padding=[(p, p)] * (d - 1) + [(0, 0)],
            dimension_numbers=dn,
        )
        out = out + jnp.tile(b, f).astype(self.dtype)
        out = out.reshape(out.shape[:-2] + (out.shape[-2] * f, self.features))
        return out[..., :z_out, :]


def _zband_policy(cin: int, z_len: int, ks: int) -> bool:
    """Full-z banding at the tiny-cin stem: DEMOTED to opt-in by the round-4
    hardware A/B.

    The banded GEMM gets MXU-shaped contractions (K = z*cin, N = z_out*cout)
    instead of XLA's lane-padded small-channel 3D conv, at a ~z/ks FLOP
    inflation. The theory said cin<=4 pays; the chip said otherwise: with the
    rest of the round-4 program in place, the full LIDC train step measured
    245.0 ms with the stem zband OFF vs 263.9 ms with it ON
    (chip_logs_r4/ab_nozband.log vs ab_base.log) — a ~19 ms/step
    pessimization, so the auto policy is now opt-in via ``MDT_ZBAND=1``
    (``MDT_NO_ZBAND=1`` still forces it off, for old queue scripts).
    The path stays exactness-tested and param-compatible.
    """
    import os

    if os.environ.get("MDT_NO_ZBAND") == "1":
        return False
    if os.environ.get("MDT_ZBAND") != "1":
        return False
    return cin <= 4 and z_len >= 32 and ks >= 3


class _StemPallasConv(nn.Module):
    """Pallas banded-GEMM evaluation of a tiny-cin 3D conv (same math as
    ``_ZBandedConv`` with hand-placed memory movement — see
    ``ops/stem_conv_pallas.py``). Param names/shapes match ``nn.Conv``, so
    checkpoints interchange with every other dispatch path. Opt-in via
    ``MDT_STEM_PALLAS=1`` pending the hardware A/B (tools/chip_queue.sh)."""

    features: int
    ks: int
    stride: tuple
    kernel_init: object
    dtype: object

    @nn.compact
    def __call__(self, x):
        from medicaldetectiontoolkit_tpu.ops import stem_conv_pallas as scp

        w = self.param(
            "kernel", self.kernel_init,
            (self.ks,) * 3 + (x.shape[-1], self.features), jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        interpret = jax.default_backend() == "cpu"
        return scp.stem_conv3d(
            x.astype(self.dtype), w.astype(self.dtype), b.astype(self.dtype),
            self.stride[0], self.stride[1], interpret,
        )


class _ZBandedConv(nn.Module):
    """3D conv computed as a 2D conv with the ENTIRE z axis folded into the
    contraction: out[..., zo, co] = sum_{zi, ci} x[..., zi, ci] * T[zi*ci, zo*co]
    with T z-banded from the logical kernel
    (``T[(zi,ci),(zo,co)] = w[dy,dx, zi - sz*zo + p, ci, co]``, zero off-band).

    Mathematically exact reformulation of ``nn.Conv`` for SAME-style padding
    (pad == ks//2 on z): the z padding is implicit in the band (contributions
    from zi outside [0, Z) simply don't exist). Param names/shapes are
    identical to ``nn.Conv`` — checkpoints interchange with the unfolded and
    z-folded paths, and gradients flow to the logical params through the
    band gather (no custom VJP needed).

    Why: for cin<=4 the minor (lane) dims XLA sees in a 3D conv are 1-4 wide
    and pad to 128 (round-2's binding constraint). Here the 2D conv's input
    channel dim is Z*cin (64-256) and its output dim is Zo*cout (~1152 at
    LIDC stem geometry) — both MXU-tileable, no 32x lane padding anywhere.
    """

    features: int
    ks: int
    stride: tuple  # (sy, sx, sz)
    pad: int
    kernel_init: object
    dtype: object

    @nn.compact
    def __call__(self, x):
        k, p = self.ks, self.pad
        sy, sx, sz = self.stride
        Z, cin = x.shape[-2], x.shape[-1]
        cout = self.features
        w = self.param("kernel", self.kernel_init, (k, k, k, cin, cout), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (cout,), jnp.float32)

        zo = -(-Z // sz)  # SAME: ceil(Z / sz)
        dz = jnp.arange(Z)[:, None] - sz * jnp.arange(zo)[None, :] + p  # (Z, zo)
        wg = w[:, :, jnp.clip(dz, 0, k - 1), :, :]  # (k, k, Z, zo, cin, cout)
        wg = jnp.where(((dz >= 0) & (dz < k))[None, None, :, :, None, None], wg, 0.0)
        # (k, k, Z, cin, zo, cout) -> (k, k, Z*cin, zo*cout)
        w2 = wg.transpose(0, 1, 2, 4, 3, 5).reshape(k, k, Z * cin, zo * cout)

        x2 = x.reshape(x.shape[:-2] + (Z * cin,))  # z-minor, channel-last: free
        out = jax.lax.conv_general_dilated(
            x2.astype(self.dtype),
            w2.astype(self.dtype),
            window_strides=(sy, sx),
            padding=[(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        out = out + jnp.tile(b, zo).astype(self.dtype)
        return out.reshape(out.shape[:-1] + (zo, cout))


class _ZBlockBandedConv(nn.Module):
    """3D conv as a batched 2D conv over z-blocks of ``G`` outputs each.

    Middle ground between ``_ZFoldedConv`` (channels x f, banded taps) and
    ``_ZBandedConv`` (whole z in the contraction, ~z/ks FLOP inflation —
    only viable at tiny cin): each block of G output z-positions contracts
    over its Hb = G*sz + ks - sz input span, so the 2D conv sees
    K = Hb*cin, N = G*cout, and blocks ride the BATCH dim (B*nb). At
    cin=cout=18, G=7 gives N=126~128 and inflation only
    (Hb/ks)*(pad factors) ~ 2.2x of logical FLOPs with MXU-aligned tiles —
    vs the ~10% MXU the lane-padded direct 3D conv achieves.

    Mathematically exact for SAME geometry (pad == ks//2 on z); params
    identical to ``nn.Conv`` (checkpoints interchange); gradients flow
    through the band gather. Opt-in (``zblock``/``MDT_ZBLOCK_G``) until the
    chip A/B lands.
    """

    features: int
    ks: int
    stride: tuple  # (sy, sx, sz)
    pad: int
    G: int  # output z-positions per block
    kernel_init: object
    dtype: object

    @nn.compact
    def __call__(self, x):
        k, p, G = self.ks, self.pad, self.G
        sy, sx, sz = self.stride
        B = x.shape[0]
        Y, X, Z, cin = x.shape[-4:]
        cout = self.features
        w = self.param("kernel", self.kernel_init, (k, k, k, cin, cout), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (cout,), jnp.float32)

        zo = -(-Z // sz)  # SAME: ceil(Z / sz)
        nb = -(-zo // G)
        Hb = G * sz + k - sz  # input span feeding one block of G outputs
        # block g's outputs [gG, gG+G) read padded-z inputs [gG*sz, gG*sz+Hb)
        L = (nb - 1) * G * sz + Hb
        xp = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(p, max(L - p - Z, 0)), (0, 0)])
        blocks = jnp.stack(
            [xp[..., g * G * sz : g * G * sz + Hb, :] for g in range(nb)], axis=1
        )  # (B, nb, Y, X, Hb, cin)
        xb = blocks.reshape(B * nb, Y, X, Hb * cin)

        # band: T[(hb,ci),(go,co)] = w[dy,dx, hb - sz*go, ci, co], zero off-band
        dz = jnp.arange(Hb)[:, None] - sz * jnp.arange(G)[None, :]  # (Hb, G)
        wg = w[:, :, jnp.clip(dz, 0, k - 1), :, :]  # (k, k, Hb, G, cin, cout)
        wg = jnp.where(((dz >= 0) & (dz < k))[None, None, :, :, None, None], wg, 0.0)
        w2 = wg.transpose(0, 1, 2, 4, 3, 5).reshape(k, k, Hb * cin, G * cout)

        out = jax.lax.conv_general_dilated(
            xb.astype(self.dtype),
            w2.astype(self.dtype),
            window_strides=(sy, sx),
            padding=[(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        Yo, Xo = out.shape[1], out.shape[2]
        out = out.reshape(B, nb, Yo, Xo, G, cout).transpose(0, 2, 3, 1, 4, 5)
        out = out.reshape(B, Yo, Xo, nb * G, cout)[..., :zo, :]
        return out + b.astype(self.dtype)


class ConvND(nn.Module):
    """conv + optional norm + optional nonlinearity; the NDConvGenerator analog
    (``utils/model_utils.py:732-781``), rank-polymorphic via ``dim``.

    ``zfold``: 0 = auto (z space-to-depth fold small-channel 3D convs on TPU
    backends, see ``_zfold_policy``; tiny-cin 3D convs upgrade further to the
    full-z banded path, see ``_zband_policy``), 1 = never, >1 = explicit
    factor. ``zband``: None = auto, True/False = force."""

    dim: int
    features: int
    ks: int = 1
    stride: object = 1  # int or per-axis tuple
    pad: int = 0
    norm: Optional[str] = None
    relu: Optional[str] = "relu"
    weight_init: Optional[str] = None
    dtype: object = jnp.float32
    zfold: int = 0
    zband: Optional[bool] = None
    zblock: Optional[int] = None  # z-outputs per block; None = env auto, 0 = off

    @nn.compact
    def __call__(self, x):
        stride = self.stride if isinstance(self.stride, (tuple, list)) else (self.stride,) * self.dim
        stride = tuple(stride)
        # All z reformulations assume nn.Conv's SAME geometry (z_out =
        # ceil(Z/s), zero right-pad), which only equals explicit padding when
        # pad == ks//2. Every current call site satisfies this; other
        # geometries fall back to nn.Conv rather than silently diverging.
        same_geom = self.pad == self.ks // 2
        if self.dim == 3 and same_geom:
            import os

            from medicaldetectiontoolkit_tpu.ops.stem_conv_pallas import stem_pallas_viable

            from medicaldetectiontoolkit_tpu.parallel.mesh import _SPATIAL_TRACE_CTX

            if (
                os.environ.get("MDT_STEM_PALLAS") == "1"
                and not _SPATIAL_TRACE_CTX  # GSPMD can't partition the kernel;
                # under spatial sharding fall through to the XLA zband path
                and stem_pallas_viable(x.shape, self.ks, stride, self.pad)
            ):
                x = _StemPallasConv(
                    features=self.features, ks=self.ks, stride=stride,
                    kernel_init=_kinit(self.weight_init), dtype=self.dtype,
                    name="Conv_0",
                )(x)
                return self._finish(x)
        band = self.zband
        if band is None:
            band = (
                self.dim == 3 and _zfold_backend_default()
                and _zband_policy(x.shape[-1], x.shape[-2], self.ks)
            )
        if band and self.dim == 3 and same_geom:
            x = _ZBandedConv(
                features=self.features, ks=self.ks, stride=stride, pad=self.pad,
                kernel_init=_kinit(self.weight_init), dtype=self.dtype, name="Conv_0",
            )(x)
            return self._finish(x)
        G = self.zblock
        if G is None and self.dim == 3 and _zfold_backend_default():
            # auto policy, PROMOTED from env opt-in by the round-4 chip A/B
            # (chip_logs_r4/ab_zblock7.log: full LIDC step 244.0 ms vs 263.9
            # base = 7.5% win, meeting the <=0.95x promotion rule written in
            # tools/chip_queue.sh): mid-cin 3D convs where zband's z/ks
            # inflation is prohibitive but lane padding still starves the
            # MXU. G=7 is the measured configuration (N = G*cout = 126 at
            # the cin-18 stem). MDT_ZBLOCK_G overrides (0 disables).
            import os

            # empty MDT_ZBLOCK_G disables, same as "0" (an unset-looking value
            # must never silently enable an auto policy)
            env_g = os.environ.get("MDT_ZBLOCK_G")
            if 4 < x.shape[-1] <= 36 and x.shape[-2] >= 32 and self.ks >= 3:
                G = 7 if env_g is None else int(env_g or 0)
        if G and self.dim == 3 and same_geom:
            x = _ZBlockBandedConv(
                features=self.features, ks=self.ks, stride=stride, pad=self.pad,
                G=G, kernel_init=_kinit(self.weight_init), dtype=self.dtype, name="Conv_0",
            )(x)
            return self._finish(x)
        f = self.zfold
        if f == 0 and _zfold_backend_default():
            f = _zfold_policy(x.shape[-1], self.features, x.shape[-2], self.ks, stride[-1])
        if f > 1 and not same_geom:
            f = 1
        if f > 1:
            x = _ZFoldedConv(
                dim=self.dim, features=self.features, ks=self.ks, stride=stride,
                pad=self.pad, zfold=f, kernel_init=_kinit(self.weight_init),
                dtype=self.dtype, name="Conv_0",
            )(x)
        else:
            x = nn.Conv(
                self.features,
                kernel_size=(self.ks,) * self.dim,
                strides=stride,
                padding=[(self.pad, self.pad)] * self.dim,
                kernel_init=_kinit(self.weight_init),
                dtype=self.dtype,
            )(x)
        return self._finish(x)

    def _finish(self, x):
        if self.norm == "instance_norm":
            x = nn.GroupNorm(num_groups=None, group_size=1, dtype=self.dtype)(x)
        elif self.norm == "batch_norm":
            # batch-stats-free variant: normalizing over batch+spatial per
            # channel each step (equivalent to train-mode BN without running
            # averages; inference uses the same statistics).
            x = nn.GroupNorm(num_groups=1, use_bias=True, use_scale=True, dtype=self.dtype)(x)
        elif self.norm is not None:
            raise ValueError(f"unknown norm '{self.norm}'")
        if self.relu == "relu":
            x = nn.relu(x)
        elif self.relu == "leaky_relu":
            x = nn.leaky_relu(x, negative_slope=0.01)
        elif self.relu is not None:
            raise ValueError(f"unknown relu '{self.relu}'")
        return x


class ResBlock(nn.Module):
    """Bottleneck block: 1x1 (stride) -> 3x3 -> 1x1 x4 + residual
    (``models/backbone.py:183-206``)."""

    dim: int
    planes: int
    stride: object = 1
    downsample: bool = False
    norm: Optional[str] = None
    relu: str = "relu"
    weight_init: Optional[str] = None
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dim=self.dim, norm=self.norm, weight_init=self.weight_init, dtype=self.dtype)
        out = ConvND(features=self.planes, ks=1, stride=self.stride, relu=self.relu, **kw)(x)
        out = ConvND(features=self.planes, ks=3, pad=1, relu=self.relu, **kw)(out)
        out = ConvND(features=self.planes * 4, ks=1, relu=None, **kw)(out)
        if self.downsample:
            residual = ConvND(features=self.planes * 4, ks=1, stride=self.stride, relu=None, **kw)(x)
        else:
            residual = x
        out = out + residual
        return nn.relu(out) if self.relu == "relu" else nn.leaky_relu(out, 0.01)


class _RepeatedResBlock(nn.Module):
    """Scan body: one identity-shaped ResBlock per iteration.

    The 2nd..nth blocks of every ResNet stage share shapes, so they are run
    under ``nn.scan`` with stacked params — XLA compiles the block ONCE per
    stage instead of once per block, which matters here because compilation
    goes through a remote TPU compile service (3D conv graphs are expensive
    to compile). Runtime semantics are identical to sequential blocks.
    """

    dim: int
    planes: int
    norm: Optional[str]
    relu: str
    weight_init: Optional[str]
    dtype: object

    @nn.compact
    def __call__(self, carry, _):
        out = ResBlock(
            dim=self.dim, planes=self.planes, norm=self.norm, relu=self.relu,
            weight_init=self.weight_init, dtype=self.dtype,
        )(carry)
        return out, None


def maybe_remat(cls, remat: bool):
    """nn.remat that keeps the original module name.

    flax names transformed classes "Checkpoint<name>", which would change the
    param PyTree keys — toggling remat would invalidate checkpoints. Restoring
    __name__ keeps param trees identical with and without remat.
    """
    if not remat:
        return cls
    wrapped = nn.remat(cls)
    wrapped.__name__ = cls.__name__
    wrapped.__qualname__ = cls.__qualname__
    return wrapped


def res_stage(x, planes, n_blocks, stride, dim, norm, relu, weight_init, dtype, remat=False,
              stage_mode="unroll"):
    """First (strided, projected) block + identity blocks.

    With ``remat``, block activations are rematerialized in the backward pass
    (jax.checkpoint) — the standard TPU trade of FLOPs for HBM, needed to fit
    3D volumes at training batch sizes.

    ``stage_mode`` selects how the identity blocks execute:
      * "scan"   — rolled ``nn.scan`` with stacked params: one block body to
        compile (fastest through the remote TPU compile service) but the
        while-loop accumulates stacked param grads via dynamic-update-slice
        every iteration plus per-iteration relayout copies;
      * "unroll" — ``nn.scan`` fully unrolled: same stacked param tree (and
        checkpoint layout) and one-body trace, straight-line device code;
      * "loop"   — plain Python loop, per-block param subtrees (no stacked
        axis at all); trace and param names differ from scan/unroll.
    """
    first = maybe_remat(ResBlock, remat)
    x = first(
        dim=dim, planes=planes, stride=stride, downsample=True, norm=norm, relu=relu,
        weight_init=weight_init, dtype=dtype,
    )(x)
    if n_blocks > 1:
        if stage_mode == "loop":
            blk = maybe_remat(ResBlock, remat)
            for _ in range(n_blocks - 1):
                x = blk(
                    dim=dim, planes=planes, norm=norm, relu=relu,
                    weight_init=weight_init, dtype=dtype,
                )(x)
        else:
            body = maybe_remat(_RepeatedResBlock, remat)
            scanned = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=n_blocks - 1,
                unroll=(n_blocks - 1) if stage_mode == "unroll" else 1,
            )(dim=dim, planes=planes, norm=norm, relu=relu, weight_init=weight_init, dtype=dtype)
            x, _ = scanned(x, None)
    return x


def _nearest_up(x, factor):
    """Nearest-neighbor upsample by integer factors per spatial axis
    (torch F.interpolate default mode)."""
    for ax, f in enumerate(factor):
        if f != 1:
            x = jnp.repeat(x, f, axis=ax + 1)
    return x


def _linear_up(x, factor):
    """(bi/tri)linear upsample, half-pixel centers (align_corners=False)."""
    spatial = tuple(int(s * f) for s, f in zip(x.shape[1:-1], factor))
    new_shape = (x.shape[0],) + spatial + (x.shape[-1],)
    return jax.image.resize(x, new_shape, method="linear")


def _maxpool(x, dim):
    window = (3,) * dim
    strides = (2, 2, 1) if dim == 3 else (2, 2)
    return nn.max_pool(x, window, strides=strides, padding=[(1, 1)] * dim)


class FPN(nn.Module):
    """Feature pyramid: returns [P2..P5(,P6)] or [P0, P2..] if operate_stride1.

    Output order matches the reference's ``out_list``
    (``models/backbone.py:129-179``): indexing by ``cf.pyramid_levels`` works
    identically.
    """

    dim: int
    n_channels: int
    start_filts: int
    end_filts: int
    res_architecture: str = "resnet50"
    norm: Optional[str] = None
    relu: str = "relu"
    sixth_pooling: bool = False
    operate_stride1: bool = False
    weight_init: Optional[str] = None
    dtype: object = jnp.float32
    # rematerialize stage activations in the backward pass (fit 3D volumes)
    remat: bool = False
    # identity-block execution: "scan" | "unroll" | "loop" (see res_stage)
    stage_mode: str = "unroll"

    @nn.compact
    def __call__(self, x):
        d = self.dim
        sf = self.start_filts
        n_blocks = [3, 4, {"resnet50": 6, "resnet101": 23}[self.res_architecture], 3]
        kw = dict(dim=d, norm=self.norm, relu=self.relu, weight_init=self.weight_init, dtype=self.dtype)
        bkw = dict(
            dim=d, norm=self.norm, relu=self.relu, weight_init=self.weight_init, dtype=self.dtype,
            remat=self.remat, stage_mode=self.stage_mode,
        )
        stem_stride = (2, 2, 1) if d == 3 else 2
        Stem = maybe_remat(ConvND, self.remat)

        if self.operate_stride1:
            c0 = Stem(features=sf, ks=3, pad=1, **kw)(x)
            c0 = Stem(features=sf, ks=3, pad=1, **kw)(c0)
            c1 = Stem(features=sf, ks=7, stride=stem_stride, pad=3, **kw)(c0)
        else:
            c0 = x
            c1 = Stem(features=sf, ks=7, stride=stem_stride, pad=3, **kw)(x)

        # space_fence: under spatial partitioning, stages whose output Y
        # extent is small are forced space-replicated — GSPMD miscomputes
        # the partitioned backbone at tiny stage extents with >1 data shard
        # (parallel/mesh.py module comment has the measured boundary; no-op
        # outside spatially-partitioned jits)
        from medicaldetectiontoolkit_tpu.parallel.mesh import space_fence

        c2 = _maxpool(c1, d)
        c2 = res_stage(space_fence(c2), sf, n_blocks[0], 1, **bkw)
        c3 = res_stage(space_fence(c2, next_stride=2), sf * 2, n_blocks[1], 2, **bkw)
        c4 = res_stage(space_fence(c3, next_stride=2), sf * 4, n_blocks[2], 2, **bkw)
        c5 = res_stage(space_fence(c4, next_stride=2), sf * 8, n_blocks[3], 2, **bkw)

        lat = dict(dim=d, norm=None, relu=None, weight_init=self.weight_init, dtype=self.dtype)
        up2 = (2,) * d

        if self.sixth_pooling:
            c6 = res_stage(c5, sf * 16, n_blocks[3], 2, **bkw)
            p6_pre = ConvND(features=self.end_filts, ks=1, **lat)(c6)
            p5_pre = ConvND(features=self.end_filts, ks=1, **lat)(c5) + _nearest_up(p6_pre, up2)
        else:
            p5_pre = ConvND(features=self.end_filts, ks=1, **lat)(c5)

        p4_pre = ConvND(features=self.end_filts, ks=1, **lat)(c4) + _nearest_up(p5_pre, up2)
        p3_pre = ConvND(features=self.end_filts, ks=1, **lat)(c3) + _nearest_up(p4_pre, up2)
        p2_pre = ConvND(features=self.end_filts, ks=1, **lat)(c2) + _nearest_up(p3_pre, up2)

        p2 = ConvND(features=self.end_filts, ks=3, pad=1, **lat)(p2_pre)
        p3 = ConvND(features=self.end_filts, ks=3, pad=1, **lat)(p3_pre)
        p4 = ConvND(features=self.end_filts, ks=3, pad=1, **lat)(p4_pre)
        p5 = ConvND(features=self.end_filts, ks=3, pad=1, **lat)(p5_pre)
        out = [p2, p3, p4, p5]

        if self.sixth_pooling:
            out.append(ConvND(features=self.end_filts, ks=3, pad=1, **lat)(p6_pre))

        if self.operate_stride1:
            up_aniso = (2, 2, 1) if d == 3 else (2, 2)
            Lat = maybe_remat(ConvND, self.remat)  # full-res levels
            p1_pre = Lat(features=self.end_filts, ks=1, **lat)(c1) + _linear_up(p2_pre, up_aniso)
            p0_pre = Lat(features=self.end_filts, ks=1, **lat)(c0) + _linear_up(p1_pre, up_aniso)
            p0 = Lat(features=self.end_filts, ks=3, pad=1, **lat)(p0_pre)
            out = [p0] + out

        return out


def fpn_from_cf(cf):
    """Build the FPN module from a config attribute bag."""
    return FPN(
        dim=cf.dim,
        n_channels=cf.n_channels,
        start_filts=cf.start_filts,
        end_filts=cf.end_filts,
        res_architecture=cf.res_architecture,
        norm=cf.norm,
        relu=cf.relu,
        sixth_pooling=cf.sixth_pooling,
        operate_stride1=cf.operate_stride1,
        weight_init=cf.weight_init,
        dtype=getattr(cf, "compute_dtype", jnp.float32),
        stage_mode=getattr(cf, "stage_mode", "unroll"),
    )
