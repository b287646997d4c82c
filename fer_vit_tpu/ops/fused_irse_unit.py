"""Pallas TPU fused IR-SE bottleneck residual branch.

Computes, in ONE kernel (one HBM read of x, one HBM write of the result):

    res = bn1_affine(x)            # a1·x + b1 (frozen eval-mode BN)
    res = conv1_3x3_s1(res)        # Cin → Cout, zero-pad 1
    res = PReLU(res)               # per-channel alpha
    res = conv2_3x3(res) + b2      # Cout → Cout, stride 1 or 2 (folded BN)
    sums = Σ_spatial res           # the SE squeeze, emitted as (B, Cout)

i.e. everything in the reference's ``bottleneck_IR_SE`` between the input
and the SE excitation (reference architecture loaded by
models_fer_vit/encoder_wrapper.py; see fer_vit_tpu/encoders/irse.py). The
SE MLP, sigmoid scale and shortcut add remain tiny XLA ops.

Why a kernel: profiled on v5e (PARITY.md round-2), XLA runs the trunk's
stride-2 convs at 21-27 TF/s (batch-minor layouts starve the MXU below 128
channels) and spends ~60 ms/step in separate bn1 / PReLU / glue passes over
multi-GB activations. Graph-level rewrites (space-to-depth, polyphase) were
measured and LOSE end-to-end because XLA materializes their data
restructuring. This kernel owns the data movement instead:

* **kw-packed K**: each conv is 1 MXU dot per row-window — the 3 column
  taps live in a (rows·W, 3·Cin) operand (exact im2col over the width
  axis only).
* **kh-packed N**: the 3 row taps are stacked into the weight matrix's
  output dim, giving one dot with N = 3·Cout — full MXU lane utilization
  even for Cout = 64 — followed by a 3-term row-shifted add (VPU).
  Total MACs are exactly the conv's 9·Cin·Cout per output element.
* Conv1 and conv2 are chained in VMEM: the PReLU'd intermediate never
  touches HBM (saves its full write+read — 8.6 GB/step for body_0 at
  batch 512).
* Stride 2: output rows select the even phase via major-dim-only
  reshapes (free); output columns via f32 ``tpu.strided_load`` from a
  VMEM scratch.

Every data-movement idiom here was validated against Mosaic on hardware
(v5e) individually first; the constraints that shaped the design:

* no ``dynamic_slice`` on values → the grid-window alignment happens in
  the DMA's *destination* offset into a 4-row-padded scratch;
* ``tpu.concatenate`` rejects operands whose layouts carry sublane
  offsets (i.e. shifted window slices) → the packed operand is built by
  *storing* shifted slices into lane blocks of a scratch ref (stores
  normalize layouts; loads/values keep their offsets);
* no reshape may split the lane dim → per-tap parts are extracted from
  the 2D dot result with plain lane slices (64-offset slices verified);
* ``tpu.strided_load`` is 32-bit-only → the conv2 stride-2 column
  selection reads an f32 copy of the intermediate.

Grid: (B, H_out/rb); each instance DMAs a (s·rb + 5−s)-row window of one
image (halo 2 rows for the chained 3×3s), computes rb output rows, and
accumulates its SE partial sum into the (B, 1, Cout) output block.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_conv_weights(w: jax.Array) -> jax.Array:
    """(3, 3, Cin, Cout) → (3·Cin, 3·Cout) with kw packed into the
    contraction dim and kh packed into the output dim:
    ``wp[kw·Cin + ci, kh·Cout + co] = w[kh, kw, ci, co]``."""
    kh, kw, cin, cout = w.shape
    assert kh == 3 and kw == 3, w.shape
    return w.transpose(1, 2, 0, 3).reshape(3 * cin, 3 * cout)


def _tap_parts(xw_ref, wp, rows: int, wd: int, cout: int):
    """One MXU dot of the packed operand against the packed weights; the
    three per-row-tap partials come back as 2D lane slices, reshaped
    (rows, wd, cout) f32."""
    t = jnp.dot(xw_ref[...].reshape(rows * wd, wp.shape[0]), wp,
                preferred_element_type=jnp.float32)
    return [t[:, k * cout:(k + 1) * cout].reshape(rows, wd, cout)
            for k in range(3)]


def _kernel(x_hbm, a1_ref, b1_ref, w1p_ref, alpha_ref, w2p_ref, b2_ref,
            out_ref, sums_ref, xs_ref, xw1_ref, y1s_ref, xw2_ref, sem, *,
            H: int, W: int, cin: int, cout: int, stride: int, rb: int,
            out_dtype):
    bidx = pl.program_id(0)
    r0 = pl.program_id(1)
    nb = pl.num_programs(0)
    nr = pl.num_programs(1)
    n_x = stride * rb + (5 - stride)  # s1: rb+4, s2: 2·rb+3

    # Input windows are DMA'd with DOUBLE BUFFERING: at step i the window
    # for step i+1 is prefetched into the other xs slot while i computes,
    # hiding the HBM read behind the MXU work. Alignment happens IN the
    # DMA: global row g lands at scratch index g − x_lo + 2, so the
    # static read [2, 2+n_x) sees exactly rows x_lo … x_lo+n_x−1 (when
    # the window incl. halo exceeds the image, the whole image is copied
    # and out-of-range scratch rows are garbage — masked after bn1).
    step = bidx * nr + r0

    def start_dma(s: jax.Array, slot: jax.Array):
        b_s = s // nr
        xl = stride * (s % nr) * rb - 2
        n_copy = min(n_x, H)
        st = jnp.clip(xl, 0, H - n_copy)
        dst0 = st - xl + 2  # in [0, 4]
        pltpu.make_async_copy(
            x_hbm.at[b_s, pl.ds(st, n_copy)],
            xs_ref.at[slot, pl.ds(dst0, n_copy)],
            sem.at[slot]).start()

    @pl.when(step == 0)
    def _():
        start_dma(step, step % 2)

    @pl.when(step + 1 < nb * nr)
    def _():
        start_dma(step + 1, (step + 1) % 2)

    slot = step % 2
    n_copy = min(n_x, H)
    pltpu.make_async_copy(
        x_hbm.at[0, pl.ds(0, n_copy)],
        xs_ref.at[slot, pl.ds(0, n_copy)],
        sem.at[slot]).wait()

    x_lo = stride * r0 * rb - 2
    xa = xs_ref[slot][2:2 + n_x]

    # bn1 affine in f32, then zero the out-of-image halo rows.
    a1 = a1_ref[0].astype(jnp.float32)
    b1 = b1_ref[0].astype(jnp.float32)
    xa = xa.astype(jnp.float32) * a1 + b1
    row_g = x_lo + jax.lax.broadcasted_iota(jnp.int32, (n_x, 1, 1), 0)
    xa = jnp.where((row_g >= 0) & (row_g < H), xa, 0.0)
    xa = xa.astype(xs_ref.dtype)

    # conv1 operand: shifted width-windows of zero-padded xa stored into
    # the three Cin lane blocks of xw1 (operand col w, tap kw reads xa col
    # w + kw − 1; border cols are zeros).
    z1 = jnp.zeros((n_x, 1, cin), xa.dtype)
    xw1_ref[:, 1:W, 0 * cin:1 * cin] = xa[:, 0:W - 1]
    xw1_ref[:, 0:1, 0 * cin:1 * cin] = z1
    xw1_ref[:, :, 1 * cin:2 * cin] = xa
    xw1_ref[:, 0:W - 1, 2 * cin:3 * cin] = xa[:, 1:W]
    xw1_ref[:, W - 1:W, 2 * cin:3 * cin] = z1

    p0, p1, p2 = _tap_parts(xw1_ref, w1p_ref[...], n_x, W, cout)
    yr = n_x - 2  # conv1 output rows (incl. conv2 halo)
    y1 = p0[0:yr] + p1[1:yr + 1] + p2[2:yr + 2]

    alpha = alpha_ref[0].astype(jnp.float32)
    y1 = jnp.where(y1 >= 0, y1, alpha * y1)
    # conv2's zero padding: halo rows outside the image are structurally
    # zero, NOT conv1 evaluated on the border (local y1 row j is global
    # x_lo + 1 + j).
    y1_g = x_lo + 1 + jax.lax.broadcasted_iota(jnp.int32, (yr, 1, 1), 0)
    y1 = jnp.where((y1_g >= 0) & (y1_g < H), y1, 0.0)

    # conv2 operand, same packing over the PReLU'd intermediate.
    if stride == 1:
        w2in = W
        y1b = y1.astype(xs_ref.dtype)
        z2 = jnp.zeros((yr, 1, cout), y1b.dtype)
        xw2_ref[:, 1:W, 0 * cout:1 * cout] = y1b[:, 0:W - 1]
        xw2_ref[:, 0:1, 0 * cout:1 * cout] = z2
        xw2_ref[:, :, 1 * cout:2 * cout] = y1b
        xw2_ref[:, 0:W - 1, 2 * cout:3 * cout] = y1b[:, 1:W]
        xw2_ref[:, W - 1:W, 2 * cout:3 * cout] = z2
    else:
        w2in = W // 2
        # out col c reads y1 cols 2c−1, 2c, 2c+1 = padded cols 2c, 2c+1,
        # 2c+2; strided f32 loads pick the column phases from scratch.
        # ``tpu.strided_load`` requires the base memref's last dim to be
        # exactly 128, so the scratch carries cout as G groups of 128
        # lanes (cg = cout for small interpret-mode test shapes).
        cg = 128 if cout % 128 == 0 else cout
        G = cout // cg
        zc = jnp.zeros((yr, 1, cg), jnp.float32)
        for g in range(G):
            y1s_ref[g, :, 1:W + 1, :] = y1[:, :, g * cg:(g + 1) * cg]
            y1s_ref[g, :, 0:1, :] = zc
            y1s_ref[g, :, W + 1:W + 2, :] = zc
        for d in range(3):
            for g in range(G):
                xw2_ref[:, :, d * cout + g * cg:d * cout + (g + 1) * cg] = (
                    y1s_ref[g, :, pl.Slice(d, w2in, 2), :]
                    .astype(xs_ref.dtype))

    q0, q1, q2 = _tap_parts(xw2_ref, w2p_ref[...], yr, w2in, cout)
    if stride == 1:
        out = q0[0:rb] + q1[1:rb + 1] + q2[2:rb + 2]
    else:
        # out row r reads y1 rows 2r−1, 2r, 2r+1 → q_k row 2r+k, i.e.
        # out = q0[2r] + q1[2r+1] + q2[2r+2]. Select the phase via
        # MAJOR-dim-only slicing + reshape (yr = 2rb+1 rows, so a 2rb-row
        # window starting at lo ∈ {0, 1} always fits):
        # phase(q, lo, j)[i] = q[lo + 2i + j].
        def phase(q, lo, j):
            return q[lo:lo + 2 * rb].reshape(rb, 2, w2in, cout)[:, j]

        out = phase(q0, 0, 0) + phase(q1, 0, 1) + phase(q2, 1, 1)

    out = out + b2_ref[0].astype(jnp.float32)
    out_ref[0] = out.astype(out_dtype)

    partial = jnp.sum(out, axis=(0, 1))[None, None].astype(jnp.float32)

    @pl.when(r0 == 0)
    def _():
        sums_ref[...] = partial

    @pl.when(r0 != 0)
    def _():
        sums_ref[...] += partial


def _pick_rb(H2: int, W: int, cin: int, cout: int, stride: int) -> int:
    """Largest output-row block (divisor of H2) whose working set fits the
    VMEM budget. Bigger blocks amortize the 2-row halo and lengthen the
    MXU dots. The budget is calibrated on hardware: this estimate
    undercounts Mosaic's real working set ~2× (rb=64 at 64px/128ch —
    ~30 MB here — exhausts the 128 MB VMEM; rb=32 compiles), so 24 MB
    keeps the true footprint comfortably inside."""
    budget = 24 * 1024 * 1024
    for rb in (64, 32, 16, 8, 4, 2, 1):
        if H2 % rb:
            continue
        n_x = stride * rb + (5 - stride)
        yr = n_x - 2
        w2in = W // stride
        vmem = (
            2 * (n_x + 4) * W * cin * 2       # xs ×2 slots (bf16)
            + (n_x + 4) * W * cin * 2         # xs full load
            + n_x * W * 3 * cin * 2 * 2       # xw1 + load
            + n_x * W * 3 * cout * 4          # t1 (f32)
            + yr * W * cout * 4               # y1 (f32)
            + (yr * (W + 2) * cout * 4 if stride == 2 else 0)  # y1s
            + yr * w2in * 3 * cout * 2 * 2    # xw2 + load
            + yr * w2in * 3 * cout * 4        # t2 (f32)
            + rb * w2in * cout * 4            # out f32
            + 2 * (3 * cin * 3 * cout + 3 * cout * 3 * cout)  # weights bf16
        )
        if vmem <= budget:
            return rb
    return 1


def _fused_impl(x, a1, b1, w1, alpha, w2, b2, cfg):
    """The pallas_call itself; cfg = (stride, rb, interpret, out_dtype)."""
    stride, rb, interpret, out_dtype = cfg
    B, H, W, cin = x.shape
    cout = w1.shape[-1]
    H2, W2 = H // stride, W // stride
    n_x = stride * rb + (5 - stride)
    yr = n_x - 2
    w2in = W // stride
    if stride == 2:
        cg = 128 if cout % 128 == 0 else cout
        y1s_shape = (cout // cg, yr, W + 2, cg)
    else:
        y1s_shape = (1, 1, 8, 128)  # unused placeholder

    w1p = pack_conv_weights(w1).astype(x.dtype)
    w2p = pack_conv_weights(w2).astype(x.dtype)
    row = lambda v: v.reshape(1, -1)

    kernel = functools.partial(
        _kernel, H=H, W=W, cin=cin, cout=cout, stride=stride, rb=rb,
        out_dtype=out_dtype)
    vspec = lambda shape: pl.BlockSpec(
        shape, lambda b, r: (0,) * len(shape),
        memory_space=pltpu.MemorySpace.VMEM)
    flops_inst = 2 * 9 * (n_x * W * cin * cout + yr * W2 * cout * cout)
    res2, sums = pl.pallas_call(
        kernel,
        grid=(B, H2 // rb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),  # x (HBM)
            vspec((1, cin)), vspec((1, cin)),
            vspec(w1p.shape),
            vspec((1, cout)),
            vspec(w2p.shape), vspec((1, cout)),
        ],
        out_specs=(
            pl.BlockSpec((1, rb, W2, cout), lambda b, r: (b, r, 0, 0),
                         memory_space=pltpu.MemorySpace.VMEM),
            # (B, 1, cout): the TPU lowering requires the block's last two
            # dims to be 8/128-divisible OR equal to the array's — (1, cout)
            # over (B, cout) violates that, (1, 1, cout) over (B, 1, cout)
            # satisfies it exactly.
            pl.BlockSpec((1, 1, cout), lambda b, r: (b, 0, 0),
                         memory_space=pltpu.MemorySpace.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H2, W2, cout), out_dtype),
            jax.ShapeDtypeStruct((B, 1, cout), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, n_x + 4, W, cin), x.dtype),         # xs ×2 slots
            pltpu.VMEM((n_x, W, 3 * cin), x.dtype),            # xw1
            pltpu.VMEM(y1s_shape, jnp.float32),                # y1s (s2)
            pltpu.VMEM((yr, w2in, 3 * cout), x.dtype),         # xw2
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops_inst * B * (H2 // rb),
            bytes_accessed=x.size * x.dtype.itemsize
            + B * H2 * W2 * cout * 2,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(x, row(a1), row(b1), w1p, row(alpha), w2p, row(b2))
    return res2, sums[:, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _fused(x, a1, b1, w1, alpha, w2, b2, cfg):
    return _fused_impl(x, a1, b1, w1, alpha, w2, b2, cfg)


def _fused_fwd(x, a1, b1, w1, alpha, w2, b2, cfg):
    out = _fused_impl(x, a1, b1, w1, alpha, w2, b2, cfg)
    return out, (x, a1, b1, w1, alpha, w2, b2)


def _fused_bwd(cfg, primals, cts):
    """Backward recomputes through the pure-XLA reference — the Pallas
    kernel itself has no reverse-mode rule (the same class of crash the
    round-1 advisor found in fused attention). The encoder is frozen in
    every shipped training path, so this is a safety net, not a hot path.
    """
    stride = cfg[0]
    ct_res2, ct_sums = cts

    def ref_fn(*p):
        return fused_irse_residual_reference(*p, stride=stride)

    _, vjp = jax.vjp(ref_fn, *primals)
    grads = vjp((ct_res2.astype(jnp.float32), ct_sums.astype(jnp.float32)))
    return tuple(g.astype(p.dtype) for g, p in zip(grads, primals))


_fused.defvjp(_fused_fwd, _fused_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("stride", "rb", "interpret", "out_dtype"))
def fused_irse_residual(
    x: jax.Array, a1: jax.Array, b1: jax.Array, w1: jax.Array,
    alpha: jax.Array, w2: jax.Array, b2: jax.Array, *,
    stride: int = 1, rb: int | None = None, interpret: bool = False,
    out_dtype=None,
) -> Tuple[jax.Array, jax.Array]:
    """Fused bn1-affine → conv1 → PReLU → conv2(+bias) → (+SE sums).

    Args:
      x: (B, H, W, Cin) activations (bf16 recommended). On hardware the
        HBM window DMA requires Cin % 128 == 0, and stride 2 requires
        Cout % 128 == 0 (``tpu.strided_load`` base constraint); interpret
        mode accepts any shape.
      a1, b1: (Cin,) eval-mode bn1 affine (``a = γ/√(σ²+ε)``, ``b = β−μa``).
      w1: (3, 3, Cin, Cout) conv1 kernel (no bias — matches the trunk).
      alpha: (Cout,) PReLU slope.
      w2: (3, 3, Cout, Cout) conv2 kernel; b2: (Cout,) its folded-BN bias.
      stride: conv2 stride (1 or 2).

    Differentiable via a custom VJP whose backward runs the XLA
    reference, so accidental use under ``jax.grad`` is slow but correct.

    Returns:
      (res2 (B, H/stride, W/stride, Cout) in ``out_dtype`` (default
      x.dtype), sums (B, Cout) f32 spatial sums of res2 — divide by
      H2·W2 for the SE squeeze mean).
    """
    B, H, W, cin = x.shape
    cout = w1.shape[-1]
    # ValueError (not assert): these gates must survive `python -O` — a
    # violated shape otherwise surfaces as an opaque Mosaic lowering error.
    if w1.shape != (3, 3, cin, cout):
        raise ValueError(f"w1 shape {w1.shape} != (3,3,{cin},{cout})")
    if w2.shape != (3, 3, cout, cout):
        raise ValueError(f"w2 shape {w2.shape} != (3,3,{cout},{cout})")
    if stride not in (1, 2) or H % stride or W % stride:
        raise ValueError(f"bad stride={stride} for H={H}, W={W}")
    import os as _os

    # FERVIT_FUSED_UNGATE=1: probe-only escape hatch to measure what
    # actually happens on ineligible shapes (scripts/probe_fused_unit.py);
    # production callers go through BottleneckIRSE._fused_eligible.
    if not interpret and _os.environ.get("FERVIT_FUSED_UNGATE") != "1":
        if cin % 128:
            raise ValueError(
                f"fused_irse_residual: Cin={cin} — the HBM window DMA "
                "needs Cin % 128 == 0 on TPU")
        if stride == 2 and cout % 128:
            raise ValueError(
                f"fused_irse_residual: stride-2 Cout={cout} needs "
                "Cout % 128 == 0 on TPU")
    H2 = H // stride
    if rb is None:
        rb = _pick_rb(H2, W, cin, cout, stride)
    if H2 % rb:
        raise ValueError(f"row block rb={rb} must divide H2={H2}")
    out_dtype = out_dtype or x.dtype
    return _fused(x, a1, b1, w1, alpha, w2, b2,
                  (stride, rb, interpret, jnp.dtype(out_dtype)))


def fused_irse_residual_reference(x, a1, b1, w1, alpha, w2, b2, *, stride=1):
    """Pure-XLA oracle for the fused kernel (used by tests)."""
    f32 = jnp.float32
    h = x.astype(f32) * a1.astype(f32) + b1.astype(f32)
    dn = ("NHWC", "HWIO", "NHWC")
    h = jax.lax.conv_general_dilated(
        h, w1.astype(f32), (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn)
    h = jnp.where(h >= 0, h, alpha.astype(f32) * h)
    h = jax.lax.conv_general_dilated(
        h, w2.astype(f32), (stride, stride), [(1, 1), (1, 1)],
        dimension_numbers=dn)
    h = h + b2.astype(f32)
    return h, jnp.sum(h, axis=(1, 2))
