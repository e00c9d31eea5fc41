"""Fused decoder output stage: leaky_relu -> 1x1 conv -> reconstruction sums.

The CelebA decoder ends with leaky_relu(Conv_7 out) -> Conv_8 (1x1, C->3)
(/root/reference/codes/models.py:581-586) and the loss immediately reduces
|x - decoded| and (x - decoded)^2 over all pixels (base.py:372-390). The
activation feeding Conv_8 is the step's largest tensor ([B,128,128,C] —
268 MB bf16 at the benchmark shape), and the v5e per-op profile shows XLA
spending THREE passes over it: the forward loss fusion (at the HBM floor),
a dgrad+leaky-mask pass (662 GB/s), and a separate wgrad pass — ~1.55 ms of
the 12.3 ms step.

The structural fix (like the upsample-conv fusion, ops/image.py): the
backward needs x7 = leaky(u) twice — for dW8 = x7^T dout and for the leaky
mask on du — so computing dW8, db8 and du in ONE kernel removes an entire
268 MB read pass, and the tiny [C,3] weight never leaves VMEM between
tiles.

Layout notes (hard-won on v5e):
1. Every 3-channel tensor is carried channel-outer and pixel-flattened
   ([B,3,H*W] in HBM, [1,3,bh*W] blocks). A block with minor dimension 3
   tiles to (8,128) vector registers with 3/128 lanes used — a 42x
   VMEM-footprint and DMA amplification that cost more than the fusion
   saved (measured 22 ms/step vs the 12.7 baseline). Lane-packed blocks
   recovered 6.7 ms; the XLA-side transposes of the small [B,H,W,3]
   tensors cost ~0.1 ms and the decoded->NHWC transpose is dead code in
   the train step (nothing consumes decoded there).
2. Mosaic accepts only plain 2-D single-contracting-dim dot_generals, and
   rejects bf16 comparisons — all reshapes here merge/split sublane dims
   only (layout-free) and compares run in f32.
3. _TRANSPOSED_VIEW feeds the kernel a [H,W,B,C] logical view of u whose
   default layout matches the {3,0,2,1} layout XLA assigns the
   neighbouring convolutions, so the custom-call boundary transposes can
   resolve to bitcasts instead of 268 MB copies.

Numerics match the unfused path: the conv computes in the activation dtype
on the MXU with fp32 accumulation, the result is rounded to the activation
dtype exactly where the unfused decoder materialises it, and the loss sums
accumulate in fp32. Exact-parity tests run in interpret mode on CPU
(tests/test_pallas_output.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False  # flipped by tests on CPU

# Feed the kernel a [H,W,B,C] logical view of u (and produce du the same
# way). XLA lays the 268 MB conv activation out as {3,0,2,1:T(8,128)}
# (minor->major C,B,W,H) for the neighbouring convolutions, while a
# custom call pins operands to the default descending layout — on the
# NHWC logical shape that difference forces full-tensor copies around the
# call. The [H,W,B,C] logical shape's DEFAULT layout describes exactly
# the conv-preferred bytes, so the transposes at the boundary can resolve
# to bitcasts instead of copies.
_TRANSPOSED_VIEW = True

_ALPHA = 0.2  # tf.nn.leaky_relu default (models.py:82)


def _leaky(x):
    # compare in f32: Mosaic rejects bf16 cmpf on v5e
    return jnp.where(x.astype(jnp.float32) > 0, x, _ALPHA * x)


def _pick_bh(h):
    """Rows per tile: keep the [1,bh,W,C] block ~0.5 MB at the benchmark
    shape (W=C=128, bf16); the backward holds u, x7, du and mask as f32
    vectors at once and BH=32 overflows the 16 MB scoped-vmem stack."""
    for bh in (16, 8, 4, 2, 1):
        if h % bh == 0:
            return bh
    return 1


# ---------------------------------------------------------------------------
# forward: dec = round(leaky(u) @ W8 + b8); l1/l2 sums over the batch
# ---------------------------------------------------------------------------

def _fwd_kernel(u_ref, t_ref, w_ref, b_ref, dec_ref, l1_ref, l2_ref,
                *, tview):
    i, j = pl.program_id(0), pl.program_id(1)

    # tview: u arrives as a [bh,W,B,C] block of the [H,W,B,C] view and the
    # 3-channel tensors as (co, bh*W*B) blocks of [Co, H*W*B]
    u = u_ref[...] if tview else u_ref[0]                  # [...,C] act dt
    c = u.shape[-1]
    n = u.size // c
    x7 = _leaky(u).reshape(n, c)                           # layout-free
    w = w_ref[...].astype(u.dtype)                         # [Co,C]
    # NT matmul contracting C -> [Co,n], lane-packed (Mosaic needs plain
    # 2-D single-dim contractions)
    dec = jax.lax.dot_general(
        w, x7, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dec = dec + b_ref[...].astype(jnp.float32)             # [Co,1]
    # round exactly where the unfused decoder materialises its output
    dec = dec.astype(u.dtype).astype(jnp.float32)
    tgt = t_ref[...] if tview else t_ref[0]
    if tview:
        dec_ref[...] = dec
    else:
        dec_ref[0] = dec

    diff = tgt.astype(jnp.float32) - dec                   # [Co,n]

    @pl.when((i == 0) & (j == 0))
    def _init():
        l1_ref[0, 0] = 0.0
        l2_ref[0, 0] = 0.0

    l1_ref[0, 0] += jnp.sum(jnp.abs(diff))
    l2_ref[0, 0] += jnp.sum(diff * diff)


def _pick_bw(w_dim, bsz):
    """Cols per tview tile: n = bw*B pixels, kept ~2048 like the NHWC
    path's bh*W — the backward holds u/x7/du act-dtype vectors, their f32
    compare copies and the [n,C] f32 dgrad accumulator at once, and a
    full-batch row tile (n = 8192) overflows the 16 MB scoped-vmem stack."""
    bw = max(1, min(w_dim, 2048 // max(1, bsz)))
    while w_dim % bw:
        bw -= 1
    return bw


def _u_spec(bsz, h, w_dim, c, bh, bw, tview):
    """u/du block spec: [1,bh,W,C] of NHWC, or [1,bw,B,C] of the
    conv-layout-compatible [H,W,B,C] view (the block's last two dims
    equal the array's, so tiles stay (8,128)-register-packed)."""
    if tview:
        return pl.BlockSpec((1, bw, bsz, c), lambda i, j: (i, j, 0, 0))
    return pl.BlockSpec((1, bh, w_dim, c), lambda i, j: (i, j, 0, 0))


def _c3_spec(co, nb, tview, wblocks=1):
    """dec/target/ddec block spec: (1,co,nb) of [B,Co,H*W], or (co,nb) of
    the pixel-flattened [Co,H*W*B] (grid (H, W/bw) walks its columns in
    row-major order, so the flat block index is i*wblocks + j)."""
    if tview:
        return pl.BlockSpec((co, nb), lambda i, j: (0, i * wblocks + j))
    return pl.BlockSpec((1, co, nb), lambda i, j: (i, 0, j))


def _tiling(u, tview):
    """(bsz, h, w_dim, c, bh, bw, grid, nb) for either view."""
    if tview:
        h, w_dim, bsz, c = u.shape
        bw = _pick_bw(w_dim, bsz)
        return bsz, h, w_dim, c, 1, bw, (h, w_dim // bw), bw * bsz
    bsz, h, w_dim, c = u.shape
    bh = _pick_bh(h)
    return bsz, h, w_dim, c, bh, w_dim, (bsz, h // bh), bh * w_dim


def _fwd(u, w_t, b, target_t, tview):
    bsz, h, w_dim, c, bh, bw, grid, nb = _tiling(u, tview)
    co = w_t.shape[0]
    dec_shape = ((co, h * w_dim * bsz) if tview
                 else (bsz, co, h * w_dim))
    import functools
    dec_t, l1, l2 = pl.pallas_call(
        functools.partial(_fwd_kernel, tview=tview),
        grid=grid,
        in_specs=[
            _u_spec(bsz, h, w_dim, c, bh, bw, tview),
            _c3_spec(co, nb, tview, grid[1]),
            pl.BlockSpec((co, c), lambda i, j: (0, 0)),
            pl.BlockSpec((co, 1), lambda i, j: (0, 0)),
        ],
        out_specs=[
            _c3_spec(co, nb, tview, grid[1]),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(dec_shape, jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(u, target_t, w_t, b)
    return dec_t, l1[0, 0], l2[0, 0]


# ---------------------------------------------------------------------------
# backward: ONE pass over u producing du, dW8, db8
# ---------------------------------------------------------------------------

def _bwd_kernel(*refs, has_ddec, tview):
    if has_ddec:
        (u_ref, dec_ref, t_ref, w_ref, a_ref, ddec_ref,
         du_ref, dw_ref, db_ref) = refs
    else:
        (u_ref, dec_ref, t_ref, w_ref, a_ref,
         du_ref, dw_ref, db_ref) = refs
    i, j = pl.program_id(0), pl.program_id(1)

    dec = dec_ref[...] if tview else dec_ref[0]            # [Co,n] f32
    tgt = t_ref[...] if tview else t_ref[0]
    diff = tgt.astype(jnp.float32) - dec
    a1 = a_ref[0, 0]
    a2 = a_ref[0, 1]
    # d/d(dec) of [a1*sum|t-dec| + a2*sum((t-dec)^2)] (plus the decoded
    # cotangent when it is not a symbolic zero — in the train step only
    # the sums are consumed, so the ddec input and its 25 MB read vanish)
    dout = -a1 * jnp.sign(diff) - 2.0 * a2 * diff          # [Co,n] f32
    if has_ddec:
        dout = dout + (ddec_ref[...] if tview
                       else ddec_ref[0]).astype(jnp.float32)

    u = u_ref[...] if tview else u_ref[0]                  # [...,C]
    c = u.shape[-1]
    n = u.size // c
    x7 = _leaky(u).reshape(n, c)                           # act dtype

    @pl.when((i == 0) & (j == 0))
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    # wgrad: dW[Co,C] += dout @ x7 — operands in the activation dtype with
    # fp32 accumulation (exactly how XLA computes the unfused Conv_8
    # wgrad); the [Co,C] accumulator never leaves VMEM between tiles
    dout_a = dout.astype(u.dtype)
    dw_ref[...] += jax.lax.dot_general(
        dout_a, x7, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db_ref[...] += jnp.sum(dout, axis=1)[:, None]

    # dgrad through the leaky mask (x7 > 0 <=> u > 0, positive slope):
    # TN matmul contracting Co -> [n,C] = du's own layout after the
    # layout-free sublane split back to [bh,W,C]
    # Mosaic requires a 32-bit matmul accumulator; round to the act dtype
    # after (identical to XLA's dgrad, which accumulates f32 then rounds)
    dx7 = jax.lax.dot_general(
        dout_a, w_ref[...].astype(u.dtype),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(u.dtype)  # [n,C]
    dx7 = dx7.reshape(u.shape)
    du = jnp.where(u.astype(jnp.float32) > 0, dx7,
                   _ALPHA * dx7).astype(du_ref.dtype)
    if tview:
        du_ref[...] = du
    else:
        du_ref[0] = du


def _bwd_call(u, w_t, target_t, dec_t, a12, ddec_t, tview):
    import functools

    bsz, h, w_dim, c, bh, bw, grid, nb = _tiling(u, tview)
    co = w_t.shape[0]
    t3 = _c3_spec(co, nb, tview, grid[1])
    has_ddec = ddec_t is not None
    in_specs = [
        _u_spec(bsz, h, w_dim, c, bh, bw, tview),
        t3, t3,
        pl.BlockSpec((co, c), lambda i, j: (0, 0)),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    args = [u, dec_t, target_t, w_t, a12]
    if has_ddec:
        in_specs.append(t3)
        args.append(ddec_t)
    du, dw_t, db = pl.pallas_call(
        functools.partial(_bwd_kernel, has_ddec=has_ddec, tview=tview),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            _u_spec(bsz, h, w_dim, c, bh, bw, tview),
            pl.BlockSpec((co, c), lambda i, j: (0, 0)),
            pl.BlockSpec((co, 1), lambda i, j: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(u.shape, u.dtype),
            jax.ShapeDtypeStruct((co, c), jnp.float32),
            jax.ShapeDtypeStruct((co, 1), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(*args)
    return du, dw_t, db


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------

@jax.custom_vjp
def fused_output_recon(u, kernel, bias, target):
    """(decoded, l1_sum, l2_sum) for the decoder output stage.

    u: [B,H,W,C] pre-activation feeding the final leaky_relu (act dtype).
    kernel: [1,1,C,Co] fp32 1x1-conv weights (Conv_8 layout); bias [Co].
    target: [B,H,W,Co] float in [0,1].

    decoded = round_act_dtype(leaky(u) @ kernel + bias) as fp32 —
    numerically the unfused decoder's output. l1_sum = sum|target-decoded|,
    l2_sum = sum (target-decoded)^2, both over ALL elements (callers apply
    the reference's per-batch scaling, base.py:385-396). In the train step
    the decoded->NHWC transpose is dead code (only the sums are consumed).
    """
    out, _ = _fused_fwd(u, kernel, bias, target)
    return out


def _wt(kernel, dtype):
    del dtype
    return jnp.transpose(kernel[0, 0], (1, 0))             # [Co,C] fp32


def _fused_fwd(u, kernel, bias, target):
    # with symbolic_zeros=True the fwd rule receives CustomVJPPrimal
    # wrappers (.value/.perturbed); the primal call passes raw arrays
    u, kernel, bias, target = (
        a.value if hasattr(a, "perturbed") else a
        for a in (u, kernel, bias, target))
    b_, h_, wd, _ = u.shape
    w_t = _wt(kernel, u.dtype)
    co = w_t.shape[0]
    if _TRANSPOSED_VIEW:
        # pixel order (h, w, b) to match the [H,W,B,C] view's tiles
        target_t = jnp.transpose(target, (3, 1, 2, 0)).reshape(
            co, h_ * wd * b_)
        uv = jnp.transpose(u, (1, 2, 0, 3))
    else:
        target_t = jnp.transpose(target, (0, 3, 1, 2)).reshape(
            b_, co, h_ * wd)
        uv = u
    dec_t, l1, l2 = _fwd(uv, w_t, bias[:, None], target_t,
                         _TRANSPOSED_VIEW)
    if _TRANSPOSED_VIEW:
        decoded = jnp.transpose(dec_t.reshape(co, h_, wd, b_),
                                (3, 1, 2, 0))
    else:
        decoded = jnp.transpose(dec_t.reshape(b_, co, h_, wd),
                                (0, 2, 3, 1))
    return (decoded, l1, l2), (uv, w_t, target_t, dec_t)


def _fused_bwd(res, cot):
    from jax.custom_derivatives import SymbolicZero

    uv, w_t, target_t, dec_t = res
    ddec, dl1, dl2 = cot
    if _TRANSPOSED_VIEW:
        h_, wd, b_, _ = uv.shape
    else:
        b_, h_, wd, _ = uv.shape
    if isinstance(ddec, SymbolicZero):
        ddec_t = None          # train step: decoded's cotangent is zero
    elif _TRANSPOSED_VIEW:
        ddec_t = jnp.transpose(ddec, (3, 1, 2, 0)).reshape(
            w_t.shape[0], h_ * wd * b_)
    else:
        ddec_t = jnp.transpose(ddec, (0, 3, 1, 2)).reshape(
            b_, w_t.shape[0], h_ * wd)
    zero = jnp.zeros((), jnp.float32)
    dl1 = zero if isinstance(dl1, SymbolicZero) else dl1
    dl2 = zero if isinstance(dl2, SymbolicZero) else dl2
    a12 = jnp.stack([dl1, dl2]).astype(jnp.float32)[None, :]   # [1,2]
    du, dw_t, db = _bwd_call(uv, w_t, target_t, dec_t, a12, ddec_t,
                             _TRANSPOSED_VIEW)
    if _TRANSPOSED_VIEW:
        du = jnp.transpose(du, (2, 0, 1, 3))               # back to NHWC
    dkernel = jnp.transpose(dw_t, (1, 0))[None, None]      # [1,1,C,Co] f32
    # target's cotangent, in plain jnp OUTSIDE the kernel: training never
    # differentiates w.r.t. the image data, and then this whole expression
    # is dead code XLA eliminates — but a caller probing d(loss)/d(target)
    # (input-sensitivity, adversarial) must get the true gradient, not the
    # silent zero a placeholder would give. d/dt [a1*sum|t-d| +
    # a2*sum(t-d)^2] = a1*sign(t-d) + 2*a2*(t-d); decoded's cotangent
    # contributes nothing (dec does not depend on target).
    diff = target_t.astype(jnp.float32) - dec_t
    dt_t = dl1 * jnp.sign(diff) + 2.0 * dl2 * diff
    co = w_t.shape[0]
    if _TRANSPOSED_VIEW:
        dtarget = jnp.transpose(dt_t.reshape(co, h_, wd, b_), (3, 1, 2, 0))
    else:
        dtarget = jnp.transpose(dt_t.reshape(b_, co, h_, wd), (0, 2, 3, 1))
    return du, dkernel, db[:, 0], dtarget


fused_output_recon.defvjp(_fused_fwd, _fused_bwd, symbolic_zeros=True)
