"""Single-pass fused Adam update (Pallas TPU kernel).

XLA schedules the TF1-style Adam update (training/optim.py, reproducing
/root/reference/codes/base.py:457-517) as three fusions per parameter leaf
— m' (reads m,g), v' (reads v,g), p' (reads p,m',v') — 7 HBM reads + 3
writes per element where the math needs only 4 + 3. This kernel does the
whole update (including the reference's elementwise +-1 gradient clip,
base.py:514-517) in ONE pass: each VMEM block computes m', v', p' while
g/p/m/v stream through once, with input_output_aliases pinning the in-place
update.

MEASURED RESULT (v5e, CelebA-128 production step): the theoretical ~230 MB
of removed re-reads (~0.28 ms) did NOT materialise as a win — the step
regressed 13.3 -> 14.5 ms. ~45 pallas_call boundaries replace XLA fusions
that were already scheduling the re-reads behind convolution DMA, and each
boundary blocks epilogue fusion of the clip with the gradient producers.
Same verdict as the instnorm kernel (DESIGN.md §7): XLA's own elementwise
schedule is already at the HBM floor here. Kept as an OPT-IN template
(config['fused_adam']=1) with exact-parity tests for ops where a future
profile shows genuine multi-pass waste.

Math is bit-compatible with optim.adam_update (same expression order, fp32);
tests/test_pallas.py compares them leaf-exactly in interpret mode. Leaves
whose element count is not a multiple of 128 lanes, or that are too small
to be worth a kernel launch, fall back to the jnp formula — exactness is
unaffected either way.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False  # flipped by tests on CPU

_LANES = 128
_MIN_FUSED_ELEMS = 16 * 1024      # below this, launch overhead > savings
_BLOCK_ROWS = 1024                # (1024, 128) fp32 block = 512 KiB/buffer


def _adam_kernel(lr_ref, g_ref, p_ref, m_ref, v_ref,
                 po_ref, mo_ref, vo_ref, *, b1, b2, eps, clip):
    g = g_ref[...]
    if clip:
        g = jnp.clip(g, -1.0, 1.0)
    m = b1 * m_ref[...] + (1.0 - b1) * g
    v = b2 * v_ref[...] + (1.0 - b2) * g * g
    po_ref[...] = p_ref[...] - lr_ref[0, 0] * m / (jnp.sqrt(v) + eps)
    mo_ref[...] = m
    vo_ref[...] = v


def _fused_leaf(g, p, m, v, lr_t, b1, b2, eps, clip):
    """One eligible leaf: flatten to (rows, 128), stream blocks."""
    shape = p.shape
    rows = p.size // _LANES
    g2, p2, m2, v2 = (a.reshape(rows, _LANES) for a in (g, p, m, v))
    block = min(rows, _BLOCK_ROWS)
    grid = (pl.cdiv(rows, block),)
    spec = pl.BlockSpec((block, _LANES), lambda i: (i, 0))
    kernel = functools.partial(_adam_kernel, b1=b1, b2=b2, eps=eps,
                               clip=clip)
    out_shape = jax.ShapeDtypeStruct((rows, _LANES), jnp.float32)
    po, mo, vo = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            spec, spec, spec, spec,
        ],
        out_specs=[spec, spec, spec],
        out_shape=[out_shape, out_shape, out_shape],
        input_output_aliases={2: 0, 3: 1, 4: 2},  # p, m, v in-place
        interpret=_INTERPRET,
    )(lr_t.reshape(1, 1), g2, p2, m2, v2)
    return po.reshape(shape), mo.reshape(shape), vo.reshape(shape)


def _eligible(leaf):
    return (leaf.dtype == jnp.float32 and leaf.size >= _MIN_FUSED_ELEMS
            and leaf.size % _LANES == 0)


def adam_update_fused(grads, state, params, lr, b1, b2, eps, clip=True):
    """Drop-in for clip_grads + optim.adam_update on the TPU hot path.

    grads are UNclipped (the +-1 clip runs inside the kernel). Returns
    (new_params, new_state) with identical semantics to
    clip_grads -> adam_update; ineligible leaves use the jnp formula.
    """
    t = state["t"] + 1
    tf_ = t.astype(jnp.float32)
    lr_t = (lr * jnp.sqrt(1.0 - b2 ** tf_) / (1.0 - b1 ** tf_)).astype(
        jnp.float32)

    flat_p, treedef = jax.tree.flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(state["m"])
    flat_v = treedef.flatten_up_to(state["v"])

    new_p, new_m, new_v = [], [], []
    for g, p, m, v in zip(flat_g, flat_p, flat_m, flat_v):
        if _eligible(p):
            po, mo, vo = _fused_leaf(g, p, m, v, lr_t, b1, b2, eps, clip)
        else:
            gc = jnp.clip(g, -1.0, 1.0) if clip else g
            mo = b1 * m + (1.0 - b1) * gc
            vo = b2 * v + (1.0 - b2) * gc * gc
            po = p - lr_t * mo / (jnp.sqrt(vo) + eps)
        new_p.append(po)
        new_m.append(mo)
        new_v.append(vo)

    unflatten = treedef.unflatten
    return unflatten(new_p), dict(m=unflatten(new_m), v=unflatten(new_v),
                                  t=t)
