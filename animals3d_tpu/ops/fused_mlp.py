"""Fused CoordMLP lattice sweep — the netSDF dense evaluation as one
Pallas kernel, activations resident in VMEM.

The prior-shape SDF sweep evaluates a 5-layer 256-wide MLP at every tet
lattice vertex ((res+1)³ ≈ 2.1M points at the training grid 128) every
step — the reference's `DMTetGeometry.getMesh` dense sweep
(`/root/reference/model/geometry/dmtet.py:294-310`), and the #1 line of
the r4 train-step device trace (flax Dense 91.4 ms of 433, ~50 ms of it
this sweep, PERF_NOTES session 7). As separate XLA dots, every layer
boundary writes + reads a (N, 256) activation to HBM (~1.1 GB bf16 each
way at grid 128); fused, a (TB, 256) tile stays in VMEM across all
layers and only the embedded input (N, 64) and the (N, 1) SDF output
touch HBM.

Forward: one kernel, grid over row blocks of TB points; weights (≈0.6 MB
bf16 total) are VMEM-resident via constant index maps.

Backward (custom VJP): a second kernel RECOMPUTES the forward
activations per block in VMEM (so the autodiff residuals — 5× (N, 256)
arrays — never exist in HBM at all) and accumulates the per-layer weight
grads (256×256 f32 accumulators revisited across the grid). Positions
are not differentiated: the lattice is a constant and the grid jitter is
non-trainable, so the input cotangent is identically zero (returned as
zeros; upstream is position math with no parameter dependence, DCE'd).

Numerics match the flax path per layer: bf16 operands, f32 MXU
accumulation, output truncated to the compute dtype between layers
(exactly nn.Dense(dtype=bf16) semantics). In f32 compute mode the dots
request `precision=HIGHEST` — Mosaic's default f32 dot truncates
operands to bf16 (measured, PERF_NOTES session 5), which flax/XLA f32
on-device also does by default, but parity tests compare against exact
CPU f32.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl

NF = 256          # hidden width (all shipped configs)
LANES = 128


def _dot(a, b, cd, dn=None):
    kw = {}
    if cd == jnp.float32:
        kw["precision"] = lax.Precision.HIGHEST
    if dn is None:
        return jnp.dot(a, b, preferred_element_type=jnp.float32, **kw)
    return lax.dot_general(a, b, dimension_numbers=(dn, ((), ())),
                           preferred_element_type=jnp.float32, **kw)


def _fwd_kernel(*refs, L: int, cd):
    e_ref, win_ref, b_ref = refs[0], refs[1], refs[2]
    w_refs = refs[3:3 + L]
    out_ref = refs[3 + L]
    # in_layer (+bias) then relu — CoordMLP `in_layer` + the relu applied
    # at the MLP call boundary (networks/mlp.py CoordMLP.__call__)
    z = _dot(e_ref[...], win_ref[...], cd).astype(cd) + b_ref[...].astype(cd)
    a = jnp.maximum(z, 0)
    # MLP layer_0 .. layer_{L-2} (relu BEFORE each layer after the first),
    # final layer_{L-1} is NF -> 1 (lane-padded to 128)
    z = _dot(a, w_refs[0][...], cd).astype(cd)
    for i in range(1, L):
        a = jnp.maximum(z, 0)
        z = _dot(a, w_refs[i][...], cd).astype(cd)
    out_ref[...] = z[:, :1].astype(jnp.float32)


def _bwd_kernel(*refs, L: int, cd):
    e_ref, g_ref, win_ref, b_ref = refs[:4]
    w_refs = refs[4:4 + L]
    dwin_ref, db_ref = refs[4 + L], refs[5 + L]
    dw_refs = refs[6 + L:6 + 2 * L]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dwin_ref[...] = jnp.zeros_like(dwin_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        for r in dw_refs:
            r[...] = jnp.zeros_like(r)

    # recompute forward activations for this block (VMEM-resident)
    e = e_ref[...]
    z = _dot(e, win_ref[...], cd).astype(cd) + b_ref[...].astype(cd)
    acts = [jnp.maximum(z, 0)]                       # a0 = mlp input
    for li in range(L - 1):
        z = _dot(acts[-1], w_refs[li][...], cd).astype(cd)
        acts.append(jnp.maximum(z, 0))               # a_{li+1}

    # d_z for the final (lane-padded) layer. The true cotangent lives in
    # lane 0 only, but broadcasting g to ALL lanes is equivalent and avoids
    # an i1-mask relayout Mosaic can't lower ("non-singleton logical
    # dimension is replicated", v5e 2026-08-20): W4's padded columns are
    # zero, so d_a4 = d @ W4ᵀ ignores lanes 1..127, and the garbage they
    # add to dW4's padded columns is dropped by `jnp.pad`'s VJP upstream.
    g = g_ref[...]                                   # (TB, 1) f32
    d = jnp.broadcast_to(g.astype(cd), (g.shape[0], LANES))

    def relu_mask(da_f32, a):
        # mask in f32: Mosaic rejects bf16 packed-vector compares ("Target
        # does not support this comparison", v5e 2026-08-20); truncation
        # preserves the sign so the f32 compare of the bf16 activation is
        # the same mask
        return jnp.where(a.astype(jnp.float32) > 0, da_f32,
                         jnp.zeros((), jnp.float32)).astype(cd)

    for li in range(L - 1, -1, -1):
        # z_li = a_li @ W_li ; d = d_z_li
        dw_refs[li][...] += _dot(acts[li], d, cd, dn=((0,), (0,)))
        if li == 0:
            break
        da = _dot(d, w_refs[li][...], cd, dn=((1,), (1,)))
        d = relu_mask(da, acts[li])
    # through in_layer: d_zin = (d_a0) ⊙ (a0>0)
    da = _dot(d, w_refs[0][...], cd, dn=((1,), (1,)))
    d = relu_mask(da, acts[0])
    dwin_ref[...] += _dot(e, d, cd, dn=((0,), (0,)))
    db_ref[...] += jnp.sum(d.astype(jnp.float32), axis=0, keepdims=True)


def _pad_rows(x, nb, tb):
    pad = nb * tb - x.shape[0]
    return x if pad == 0 else jnp.pad(x, ((0, pad), (0, 0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _sweep(weights, e, L, tb, interpret):
    return _sweep_fwd_only(weights, e, L, tb, interpret)


def _sweep_fwd_only(weights, e, L, tb, interpret):
    win, b, ws = weights[0], weights[1], weights[2:]
    cd = win.dtype
    n = e.shape[0]
    nb = pl.cdiv(n, tb)
    ep = _pad_rows(e, nb, tb)
    dp = ep.shape[1]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, L=L, cd=cd),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((tb, dp), lambda i: (i, 0)),
            pl.BlockSpec((dp, NF), lambda i: (0, 0)),
            pl.BlockSpec((1, NF), lambda i: (0, 0)),
            *[pl.BlockSpec(w.shape, lambda i: (0, 0)) for w in ws],
        ],
        out_specs=pl.BlockSpec((tb, 1), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((nb * tb, 1), jnp.float32),
        interpret=interpret,
    )(ep, win, b, *ws)
    return out[:n, 0]


def _sweep_fwd(weights, e, L, tb, interpret):
    return _sweep_fwd_only(weights, e, L, tb, interpret), (weights, e)


def _sweep_bwd(L, tb, interpret, res, g):
    weights, e = res
    win, b, ws = weights[0], weights[1], weights[2:]
    cd = win.dtype
    n = e.shape[0]
    # smaller blocks than fwd: the bwd kernel holds L+1 activation tiles
    tb = max(tb // 2, 256)
    nb = pl.cdiv(n, tb)
    ep = _pad_rows(e, nb, tb)
    gp = _pad_rows(g[:, None].astype(jnp.float32), nb, tb)  # zero-padded ⇒
    dp = ep.shape[1]                                        # zero grads
    const = lambda i: (0, 0)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, L=L, cd=cd),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((tb, dp), lambda i: (i, 0)),
            pl.BlockSpec((tb, 1), lambda i: (i, 0)),
            pl.BlockSpec((dp, NF), const),
            pl.BlockSpec((1, NF), const),
            *[pl.BlockSpec(w.shape, const) for w in ws],
        ],
        out_specs=[
            pl.BlockSpec((dp, NF), const),
            pl.BlockSpec((1, NF), const),
            *[pl.BlockSpec(w.shape, const) for w in ws],
        ],
        out_shape=[
            jax.ShapeDtypeStruct((dp, NF), jnp.float32),
            jax.ShapeDtypeStruct((1, NF), jnp.float32),
            *[jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws],
        ],
        interpret=interpret,
    )(ep, gp, win, b, *ws)
    dwin, db, dws = outs[0], outs[1], outs[2:]
    dweights = (dwin, db, *dws)
    return dweights, jnp.zeros_like(e)


_sweep.defvjp(_sweep_fwd, _sweep_bwd)


def mlp_sweep(params, e, *, num_layers: int, tb: int | None = None,
              interpret: bool | None = None) -> jax.Array:
    """Evaluate the CoordMLP trunk (in_layer + bias-free MLP, cout=1) at
    every row of the embedded input `e` (N, D).

    params: the flax `netSDF` param subtree ({'in_layer': {kernel, bias},
    'mlp': {'layer_i': {kernel}}}). Returns (N,) f32 raw MLP output
    (pre init-bias). Differentiable w.r.t. params only.
    """
    from animals3d_tpu.precision import compute_dtype
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if tb is None:
        # A3D_FUSED_TB: trace-time A/B lever for the row-block size
        import os
        tb = int(os.environ.get("A3D_FUSED_TB", "2048"))
    cd = compute_dtype()
    assert num_layers >= 2, "fused sweep supports num_layers >= 2"
    win = params["in_layer"]["kernel"]
    b = params["in_layer"]["bias"].reshape(1, NF)
    d = win.shape[0]
    dp = -(-max(d, 1) // 8) * 8            # sublane-align the K dim
    win_p = jnp.pad(win, ((0, dp - d), (0, 0)))
    ws = []
    for i in range(num_layers):
        w = params["mlp"][f"layer_{i}"]["kernel"]
        if i == num_layers - 1:            # (NF, 1) -> lane-pad to 128
            w = jnp.pad(w, ((0, 0), (0, LANES - w.shape[1])))
        ws.append(w.astype(cd))
    ep = jnp.pad(e, ((0, 0), (0, dp - d))).astype(cd)
    weights = (win_p.astype(cd), b, *ws)
    return _sweep(weights, ep, num_layers, tb, interpret)


def coordmlp_sweep_params_ok(params, num_layers: int) -> bool:
    """Gate: the fused kernel covers the shipped netSDF shape (256-wide
    bias-free MLP trunk, cout=1, no conditioning)."""
    try:
        if params["in_layer"]["kernel"].shape[1] != NF:
            return False
        for i in range(num_layers - 1):
            if params["mlp"][f"layer_{i}"]["kernel"].shape != (NF, NF):
                return False
        return params["mlp"][f"layer_{num_layers - 1}"]["kernel"].shape \
            == (NF, 1)
    except KeyError:
        return False
