"""Custom Pallas prefix-LM attention with in-register dropout (training path).

Round-2 measurement (docs/perf_notes.md) isolated the last 0.15 s/step of the
flagship training gap to attention-prob dropout: XLA materializes the
per-layer (B, H, T, T) dropout mask (bernoulli bits -> bf16 multiply), and the
library flash kernel can't help — it has no prob dropout and the prefix-LM
structural mask forces its dense ``ab``-bias path (measured 2x slower than
XLA's own fusion).  This kernel removes both costs:

  - the structural prefix-LM mask (text block attends within itself, audio
    attends to text + causally to audio; ref models/valle.py:835-861) is
    computed IN-KERNEL from row/col iotas plus a per-sequence (B, Tk) key-
    validity bias row — no (B, H, T, T) mask/bias tensor ever exists;
  - dropout keep-bits are generated IN-REGISTER from the TPU hardware PRNG
    (pltpu.prng_random_bits), seeded per (batch, head, q-window) so the
    backward pass regenerates bit-identical masks instead of storing them;
  - the backward recomputes probs flash-style, so the O(T^2) probs are never
    saved — layer-level remat becomes unnecessary for attention memory.

Design: at VALL-E sequence lengths (T <= ~2k) a full key row fits easily in
VMEM, so there is NO online-softmax block loop.  The q axis is split into
WINDOWS at trace time, one monolithic pallas_call per window with grid
(B, H): each cell computes exact softmax over that window's whole key range
in f32 and two MXU matmuls.  The round-5 speedup: because ``prefix_s`` and
the window geometry are static, each window's key range is STATICALLY
clipped to its structural frontier — the rows of window i (rows
[i*bq, (i+1)*bq)) can only see columns ``< max(prefix_s, (i+1)*bq)``, so
K/V/bias are sliced at the XLA level before the call and early windows skip
up to half the score/softmax/PV work with zero in-kernel overhead.  (An
in-kernel chunked online-softmax walk was measured first and lost: both the
dynamic fori_loop and a statically-unrolled pl.when variant cost more in
per-chunk overhead than the clip saves — docs/perf_notes.md round 5.)
Dense mode (``prefix_s=None``: key-padding only, the NAR / cross-attention
path) is a single full-width window — identical work to the round-4 kernel.
For the backward, dK/dV partial sums from each window are accumulated in f32
at the XLA level (each window computes exact f32 dK/dV for its clipped key
range) and cast once.

This replaces the reference's fused C++/CUDA attention + torch dropout
(ref valle/modules/activation.py:266-361, F.multi_head_attention_forward).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9  # finite mask value: fully-masked rows give uniform probs, not NaN


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _tile_seed(seed_ref, b, h, wi, n_h, n_w):
    """Distinct, reproducible PRNG seed per (batch, head, q-window) tile."""
    idx = (b * n_h + h) * n_w + wi
    # odd-constant multiply decorrelates nearby per-call base seeds (int32
    # wraparound is well-defined under XLA)
    return seed_ref[0] + idx * np.int32(-1640531527)  # 0x9E3779B9 as int32


def _struct_bias(row0, bq, tk, prefix_s):
    """Prefix-LM structural mask for rows [row0, row0+bq): (bq, tk) f32.

    prefix_s = s: rows < s (text) see cols < s; rows >= s (audio) see cols < s
    plus cols <= row.  prefix_s = 0 degenerates to a pure causal mask (the
    VALL-F audio decoder).  row0 is the window's static base row.
    """
    row = row0 + jax.lax.broadcasted_iota(jnp.int32, (bq, tk), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, tk), 1)
    # text rows (row < s) see exactly cols < s; audio rows additionally see
    # cols <= row — one boolean expression (Mosaic has no select-on-bools):
    allowed = jnp.logical_or(
        col < prefix_s, jnp.logical_and(row >= prefix_s, col <= row)
    )
    return jnp.where(allowed, 0.0, _NEG).astype(jnp.float32)


def _keep_mask(shape, rate):
    """In-register dropout keep mask from the already-seeded hardware PRNG."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    thr = np.uint32(min(2**32 - 1, round(rate * 2**32)))
    return bits >= thr  # P(keep) = 1 - rate


def _windows(tq_p, tk_p, bq, prefix_s):
    """Static (row0, width) per q-window.

    Window i covers q rows [i*bq, (i+1)*bq); under the prefix-LM mask those
    rows see exactly cols < max(prefix_s, (i+1)*bq), so its key range is
    clipped to that frontier (128-aligned).  Dense mode sees everything.
    """
    out = []
    for row0 in range(0, tq_p, bq):
        if prefix_s is None:
            w = tk_p
        else:
            w = min(tk_p, _round_up(max(prefix_s, row0 + bq), 128))
        out.append((row0, w))
    return out


def _fwd_kernel(
    seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref,
    *, scale, prefix_s, row0, dropout_rate, n_h, wi, n_w,
):
    b, h = pl.program_id(0), pl.program_id(1)
    tk = k_ref.shape[2]
    bq = q_ref.shape[2]
    q = q_ref[0, 0]  # (bq, dh)
    k = k_ref[0, 0]  # (tk, dh)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale + bias_ref[0]  # (1, tk) broadcasts over rows
    if prefix_s is not None:
        s = s + _struct_bias(row0, bq, tk, prefix_s)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    if dropout_rate > 0.0:
        pltpu.prng_seed(_tile_seed(seed_ref, b, h, wi, n_h, n_w))
        keep = _keep_mask(p.shape, dropout_rate)
        p = jnp.where(keep, p * (1.0 / (1.0 - dropout_rate)), 0.0)
    acc = jax.lax.dot_general(
        p.astype(q.dtype), v_ref[0, 0],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = (acc / l).astype(o_ref.dtype)


def _bwd_kernel(
    seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref, out_ref,
    dq_ref, dk_ref, dv_ref,
    *, scale, prefix_s, row0, dropout_rate, n_h, wi, n_w,
):
    b, h = pl.program_id(0), pl.program_id(1)
    tk = k_ref.shape[2]
    bq = q_ref.shape[2]
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0].astype(jnp.float32)
    # Recompute the exact forward softmax (single full-width window, so no
    # online stats were needed); bit-identical to the forward pass.
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale + bias_ref[0]
    if prefix_s is not None:
        s = s + _struct_bias(row0, bq, tk, prefix_s)
    m = jnp.max(s, axis=-1, keepdims=True)
    p_un = jnp.exp(s - m)
    p = p_un / jnp.sum(p_un, axis=-1, keepdims=True)  # normalized, (bq, tk)

    inv_kp = 1.0 / (1.0 - dropout_rate) if dropout_rate > 0.0 else 1.0
    if dropout_rate > 0.0:
        pltpu.prng_seed(_tile_seed(seed_ref, b, h, wi, n_h, n_w))
        keep = _keep_mask(p.shape, dropout_rate)
        pd = jnp.where(keep, p * inv_kp, 0.0)
    else:
        pd = p

    # dV = Pd^T dO  (per-window partial; windows are summed at the XLA level
    # — one extra model-dtype rounding vs a cross-window f32 accumulator,
    # which measured ~1.8 ms/micro-batch of avoidable f32 HBM traffic)
    dv_ref[0, 0] = jax.lax.dot_general(
        pd.astype(q.dtype), do.astype(q.dtype),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)
    # dPd = dO V^T ; dP = mask * dPd / keep_prob
    dpd = jax.lax.dot_general(
        do.astype(q.dtype), v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jnp.where(keep, dpd * inv_kp, 0.0) if dropout_rate > 0.0 else dpd
    # softmax jacobian: dS = P * (dP - rowsum(dO * O)); the dropout mask
    # cancels in the row term: sum_c dP_c P_c = sum_c dPd_c Pd_c = dO . O
    delta = jnp.sum(do * out_ref[0, 0].astype(jnp.float32), axis=-1,
                    keepdims=True)
    ds = p * (dp - delta)
    ds_lo = ds.astype(q.dtype)
    dq_ref[0, 0] = (
        jax.lax.dot_general(
            ds_lo, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * scale
    ).astype(dq_ref.dtype)
    dk_ref[0, 0] = (
        jax.lax.dot_general(
            ds_lo, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * scale
    ).astype(dk_ref.dtype)


def _specs(bq, tk, dh):
    """Block specs for one window call, grid (B, H): q rows and k/v/bias key
    range are pre-sliced at the XLA level, so every cell sees whole blocks."""
    # index maps receive the scalar-prefetch refs as trailing args (*_)
    q_spec = pl.BlockSpec((1, 1, bq, dh), lambda b_, h_, *_: (b_, h_, 0, 0))
    kv_spec = pl.BlockSpec((1, 1, tk, dh), lambda b_, h_, *_: (b_, h_, 0, 0))
    bias_spec = pl.BlockSpec((1, 1, tk), lambda b_, h_, *_: (b_, 0, 0))
    return q_spec, kv_spec, bias_spec


def _pallas_fwd(q, k, v, bias_rows, seed, prefix_s, dropout_rate, interpret,
                bq=None):
    b, n_h, tq_p, dh = q.shape
    tk_p = k.shape[2]
    bq = min(tq_p, bq or 128)
    wins = _windows(tq_p, tk_p, bq, prefix_s)
    outs = []
    for wi, (row0, w) in enumerate(wins):
        q_w = jax.lax.slice_in_dim(q, row0, row0 + bq, axis=2)
        k_w = jax.lax.slice_in_dim(k, 0, w, axis=2)
        v_w = jax.lax.slice_in_dim(v, 0, w, axis=2)
        bias_w = jax.lax.slice_in_dim(bias_rows, 0, w, axis=2)
        q_spec, kv_spec, bias_spec = _specs(bq, w, dh)
        kern = functools.partial(
            _fwd_kernel, scale=1.0 / (dh**0.5), prefix_s=prefix_s, row0=row0,
            dropout_rate=dropout_rate, n_h=n_h, wi=wi, n_w=len(wins),
        )
        outs.append(pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(b, n_h),
                in_specs=[q_spec, kv_spec, kv_spec, bias_spec],
                out_specs=q_spec,
            ),
            out_shape=jax.ShapeDtypeStruct((b, n_h, bq, dh), q.dtype),
            interpret=interpret,
        )(seed, q_w, k_w, v_w, bias_w))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=2)


def _pallas_bwd(q, k, v, bias_rows, seed, out, do, prefix_s, dropout_rate,
                interpret, bq=None):
    b, n_h, tq_p, dh = q.shape
    tk_p = k.shape[2]
    bq = min(tq_p, bq or 128)
    wins = _windows(tq_p, tk_p, bq, prefix_s)
    dqs = []
    dk_sum = None
    dv_sum = None
    for wi, (row0, w) in enumerate(wins):
        q_w = jax.lax.slice_in_dim(q, row0, row0 + bq, axis=2)
        o_w = jax.lax.slice_in_dim(out, row0, row0 + bq, axis=2)
        do_w = jax.lax.slice_in_dim(do, row0, row0 + bq, axis=2)
        k_w = jax.lax.slice_in_dim(k, 0, w, axis=2)
        v_w = jax.lax.slice_in_dim(v, 0, w, axis=2)
        bias_w = jax.lax.slice_in_dim(bias_rows, 0, w, axis=2)
        q_spec, kv_spec, bias_spec = _specs(bq, w, dh)
        kern = functools.partial(
            _bwd_kernel, scale=1.0 / (dh**0.5), prefix_s=prefix_s, row0=row0,
            dropout_rate=dropout_rate, n_h=n_h, wi=wi, n_w=len(wins),
        )
        dq_w, dk_w, dv_w = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(b, n_h),
                in_specs=[q_spec, kv_spec, kv_spec, bias_spec, q_spec, q_spec],
                out_specs=[q_spec, kv_spec, kv_spec],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((b, n_h, bq, dh), q.dtype),
                jax.ShapeDtypeStruct((b, n_h, w, dh), k.dtype),
                jax.ShapeDtypeStruct((b, n_h, w, dh), v.dtype),
            ],
            interpret=interpret,
        )(seed, q_w, k_w, v_w, bias_w, do_w, o_w)
        dqs.append(dq_w)
        pad = [(0, 0)] * 2 + [(0, tk_p - w), (0, 0)]
        dk_w = jnp.pad(dk_w, pad) if w != tk_p else dk_w
        dv_w = jnp.pad(dv_w, pad) if w != tk_p else dv_w
        dk_sum = dk_w if dk_sum is None else dk_sum + dk_w
        dv_sum = dv_w if dv_sum is None else dv_sum + dv_w
    dq = dqs[0] if len(dqs) == 1 else jnp.concatenate(dqs, axis=2)
    return dq, dk_sum, dv_sum


# ---------------------------------------------------------------------------
# SPMD partitioning.  Under GSPMD (pjit over a Mesh) a bare pallas_call is an
# opaque custom call: the partitioner would all-gather every operand and run
# it replicated.  These wrappers declare the embarrassingly-parallel dims —
# batch and head — so dp (batch) and Megatron tp (heads) shard the kernel
# with zero collectives, matching how parallel/mesh.py shards the model.
# The per-shard lowering folds the mesh position into the dropout seed so
# data-parallel shards draw independent masks.
# ---------------------------------------------------------------------------

_MIX = (-1640531527, 97, 1000003)  # per-axis seed decorrelation constants


def _spec_entries(sharding, ndim):
    spec = getattr(sharding, "spec", None)
    entries = tuple(spec) if spec is not None else ()
    return entries + (None,) * (ndim - len(entries))


def _axis_names(entry):
    if entry is None:
        return ()
    return tuple(entry) if isinstance(entry, (tuple, list)) else (entry,)


def _mix_seed(seed, names):
    for i, nm in enumerate(names):
        seed = seed + (
            jax.lax.axis_index(nm) * np.int32(_MIX[i % len(_MIX)])
        ).astype(jnp.int32)
    return seed


def _make_partitioned(raw_fn, n_qkv_like_out, rule, seed_argnum):
    """custom_partitioning wrapper: q/k/v (B,H,T,Dh) shard over (b, h); all
    sequence/feature dims and the bias/seed stay replicated."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    f = custom_partitioning(raw_fn)

    def _shardings(mesh, arg_shapes):
        b_e, h_e = _spec_entries(arg_shapes[0].sharding, 4)[:2]
        qkv = NamedSharding(mesh, P(b_e, h_e, None, None))
        bias = NamedSharding(mesh, P(b_e, None, None))
        seed = NamedSharding(mesh, P(None))
        return b_e, h_e, qkv, bias, seed

    def infer(mesh, arg_shapes, result_shape):
        _, _, qkv, _, _ = _shardings(mesh, arg_shapes)
        if n_qkv_like_out == 1:
            return qkv
        return (qkv,) * n_qkv_like_out

    def partition(mesh, arg_shapes, result_shape):
        b_e, h_e, qkv, bias, seed_sh = _shardings(mesh, arg_shapes)
        arg_shardings = tuple(
            seed_sh if i == seed_argnum else (bias if a.ndim == 3 else qkv)
            for i, a in enumerate(arg_shapes)
        )
        result_shardings = qkv if n_qkv_like_out == 1 else (qkv,) * n_qkv_like_out
        names = _axis_names(b_e) + _axis_names(h_e)

        def lower_fn(*args):
            args = list(args)
            args[seed_argnum] = _mix_seed(args[seed_argnum], names)
            return raw_fn(*args)

        return mesh, lower_fn, result_shardings, arg_shardings

    f.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule=rule,
    )
    return f


@functools.lru_cache(maxsize=None)
def _sharded_fwd(prefix_s, dropout_rate, interpret, bq=None):
    def raw(q, k, v, bias_rows, seed):
        return _pallas_fwd(q, k, v, bias_rows, seed, prefix_s, dropout_rate,
                           interpret, bq=bq)

    return _make_partitioned(
        raw, 1,
        "b h q d, b h k d, b h k d, b o k, s -> b h q d",
        seed_argnum=4,
    )


@functools.lru_cache(maxsize=None)
def _sharded_bwd(prefix_s, dropout_rate, interpret, bq=None):
    def raw(q, k, v, bias_rows, seed, out, do):
        return tuple(
            _pallas_bwd(q, k, v, bias_rows, seed, out, do, prefix_s,
                        dropout_rate, interpret, bq=bq)
        )

    return _make_partitioned(
        raw, 3,
        "b h q d, b h k d, b h k d, b o k, s, b h q d, b h q d "
        "-> b h q d, b h k d, b h k d",
        seed_argnum=4,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _fused_attention_padded(
    q, k, v, bias_rows, seed, prefix_s, dropout_rate, interpret,
    bq_fwd, bq_bwd,
):
    return _sharded_fwd(prefix_s, dropout_rate, interpret, bq_fwd)(
        q, k, v, bias_rows, seed
    )


def _fused_fwd(q, k, v, bias_rows, seed, prefix_s, dropout_rate, interpret,
               bq_fwd, bq_bwd):
    out = _sharded_fwd(prefix_s, dropout_rate, interpret, bq_fwd)(
        q, k, v, bias_rows, seed
    )
    return out, (q, k, v, bias_rows, seed, out)


def _fused_bwd(prefix_s, dropout_rate, interpret, bq_fwd, bq_bwd, res, do):
    q, k, v, bias_rows, seed, out = res
    dq, dk, dv = _sharded_bwd(prefix_s, dropout_rate, interpret, bq_bwd)(
        q, k, v, bias_rows, seed, out, do
    )
    return (
        dq, dk, dv,
        jnp.zeros_like(bias_rows),
        np.zeros(seed.shape, jax.dtypes.float0),
    )


_fused_attention_padded.defvjp(_fused_fwd, _fused_bwd)


def fused_prefix_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_bias: jnp.ndarray,
    *,
    prefix_s: Optional[int] = None,
    dropout_rate: float = 0.0,
    dropout_rng=None,
    interpret: Optional[bool] = None,
    block_q_fwd: Optional[int] = None,
    block_q_bwd: Optional[int] = None,
) -> jnp.ndarray:
    """(B,Tq,H,Dh) x (B,Tk,H,Dh) -> (B,Tq,H,Dh), differentiable.

    kv_bias: (B, Tk) f32 additive key-validity row (0 visible, <=-1e8 masked).
    prefix_s: static prefix-LM split (None = key-padding-only "dense" mode,
      0 = pure causal, s > 0 = [text ; audio] prefix-LM; requires Tq == Tk
      aligned to the same positions when not None).
    dropout_rate: attention-prob dropout; bits generated in-kernel from
      ``dropout_rng`` (distribution parity with the reference's prob dropout;
      the bitstream itself intentionally differs).
    interpret: force Pallas interpret mode (defaults to True off-TPU so the
      same code path runs under the CPU test mesh).
    block_q_fwd / block_q_bwd: q-rows per window (must divide the 128-padded
      Tq).  In prefix/causal mode each window's key range is statically
      clipped to ``max(prefix_s, window_end)``, so mid-size windows both
      amortize per-call overhead and skip masked-out key columns (round-5
      sweep, docs/perf_notes.md): default 448-capped divisor for the fwd and
      bwd.  Dense mode keeps the round-4 defaults (largest divisor <= 896
      fwd / 448 bwd — only per-call overhead matters when nothing can be
      clipped; the bwd holds ~6 live (bq, Tk) f32 temporaries so its VMEM
      cap is lower).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if interpret and dropout_rate > 0.0 and dropout_rng is not None:
        # The Pallas TPU interpreter stubs prng_random_bits to zeros, which
        # would silently drop EVERY attention prob.  Callers
        # (ops.attention_impl) route dropout training to the XLA path off-TPU.
        raise NotImplementedError(
            "in-kernel dropout requires a real TPU (interpret-mode PRNG is "
            "a zero stub)"
        )
    b, tq, h, dh = q.shape
    tk = k.shape[1]
    tq_p = _round_up(tq, 128)
    tk_p = _round_up(tk, 128)

    def auto_bq(max_elems):
        # largest divisor of the padded Tq whose (bq, Tk) f32 score block
        # stays within the VMEM budget (bwd holds ~6 live temporaries, so
        # its element cap is about half the fwd's)
        cap = max(128, max_elems // tk_p)
        best = 128
        for cand in range(128, min(cap, tq_p) + 1, 8):
            if tq_p % cand == 0:
                best = cand
        return best

    if prefix_s is not None:
        # clipped-window mode: mid-size windows so early windows can skip
        # masked key columns (the VMEM caps stay as a guard for long Tk)
        bq_fwd = block_q_fwd or min(auto_bq(830_000), auto_bq(448 * tk_p))
        bq_bwd = block_q_bwd or min(auto_bq(460_000), auto_bq(448 * tk_p))
    else:
        bq_fwd = block_q_fwd or auto_bq(830_000)
        bq_bwd = block_q_bwd or auto_bq(460_000)
    if dropout_rate > 0.0 and dropout_rng is not None:
        # keep-bits are seeded per (batch, head, q-window) TILE: the backward
        # regenerates them, so fwd and bwd must window q identically or the
        # masks diverge and the gradients are silently wrong.  Auto-picked
        # blocks are reconciled to the min; only reject configs where the
        # caller explicitly pinned BOTH blocks to different values.
        assert (
            block_q_fwd is None or block_q_bwd is None
            or block_q_fwd == block_q_bwd
        ), "dropout requires block_q_fwd == block_q_bwd (PRNG tile seeds)"
        bq_fwd = bq_bwd = min(bq_fwd, bq_bwd)
    assert tq_p % bq_fwd == 0 and tq_p % bq_bwd == 0, (tq_p, bq_fwd, bq_bwd)

    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    if tq_p != tq:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, tq_p - tq), (0, 0)))
    if tk_p != tk:
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, tk_p - tk), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, tk_p - tk), (0, 0)))
        kv_bias = jnp.pad(kv_bias, ((0, 0), (0, tk_p - tk)),
                          constant_values=_NEG)
    kv_bias = kv_bias.astype(jnp.float32)[:, None, :]  # (B, 1, Tk)

    if dropout_rate > 0.0 and dropout_rng is not None:
        seed = jax.lax.bitcast_convert_type(
            jax.random.bits(dropout_rng, (1,), jnp.uint32), jnp.int32
        )
    else:
        seed = jnp.zeros((1,), jnp.int32)
        dropout_rate = 0.0

    out = _fused_attention_padded(
        qt, kt, vt, kv_bias, seed, prefix_s, float(dropout_rate), interpret,
        bq_fwd, bq_bwd,
    )
    out = jnp.transpose(out, (0, 2, 1, 3))
    if tq_p != tq:
        out = out[:, :tq]
    return out
