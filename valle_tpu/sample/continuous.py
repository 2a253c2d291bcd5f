"""Continuous batching: slot-refill AR decoding over a persistent KV-cache.

The bucket scheduler (bin/serve.py, ``generate``) serves fixed batches: a
batch is gated by its LONGEST sequence, so mixed-length traffic leaves AR
slots idle after early stops (measured 174 -> 110.7 audio-s/s on the
150-512-stop distribution, docs/perf_notes.md "realistic-length traffic").
This module keeps the batch full instead: the AR while_loop runs in
CHUNK-step segments (the same natural refill points the chunked cache
growth already creates), and at each segment boundary the host harvests
finished slots and re-prefills them with queued requests — text + prompt
KV is recomputed for the new request and scattered into the slot's cache
rows, and generation resumes with a per-slot start offset.

Scheme (all shapes static; compiled programs: one prefill at the admission
width, ONE segment body — the cache capacity is fixed — and one NAR refine
per drain bucket):

  - **per-slot cache columns**: slot b writes its generated KV at
    [tpre + own_t], own_t = t - start_t, via a (B,)-indexed scatter in the
    attention cache update — so a refilled slot's region restarts at the
    prefix and the cache capacity (= the per-step KV read) is bounded by
    the LONGEST SINGLE REQUEST, not the global step count.  (A first
    version kept global columns; it lost 32% to the bucket scheme because
    decode is KV-read-bound and every slot paid the ever-growing global
    context — docs/perf_notes.md.)
  - admission re-prefills into the SAME right-aligned [text ; prompt]
    region every sequence uses (quantized admission width, out-of-range
    slot indices dropped), so one compiled prefill serves any refill;
  - finished sequences drain to full-batch NAR refinement at a fixed
    length bucket (``sample.nar_refine``), identical NAR work to the
    bucket scheduler — the win is AR slot occupancy.

The reference has no serving layer at all (ref bin/infer.py:126-259 is a
batch-1 loop); this is TPU-native serving machinery beyond it.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from valle_tpu.ops import masks as mask_ops
from valle_tpu.ops.sampling import topk_sampling
from valle_tpu.sample import _prefill_kv, nar_refine


def _quantize_cache(kv):
    from valle_tpu.nn.attention import quantize_kv

    k8, ks = quantize_kv(kv[0])
    v8, vs = quantize_kv(kv[1])
    return k8, v8, ks, vs


@functools.partial(jax.jit, static_argnames=("model",))
def _prefill_parts(model, variables, x, x_lens, prompts, plens):
    """Prefill for an admission group: returns (logits, cache parts int8,
    pre_valid)."""
    logits, kv, _mem, key_pad_pre, _mb, _tpre, _ppad = _prefill_kv(
        model, variables, x, x_lens, prompts, plens
    )
    if model.cfg.kv_cache_dtype == "int8":
        parts = _quantize_cache(kv)
    else:
        parts = tuple(kv)
    return logits, parts, jnp.logical_not(key_pad_pre)


@functools.partial(
    jax.jit, static_argnames=("model",), donate_argnums=(2,)
)
def _admit(model, variables, state, slots, x, x_lens, prompts, plens,
           stop_lens):
    """Scatter a prefilled admission group into ``slots`` of the running
    state (out-of-range slot indices = padding rows, dropped)."""
    logits, parts, pre_valid_new = _prefill_parts(
        model, variables, x, x_lens, prompts, plens
    )
    cache, logits_all, tokens, t, finished, gen_len, start_t, pv, xl, pl, \
        sl, key = state
    tpre = pv.shape[1]
    new_cache = tuple(
        c.at[:, slots, :tpre].set(p.astype(c.dtype), mode="drop")
        for c, p in zip(cache, parts)
    )
    at = lambda a, v: a.at[slots].set(v, mode="drop")
    return (
        new_cache,
        at(logits_all, logits),
        tokens,
        t,
        at(finished, jnp.zeros(slots.shape, bool)),
        at(gen_len, jnp.full(slots.shape, jnp.iinfo(jnp.int32).max // 2,
                             jnp.int32)),
        at(start_t, jnp.broadcast_to(t, slots.shape).astype(jnp.int32)),
        pv.at[slots].set(pre_valid_new, mode="drop"),
        at(xl, x_lens),
        at(pl, plens),
        at(sl, stop_lens),
        key,
    )


@functools.partial(
    jax.jit,
    static_argnames=("model", "tpre", "top_k", "top_p", "temperature",
                     "forbid_eos", "ragged_decode"),
    donate_argnums=(2,),
)
def _segment(model, variables, state, seg_end, *, tpre, top_k, top_p,
             temperature, forbid_eos=False, ragged_decode=False):
    """Run the AR loop to ``seg_end`` (or until every slot is finished)."""
    cfg = model.cfg
    eos = cfg.eos_id
    bos = int(cfg.prepend_bos)

    def cond(state):
        t, finished = state[3], state[4]
        return jnp.logical_and(
            t < seg_end, jnp.logical_not(jnp.all(finished))
        )

    def body(state):
        (cache, logits, tokens, t, finished, gen_len, start_t, pre_valid,
         x_lens, prompt_lens, stop_lens, key) = state
        b = logits.shape[0]
        c_cap = cache[0].shape[2]
        cap_own = c_cap - tpre - 1
        slot_idx = jnp.arange(c_cap)[None, :]
        key, sub = jax.random.split(key)
        if forbid_eos:
            logits = logits.at[:, eos].set(-1e9)
        samples = topk_sampling(
            sub, logits, top_k=top_k, top_p=top_p, temperature=temperature
        )
        argmax_eos = jnp.argmax(logits, axis=-1) == eos
        own_t = t - start_t  # per-slot generated count
        too_long = (own_t + bos) > x_lens * 16
        too_long = jnp.logical_or(too_long, own_t >= stop_lens)
        stop_now = jnp.logical_or(
            jnp.logical_or(argmax_eos, samples == eos), too_long
        )
        newly = jnp.logical_and(stop_now, jnp.logical_not(finished))
        gen_len = jnp.where(newly, own_t, gen_len)
        finished = jnp.logical_or(finished, stop_now)

        tok = jnp.where(finished, eos, samples).astype(jnp.int32)
        tokens = jax.lax.dynamic_update_slice(tokens, tok[:, None], (0, t))

        # per-slot cache columns: slot b's generated KV lives at
        # [tpre, tpre + own_t] regardless of WHEN it was admitted, so the
        # cache capacity (and the KV read) is bounded by the slot's own
        # length, not the global step (finished slots clamp at the last
        # column; their output is discarded)
        own_c = jnp.minimum(own_t, cap_own)
        positions = (prompt_lens + bos + own_c)[:, None]
        key_valid = jnp.concatenate(
            [pre_valid, jnp.zeros((b, c_cap - tpre), bool)], axis=1
        )
        step_valid = jnp.logical_or(
            key_valid, jnp.logical_and(
                slot_idx >= tpre, slot_idx <= tpre + own_c[:, None]
            ),
        )
        bias = mask_ops.mask_to_bias(
            jnp.logical_not(step_valid)[:, None, None, :], jnp.float32
        )
        kv_lengths = None
        if ragged_decode:
            # per-slot ragged reads: a slot reads exactly its OWN live region
            # [0, tpre + own_c]; finished slots read nothing
            kv_lengths = jnp.where(
                finished, 0, tpre + own_c + 1
            ).astype(jnp.int32)
        logits2, new_cache = model.apply(
            variables, tok[:, None], positions, cache,
            (tpre + own_c).astype(jnp.int32), bias,
            None, None, kv_lengths=kv_lengths, method="ar_decode_step",
        )
        return (
            tuple(new_cache), logits2, tokens, t + 1, finished, gen_len,
            start_t, pre_valid, x_lens, prompt_lens, stop_lens, key,
        )

    return jax.lax.while_loop(cond, body, state)


def serve_continuous(
    model,
    variables,
    rng: jax.Array,
    requests: Dict[str, np.ndarray],
    *,
    batch_size: int,
    cap_steps: int = 2048,
    chunk: int = 128,
    admit_width: int = 32,
    top_k: int = -100,
    top_p: float = 1.0,
    temperature: float = 1.0,
    forbid_eos: bool = False,
    nar_bucket: int = 512,
    ragged_decode: bool = False,
) -> List[Dict[str, np.ndarray]]:
    """Serve ``requests`` (any R >= 1) with slot refill.

    requests: {"x": (R,S), "x_lens": (R,), "prompts": (R,P,Q),
    "prompt_lens": (R,), "stop_lens": (R,)} host arrays (stop_lens models
    per-request EOS/length caps, as in the gen_mix bench).
    Returns one {"codes": (len,Q), "length": int} per request, in order.
    """
    assert model.variant == "valle", "continuous scheduler: VALL-E only"
    r_total = requests["x"].shape[0]
    b = batch_size
    eos_like = jnp.iinfo(jnp.int32).max // 2

    take = lambda k, idx: jnp.asarray(requests[k][idx])
    max_stop = int(np.max(requests["stop_lens"]))
    assert max_stop < cap_steps, (
        f"cap_steps={cap_steps} cannot finish a stop_lens={max_stop} request"
    )

    def _fresh_state(ridx_real: np.ndarray, key: jax.Array):
        """Build a full state over ``ridx_real`` requests (padded to ``b``
        with rows whose stop_lens=1, which finish at the first step and
        become free slots; they are never registered in slot_req)."""
        n = len(ridx_real)
        ridx = np.zeros((b,), np.int64)
        ridx[:n] = ridx_real
        stop = np.asarray(requests["stop_lens"][ridx], np.int32).copy()
        stop[n:] = 1
        logits, parts, pre_valid = _prefill_parts(
            model, variables, take("x", ridx), take("x_lens", ridx),
            take("prompts", ridx), take("prompt_lens", ridx),
        )
        tpre = pre_valid.shape[1]
        # fixed capacity: every slot's generated region is
        # [tpre, tpre+own_len] (per-slot write columns), so the cache need
        # only hold the LONGEST single request — not the global step count
        c_cap = tpre + max_stop + 1
        cache = tuple(
            jnp.zeros((p.shape[0], b, c_cap) + p.shape[3:], p.dtype)
            .at[:, :, :tpre].set(p)
            for p in parts
        )
        state = (
            cache,
            logits,
            jnp.zeros((b, cap_steps), jnp.int32),
            jnp.zeros((), jnp.int32),
            jnp.zeros((b,), bool),
            jnp.full((b,), eos_like, jnp.int32),
            jnp.zeros((b,), jnp.int32),  # start_t
            pre_valid,
            take("x_lens", ridx),
            take("prompt_lens", ridx),
            jnp.asarray(stop),
            key,
        )
        return state, tpre, {i: int(ridx_real[i]) for i in range(n)}

    state, tpre, slot_req = _fresh_state(
        np.arange(min(b, r_total)), rng
    )
    next_req = len(slot_req)
    harvested: Dict[int, Dict] = {}
    seg_kwargs = dict(tpre=tpre, top_k=top_k, top_p=top_p,
                      temperature=temperature, forbid_eos=forbid_eos,
                      ragged_decode=ragged_decode)

    seg_end = chunk
    while True:
        state = _segment(model, variables, state,
                         jnp.asarray(seg_end, jnp.int32), **seg_kwargs)
        t_now = int(state[3])
        finished = np.asarray(state[4])
        gen_len = np.asarray(state[5])
        start_t = np.asarray(state[6])
        tokens_host = None
        for s_i in list(slot_req):
            if finished[s_i]:
                if tokens_host is None:
                    tokens_host = np.asarray(state[2])
                L = int(gen_len[s_i])
                st = int(start_t[s_i])
                harvested[slot_req.pop(s_i)] = {
                    "tokens": tokens_host[s_i, st : st + L].copy(),
                    "length": L,
                }
        # every slot not serving a live request (just-harvested rows AND
        # padding rows from a partial fresh state) is admissible
        free_slots = [i for i in range(b) if i not in slot_req]
        # admit while there is queue, a free slot, and room to finish:
        # a slot admitted at t_now with stop s is marked finished by the
        # body executing at global step t_now + s, and the last body
        # execution is at cap_steps - 1 — hence the strict <.
        admissions = []
        while (free_slots and next_req < r_total
               and t_now + int(requests["stop_lens"][next_req])
               < cap_steps):
            s_i = free_slots.pop()
            admissions.append((s_i, next_req))
            slot_req[s_i] = next_req
            next_req += 1
        if admissions:
            for a0 in range(0, len(admissions), admit_width):
                grp = admissions[a0 : a0 + admit_width]
                slots = np.full((admit_width,), b, np.int32)  # b = dropped
                ridx = np.zeros((admit_width,), np.int64)
                for j, (s_i, r_i) in enumerate(grp):
                    slots[j], ridx[j] = s_i, r_i
                state = _admit(
                    model, variables, state, jnp.asarray(slots),
                    take("x", ridx), take("x_lens", ridx),
                    take("prompts", ridx), take("prompt_lens", ridx),
                    take("stop_lens", ridx),
                )
        if not slot_req:
            if next_req >= r_total:
                break  # every slot drained and nothing left to admit
            # the remaining step budget blocked admission while requests
            # were still queued: restart with a fresh state (global step
            # back to 0) over the remaining queue instead of silently
            # dropping it
            nxt = np.arange(next_req, min(next_req + b, r_total))
            key = state[11]
            state, tpre, slot_req = _fresh_state(nxt, key)
            next_req = int(nxt[-1]) + 1
            seg_end = 0
        if seg_end >= cap_steps:
            raise RuntimeError(
                f"cap_steps={cap_steps} exhausted with "
                f"{len(slot_req)} slots live"
            )
        seg_end += min(chunk, cap_steps - seg_end)

    # ---------------- NAR refinement in full drain batches ------------------
    results: List[Optional[Dict]] = [None] * r_total
    order = sorted(harvested)
    for g0 in range(0, len(order), b):
        grp = order[g0 : g0 + b]
        tok = np.zeros((b, nar_bucket), np.int32)
        lens = np.zeros((b,), np.int32)
        ridx = np.zeros((b,), np.int64)
        for j, r_i in enumerate(grp):
            h = harvested[r_i]
            L = min(h["length"], nar_bucket)
            tok[j, :L] = h["tokens"][:L]
            lens[j] = L
            ridx[j] = r_i
        codes = np.asarray(nar_refine(
            model, variables, take("x", ridx), take("x_lens", ridx),
            take("prompts", ridx), take("prompt_lens", ridx),
            jnp.asarray(tok), jnp.asarray(lens),
        ))
        for j, r_i in enumerate(grp):
            L = int(lens[j])
            results[r_i] = {"codes": codes[j, :L], "length": L}
    assert all(r is not None for r in results), "scheduler dropped a request"
    return results
