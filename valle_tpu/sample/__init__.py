"""Batched zero-shot generation: compiled AR sampling loop + NAR refinement.

Reference semantics (ref /root/reference/valle/models/valle.py:961-1137):
  - AR loop samples codebook-1 tokens with top-k/top-p/temperature until the
    triple stop condition (argmax EOS | sampled EOS | length > 16x text len),
    discarding the stopping sample (ref valle.py:1044-1057).
  - 7 NAR passes greedily refine codebooks 2..8, accumulating embeddings of
    prior-stage samples, with prompt embeddings folded in per prefix mode
    (ref valle.py:1085-1134).

TPU-native design: the AR loop is a ``lax.while_loop`` over a preallocated
KV-cache (the reference recomputes full attention per token with a growing
tensor).  Prompts are right-aligned in a fixed prompt region so every
sequence's next-token slot is uniform across the batch, giving static cache
writes; per-sequence audio positions keep positional-embedding parity.  The
whole thing jits once per (S, P, max_new) bucket and runs for any batch.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from valle_tpu.ops import masks as mask_ops
from valle_tpu.ops.sampling import topk_sampling


def _right_align(tokens: jnp.ndarray, lens: jnp.ndarray, cap: int, bos_id=None):
    """(B, P) tokens with per-seq lens -> (B, cap(+1 if bos)) right-aligned.

    Returns (aligned_tokens, positions, valid) where positions are the
    per-sequence audio positions (BOS at 0, code i at i+has_bos) and valid
    marks real (non-filler) slots.
    """
    b, p = tokens.shape
    has_bos = bos_id is not None
    cap_total = cap + int(has_bos)
    slot = jnp.arange(cap_total)[None, :]  # (1, cap_total)
    shift = cap_total - lens[:, None] - int(has_bos)  # first real slot per seq
    rel = slot - shift - int(has_bos)  # index into tokens; -1 = BOS slot
    src = jnp.clip(rel, 0, max(p - 1, 0))
    if p > 0:
        vals = jnp.take_along_axis(tokens, src, axis=1)
    else:
        vals = jnp.zeros((b, cap_total), tokens.dtype)
    if has_bos:
        vals = jnp.where(rel == -1, jnp.asarray(bos_id, tokens.dtype), vals)
        valid = rel >= -1
    else:
        valid = rel >= 0
    vals = jnp.where(valid, vals, 0)
    positions = jnp.clip(rel + int(has_bos), 0, None)
    return vals, positions, valid


def _prefill_kv(model, variables, x, x_lens, prompt_codes, prompt_lens):
    """AR prefill over [text ; right-aligned prompt].

    Returns (last_logits, kv (L,B,Tpre,H,Dh) pair, memory-or-None,
    key_pad_pre (B,Tpre), mem_bias, tpre, ppad).  Shared by ``generate`` and
    the continuous-batching scheduler's slot re-prefill."""
    cfg = model.cfg
    b, s = x.shape
    p = prompt_codes.shape[1]
    bos = int(cfg.prepend_bos)
    is_vallf = model.variant == "vallf"
    x_mask = mask_ops.make_pad_mask(x_lens, s)
    mem_bias = mask_ops.mask_to_bias(x_mask[:, None, None, :], jnp.float32)
    prompt0 = prompt_codes[..., 0].astype(jnp.int32)
    ar_tokens, ar_positions, ar_valid = _right_align(
        prompt0, prompt_lens, p, bos_id=cfg.bos_id if bos else None
    )
    ppad = ar_tokens.shape[1]  # p + bos
    if is_vallf:
        # VALL-F caches only the audio side; text is cross-attn memory.
        tpre = ppad
        struct = mask_ops.causal_mask(ppad)
        key_pad_pre = jnp.logical_not(ar_valid)
    else:
        tpre = s + ppad
        struct = mask_ops.prefix_lm_attn_mask(s, ppad)
        key_pad_pre = jnp.concatenate([x_mask, jnp.logical_not(ar_valid)], axis=1)
    pre_bias = mask_ops.mask_to_bias(
        mask_ops.merge_padding(struct, key_pad_pre), jnp.float32
    )
    last_logits, kv, memory = model.apply(
        variables,
        x,
        ar_tokens,
        ar_positions,
        pre_bias,
        mem_bias,
        method="ar_prefill",
    )
    return last_logits, kv, memory, key_pad_pre, mem_bias, tpre, ppad


@functools.partial(
    jax.jit,
    static_argnames=(
        "model",
        "top_k",
        "top_p",
        "temperature",
        "max_new_tokens",
        "forbid_eos",
        "ragged_decode",
    ),
)
def generate(
    model,
    variables,
    rng: jax.Array,
    x: jnp.ndarray,
    x_lens: jnp.ndarray,
    prompt_codes: jnp.ndarray,
    prompt_lens: Optional[jnp.ndarray] = None,
    *,
    top_k: int = -100,
    top_p: float = 1.0,
    temperature: float = 1.0,
    max_new_tokens: int = 1024,
    forbid_eos: bool = False,
    stop_lens: Optional[jnp.ndarray] = None,
    nar_text: Optional[jnp.ndarray] = None,
    nar_text_lens: Optional[jnp.ndarray] = None,
    ragged_decode: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Batched zero-shot TTS generation.

    Args:
      x: (B, S) phoneme ids (enrolled + synthesis text for prefix modes 2/4).
      prompt_codes: (B, P, Q) EnCodec codes of the acoustic prompt.
      prompt_lens: (B,) valid prompt lengths (default: full P).
      stop_lens: optional (B,) per-sequence generation caps — sequence i is
        finished once it has i's cap tokens even if EOS never fires (serving
        knob: per-request max length; also how the realistic-length bench
        models mixed EOS stopping).  The while_loop's all-finished cond exits
        the AR loop as soon as every sequence hit EOS or its cap.
      nar_text / nar_text_lens: text for the NAR passes when it differs from
        ``x`` (prefix modes 2/4 drop the enrolled phonemes,
        ref valle.py:1068-1079).
      ragged_decode: route each decode step's cache read through the ragged
        Pallas kernel (ops/ragged_decode.py): finished slots read NOTHING
        (length 0), live slots read exactly [0, tpre + t + 1).  Exact
        greedy parity with the dense path, but MEASURED SLOWER on v5e
        (the Pallas pipeline cannot elide the dead blocks' fetches — see
        the kernel's docstring / docs/perf_notes.md round 5); keep False
        for serving.

    Returns {"codes": (B, max_new, Q) int32, "lengths": (B,) int32}.
    """
    cfg = model.cfg
    b, s = x.shape
    p = prompt_codes.shape[1]
    q = cfg.num_quantizers
    eos = cfg.eos_id
    bos = int(cfg.prepend_bos)
    if prompt_lens is None:
        prompt_lens = jnp.full((b,), p, jnp.int32)
    if nar_text is None:
        nar_text, nar_text_lens = x, x_lens

    is_vallf = model.variant == "vallf"
    last_logits, kv, memory, key_pad_pre, mem_bias, tpre, ppad = _prefill_kv(
        model, variables, x, x_lens, prompt_codes, prompt_lens
    )
    # kv: tuple of (k, v), each (L, B, Tpre, H, Dh)
    k_pre, v_pre = kv
    num_layers, _, _, h, dh = k_pre.shape

    # Chunked cache growth: decode in CHUNK-step segments, segment j's cache
    # sized tpre + (j+1)*CHUNK.  HBM traffic per step scales with the live
    # prefix (rounded up) instead of the worst-case tpre + max_new — decode
    # is KV-read-bound, so average speedup ~ C_max / C_avg.
    chunk = min(128, max_new_tokens)
    c0 = tpre + chunk
    if cfg.kv_cache_dtype == "int8":
        # int8 cache + per-(token, head) f32 scales: halves the KV read.
        from valle_tpu.nn.attention import quantize_kv

        k8, ks0 = quantize_kv(k_pre)
        v8, vs0 = quantize_kv(v_pre)
        k_cache = jnp.zeros((num_layers, b, c0, h, dh), jnp.int8)
        v_cache = jnp.zeros_like(k_cache)
        k_scale = jnp.zeros((num_layers, b, c0, h), jnp.float32)
        v_scale = jnp.zeros_like(k_scale)
        zero5, zero4 = (0, 0, 0, 0, 0), (0, 0, 0, 0)
        cache = (
            jax.lax.dynamic_update_slice(k_cache, k8, zero5),
            jax.lax.dynamic_update_slice(v_cache, v8, zero5),
            jax.lax.dynamic_update_slice(k_scale, ks0, zero4),
            jax.lax.dynamic_update_slice(v_scale, vs0, zero4),
        )
    else:
        k_cache = jnp.zeros((num_layers, b, c0, h, dh), k_pre.dtype)
        v_cache = jnp.zeros_like(k_cache)
        cache = (
            jax.lax.dynamic_update_slice(k_cache, k_pre, (0, 0, 0, 0, 0)),
            jax.lax.dynamic_update_slice(v_cache, v_pre, (0, 0, 0, 0, 0)),
        )

    pre_valid = jnp.logical_not(key_pad_pre)  # (B, Tpre)

    tokens0 = jnp.zeros((b, max_new_tokens), jnp.int32)
    state = (
        cache,
        last_logits,
        tokens0,
        jnp.zeros((), jnp.int32),  # t
        jnp.zeros((b,), bool),  # finished
        jnp.full((b,), max_new_tokens, jnp.int32),  # gen_len
        rng,
    )

    def make_cond(seg_end):
        def cond(state):
            _, _, _, t, finished, _, _ = state
            return jnp.logical_and(
                t < seg_end, jnp.logical_not(jnp.all(finished))
            )

        return cond

    def body(state):
        cache, logits, tokens, t, finished, gen_len, key = state
        c_seg = cache[0].shape[2]
        key_valid = jnp.concatenate(
            [pre_valid, jnp.zeros((b, c_seg - tpre), bool)], axis=1
        )
        slot_idx = jnp.arange(c_seg)[None, :]
        key, sub = jax.random.split(key)
        if forbid_eos:
            # benchmark / min-length mode: EOS can never be sampled or win
            logits = logits.at[:, eos].set(-1e9)
        samples = topk_sampling(
            sub, logits, top_k=top_k, top_p=top_p, temperature=temperature
        )  # (B,)
        argmax_eos = jnp.argmax(logits, axis=-1) == eos
        # ref valle.py:1047: (y.shape[1] - prompts.shape[1]) > 16 * x_len,
        # where y includes the BOS when prepend_bos is on.
        too_long = (t + bos) > x_lens * 16
        if stop_lens is not None:
            too_long = jnp.logical_or(too_long, t >= stop_lens)
        stop_now = jnp.logical_or(
            jnp.logical_or(argmax_eos, samples == eos), too_long
        )
        newly = jnp.logical_and(stop_now, jnp.logical_not(finished))
        gen_len = jnp.where(newly, t, gen_len)
        finished = jnp.logical_or(finished, stop_now)

        tok = jnp.where(finished, eos, samples).astype(jnp.int32)
        tokens = jax.lax.dynamic_update_slice(tokens, tok[:, None], (0, t))

        positions = (prompt_lens + bos + t)[:, None]
        step_valid = jnp.logical_or(
            key_valid,
            jnp.logical_and(slot_idx >= tpre, slot_idx <= tpre + t),
        )
        bias = mask_ops.mask_to_bias(
            jnp.logical_not(step_valid)[:, None, None, :], jnp.float32
        )
        kv_lengths = None
        if ragged_decode:
            # finished slots read nothing (their sampled output is forced to
            # EOS and discarded); live slots read [0, tpre + t] inclusive
            kv_lengths = jnp.where(finished, 0, tpre + t + 1).astype(jnp.int32)
        logits2, new_cache = model.apply(
            variables,
            tok[:, None],
            positions,
            cache,
            tpre + t,
            bias,
            memory,
            mem_bias,
            kv_lengths=kv_lengths,
            method="ar_decode_step",
        )
        return (
            tuple(new_cache),
            logits2,
            tokens,
            t + 1,
            finished,
            gen_len,
            key,
        )

    for seg_end in range(chunk, max_new_tokens + 1, chunk):
        state = jax.lax.while_loop(make_cond(seg_end), body, state)
        if seg_end < max_new_tokens:
            grow = min(chunk, max_new_tokens - seg_end)
            grown = tuple(
                jnp.pad(c, ((0, 0), (0, 0), (0, grow)) + ((0, 0),) * (c.ndim - 3))
                for c in state[0]
            )
            state = (grown,) + state[1:]
    if max_new_tokens % chunk:
        state = jax.lax.while_loop(make_cond(max_new_tokens), body, state)
    _, _, tokens, _, _, gen_len, _ = state

    gen_valid = jnp.arange(max_new_tokens)[None, :] < gen_len[:, None]
    tokens = jnp.where(gen_valid, tokens, 0)

    if q == 1:
        return {"codes": tokens[..., None], "lengths": gen_len}

    codes = _nar_refine(
        model, variables, nar_text, nar_text_lens, prompt_codes, prompt_lens,
        tokens, gen_len,
    )
    return {"codes": codes, "lengths": gen_len}


def _nar_refine(
    model, variables, nar_text, nar_text_lens, prompt_codes, prompt_lens,
    tokens, gen_len,
):
    """NAR refinement of AR codebook-1 ``tokens`` (B, T_gen) -> (B, T_gen, Q)
    codes (ref valle.py:1085-1134).  Shared by ``generate`` (traced inline)
    and the continuous-batching scheduler (via the jitted ``nar_refine``)."""
    cfg = model.cfg
    q = cfg.num_quantizers
    p = prompt_codes.shape[1]
    max_new_tokens = tokens.shape[1]
    is_vallf = model.variant == "vallf"
    prompt0 = prompt_codes[..., 0].astype(jnp.int32)
    gen_valid = jnp.arange(max_new_tokens)[None, :] < gen_len[:, None]

    sn = nar_text.shape[1]
    nar_x_mask = mask_ops.make_pad_mask(nar_text_lens, sn)
    x_emb = model.apply(variables, nar_text, method="nar_text_encode")

    pr_tokens, pr_positions, pr_valid = _right_align(prompt0, prompt_lens, p)
    gen_positions = prompt_lens[:, None] + jnp.arange(max_new_tokens)[None, :]
    positions = jnp.concatenate([pr_positions, gen_positions], axis=1)
    y_pad = jnp.concatenate(
        [jnp.logical_not(pr_valid), jnp.logical_not(gen_valid)], axis=1
    )
    nar_mem_bias = mask_ops.mask_to_bias(nar_x_mask[:, None, None, :], jnp.float32)
    if is_vallf:
        bias = mask_ops.mask_to_bias(y_pad[:, None, None, :], jnp.float32)
        gen_start = p
    else:
        key_pad = jnp.concatenate([nar_x_mask, y_pad], axis=1)
        bias = mask_ops.mask_to_bias(key_pad[:, None, None, :], jnp.float32)
        gen_start = sn + p

    y_all0 = jnp.concatenate([pr_tokens, tokens], axis=1)
    y_emb = model.apply(variables, y_all0, method="nar_embed0")

    def prompt_rest(j):
        pc, _, _ = _right_align(
            prompt_codes[..., j + 1].astype(jnp.int32), prompt_lens, p
        )
        emb = model.apply(variables, j, pc, method="nar_embed_rest")
        return emb * pr_valid[..., None]

    if cfg.prefix_mode != 0:
        # fold all prompt codebooks in upfront (ref valle.py:1110-1113)
        for j in range(q - 1):
            y_emb = y_emb.at[:, :p].add(prompt_rest(j))

    codes = [tokens]
    for i in range(q - 1):
        samples = model.apply(
            variables,
            i,
            y_emb,
            positions,
            x_emb,
            bias,
            gen_start,
            nar_mem_bias,
            method="nar_forward_stage",
        )
        samples = jnp.where(gen_valid, samples, 0)
        codes.append(samples)
        if i < q - 2:
            if cfg.prefix_mode == 0:
                y_emb = y_emb.at[:, :p].add(prompt_rest(i))
            gen_emb = model.apply(variables, i, samples, method="nar_embed_rest")
            y_emb = y_emb.at[:, p:].add(gen_emb * gen_valid[..., None])

    return jnp.stack(codes, axis=-1)


nar_refine = jax.jit(_nar_refine, static_argnames=("model",))


@functools.partial(jax.jit, static_argnames=("model",))
def continual(
    model,
    variables,
    x: jnp.ndarray,
    x_lens: jnp.ndarray,
    y: jnp.ndarray,
    y_lens: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Continual task (ref valle.py:1139-1238): keep codebook 1 of the given
    codes; use the first min(T/2, 3 s) as the acoustic prompt and re-generate
    codebooks 2..8 for the remainder with the NAR decoder (greedy).

    The prefix split is PER SEQUENCE: min(y_lens[b] // 2, 225) from each
    row's true length (the reference is batch-1 and unpadded, so its
    ``y.shape[1]`` at ref valle.py:1173 IS the true length; a batched port
    must not substitute the padded width, or a short row's prompt would
    swallow more than half of its own audio).  Each returned row is
    left-shifted so its regenerated region starts at index 0;
    ``lengths[b] = y_lens[b] - prefix_len[b]``."""
    cfg = model.cfg
    b, t, q = y.shape
    if y_lens is None:
        y_lens = jnp.full((b,), t, jnp.int32)
    # per-sequence prefix from the TRUE length (ref valle.py:1173)
    plen = jnp.minimum(y_lens // 2, 3 * 75).astype(jnp.int32)  # (B,)

    s = x.shape[1]
    x_mask = mask_ops.make_pad_mask(x_lens, s)
    x_emb = model.apply(variables, x, method="nar_text_encode")
    is_vallf = model.variant == "vallf"

    y0 = y[..., 0].astype(jnp.int32)
    y_emb = model.apply(variables, y0, method="nar_embed0")
    y_mask = mask_ops.make_pad_mask(y_lens, t)
    nar_mem_bias = mask_ops.mask_to_bias(x_mask[:, None, None, :], jnp.float32)
    if is_vallf:
        bias = mask_ops.mask_to_bias(y_mask[:, None, None, :], jnp.float32)
        gen_start = 0
    else:
        key_pad = jnp.concatenate([x_mask, y_mask], axis=1)
        bias = mask_ops.mask_to_bias(key_pad[:, None, None, :], jnp.float32)
        gen_start = s

    positions = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))
    prefix_sel = (jnp.arange(t)[None, :] < plen[:, None])[..., None]

    def add_prompt(i):
        emb = model.apply(
            variables, i, y[:, :, i + 1].astype(jnp.int32), method="nar_embed_rest"
        )
        return emb * prefix_sel

    if cfg.prefix_mode != 0:
        acc = y_emb
        for j in range(q - 1):
            acc = acc + add_prompt(j)
        y_emb = acc

    lengths = jnp.maximum(y_lens - plen, 0)
    # per-row left shift: output index j <- input position plen_b + j
    shift_idx = jnp.minimum(
        jnp.arange(t)[None, :] + plen[:, None], t - 1
    )
    out_valid = jnp.arange(t)[None, :] < lengths[:, None]

    def out_row(vals):  # (B, t) predictions at audio positions -> shifted
        return jnp.where(
            out_valid, jnp.take_along_axis(vals, shift_idx, axis=1), 0
        )

    codes = [out_row(y0)]
    gen_sel = (jnp.arange(t)[None, :] >= plen[:, None])[..., None]
    for i in range(q - 1):
        samples = model.apply(
            variables,
            i,
            y_emb,
            positions,
            x_emb,
            bias,
            gen_start,
            nar_mem_bias,
            method="nar_forward_stage",
        )
        codes.append(out_row(samples))
        if i < q - 2:
            if cfg.prefix_mode == 0:
                y_emb = y_emb + add_prompt(i)
            gen_emb = model.apply(
                variables, i, samples, method="nar_embed_rest"
            )
            y_emb = y_emb + gen_emb * gen_sel
    return {
        "codes": jnp.stack(codes, axis=-1),
        "lengths": lengths,
    }
