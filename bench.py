"""Benchmark: batched zero-shot generation + flagship training step, one chip.

Prints ONE JSON line; the headline metric is generation throughput:
  {"metric": "audio_seconds_per_s_per_chip", "value": N, "unit": "s/s/chip",
   "vs_baseline": N, "train": {...}}

The north-star target is >= 50 generated audio-seconds per wall second per
chip (BASELINE.json); vs_baseline is value / 50.  The flagship config
(decoder-dim 1024, 16 heads, 12 AR + 12 NAR layers, 8 codebooks, bf16,
int8 KV-cache — the measured best of the attn x cache sweep, see
docs/perf_notes.md) runs the full pipeline: AR KV-cache sampling loop +
7 NAR refinement passes.  EnCodec frame rate 75 Hz converts tokens to audio
seconds.

The "train" sub-object benchmarks BASELINE config 3 (AR training,
max-duration-80-equivalent batch, bf16, grad-accum 4, ScaledAdam) and
reports audio-frames/s, step time, and MFU against the chip's bf16 peak.

Modes (for profiling; the driver runs plain `python bench.py`):
  python bench.py                 # generate (w8a8 + bf16) + both train
                                  # stages, one JSON line
  python bench.py sweep           # attn_impl x kv_cache_dtype sweep
  python bench.py phase           # AR-only vs full vs B=256 decomposition
  python bench.py qsweep          # bf16 vs w8 vs w8a8 serving quantization
  python bench.py gen_mix         # realistic-length traffic scenarios
  python bench.py ragged_ab       # ragged decode kernel A/B (negative)
  python bench.py continuous      # continuous batching A/B (negative)
  python bench.py nar_phase       # NAR pass decomposition probe
  python bench.py attn_int8_probe # int8 attention probe (negative result)
  python bench.py tokenize        # EnCodec corpus-encode throughput
  python bench.py train_nar       # NAR/two-stage training (fp32 + bf16)
  python bench.py train_geom      # micro-batch geometry sweep
  python bench.py train_sweep     # remat policy x attn_impl sweep
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from valle_tpu.utils.flops import chip_peak_flops, train_step_flops


def _build_generate(batch=128, nq=8, attn_impl="xla", kv="int8", max_new=512,
                    quant="none", ragged=False):
    """quant: "none" | "w8" (int8 weights) | "w8a8" (+dynamic act quant).
    ragged: per-slot length-clipped decode reads (ops/ragged_decode.py)."""
    from valle_tpu.models import ModelConfig, VALLE
    from valle_tpu.sample import generate

    cfg = ModelConfig(dtype="bfloat16", num_quantizers=nq,
                      attn_impl=attn_impl, kv_cache_dtype=kv,
                      act_quant=(quant == "w8a8"))
    model = VALLE(cfg)
    rng = jax.random.PRNGKey(0)
    s, p = 64, 225
    x = jax.random.randint(rng, (batch, s), 0, cfg.num_text_tokens)
    x_lens = jnp.full((batch,), s, jnp.int32)
    prompt = jax.random.randint(rng, (batch, p, cfg.num_quantizers), 0,
                                cfg.num_audio_tokens)
    dummy_y = jax.random.randint(rng, (batch, 64, cfg.num_quantizers), 0,
                                 cfg.num_audio_tokens)
    init = jax.jit(
        lambda k: model.init(
            {"params": k, "stage": k},
            x, x_lens, dummy_y, jnp.full((batch,), 64, jnp.int32),
            train_stage=0, deterministic=True, nar_stage=jnp.asarray(2),
        )
    )
    variables = init(rng)
    if quant != "none":
        from valle_tpu.nn.qdense import quantize_variables

        variables = jax.jit(quantize_variables)(variables)

    def run(key, stop_lens=None):
        return generate(model, variables, key, x, x_lens, prompt,
                        top_k=10, temperature=1.0, max_new_tokens=max_new,
                        forbid_eos=True,  # full-length decode (no lucky EOS)
                        stop_lens=stop_lens, ragged_decode=ragged)

    return run


def bench_generate(batch=256, nq=8, attn_impl="xla", kv="int8",
                   iters=3, max_new=512, label=None, quant="none",
                   realistic_mix=False, ragged=False):
    """Default B=256: amortizes the per-step weight read over more sequences
    (measured 174 vs 157 audio-s/s at B=128, docs/perf_notes.md)."""
    from valle_tpu import macros

    run = _build_generate(batch, nq, attn_impl, kv, max_new, quant,
                          ragged=ragged)
    stop_lens = None
    if realistic_mix:
        # mixed-length traffic: per-seq EOS-equivalent stops, 2-6.8 s audio
        stop_lens = jnp.asarray(
            np.random.RandomState(0).randint(150, max_new + 1, batch), jnp.int32
        )
    # compile + warmup; NOTE: host transfer (np.asarray) is the sync point —
    # block_until_ready returns early through the axon tunnel.
    out = run(jax.random.PRNGKey(1), stop_lens)
    _ = np.asarray(out["codes"])

    t0 = time.perf_counter()
    total_tokens = 0
    for i in range(iters):
        out = run(jax.random.PRNGKey(2 + i), stop_lens)
        total_tokens += int(np.asarray(out["lengths"]).sum())
    dt = time.perf_counter() - t0
    thr = total_tokens / macros.AUDIO_FRAME_RATE / dt
    if label:
        print(f"{label}: {dt/iters:.3f}s/iter  {thr:.1f} audio-s/s",
              file=sys.stderr, flush=True)
    return thr


def functools_partial_lstm(em, unroll):
    """lstm-only probe fn for decode_phase (module-level for jit clarity)."""
    return lambda lp, x: jnp.sum(em.lstm_stack(lp, x, unroll=unroll))


def bench_tokenize(batch=16, seconds=10.0, iters=5, label=None,
                   decode=False):
    """Corpus EnCodec-encode throughput in audio-s/s on the chip — the
    wall-clock gate of dataset preparation (ref hot loop
    bin/tokenizer.py:198-206 runs this batched on GPU; ours is
    bin/tokenize_dataset.py --batch-frames).  ``decode=True`` measures the
    codes->wav direction instead (the serving post-process)."""
    codec = _build_codec()
    n = int(seconds * codec.sample_rate)
    if decode:
        codes = np.random.RandomState(0).randint(
            0, 1024, (batch, int(seconds * 75), 8)).astype(np.int32)
        run = lambda: np.asarray(codec.decode(codes))
    else:
        wav = (np.random.RandomState(0).randn(batch, 1, n).astype(np.float32)
               * 0.1)
        run = lambda: np.asarray(codec.encode(wav))
    _ = run()  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        _ = run()
    dt = (time.perf_counter() - t0) / iters
    thr = batch * seconds / dt
    if label:
        print(f"{label}: B={batch} {dt:.3f}s/batch  {thr:.1f} audio-s/s",
              file=sys.stderr, flush=True)
    return thr


def _build_codec():
    """Random-weight EnCodec through the real state-dict converter (weight
    values don't affect throughput)."""
    import torch
    from transformers import EncodecConfig as HFConfig, EncodecModel

    from valle_tpu.codec.convert import convert_encodec_state_dict
    from valle_tpu.codec.encodec_model import EncodecJax

    torch.manual_seed(0)
    hf = EncodecModel(HFConfig())
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    return EncodecJax(convert_encodec_state_dict(sd))


def bench_end_to_end(batch=256, iters=3, max_new=512, quant="w8a8",
                     decode_chunk=128, pipelined=True, label=None,
                     codec_dtype="float32"):
    """North-star WAV-OUT serving rate: token generation -> EnCodec decode ->
    int16 waveforms fetched to the host, per wall second per chip.

    The round-3 headline excluded codec decode (ref bin/infer.py:251-257
    decodes after generation); this measures the full thing.  One chip runs
    both phases, so the rate composes as 1/(1/gen + 1/dec) — the lever is
    decode throughput (round 4: LSTM input-proj hoist + scan unroll + flat
    RVQ gather took decode 176 -> ~1000+ audio-s/s, docs/perf_notes.md).

    ``pipelined=True`` dispatches iteration i+1's generation before fetching
    iteration i's wavs, so the device->host wav transfer (int16, converted
    on device) rides under the next batch's compute instead of serializing
    after it.
    """
    from valle_tpu import macros

    run = _build_generate(batch, 8, "xla", "int8", max_new, quant)
    codec = _build_codec()
    if codec_dtype != "float32":
        from valle_tpu.codec.encodec_model import EncodecJax

        codec = EncodecJax(codec.params, decode_dtype=codec_dtype)
    hop = codec.cfg.hop_length

    def decode_all(codes):
        return [
            codec.decode(codes[j : j + decode_chunk], out_int16=True)
            for j in range(0, batch, decode_chunk)
        ]

    # compile + warmup both programs
    out = run(jax.random.PRNGKey(1))
    wavs = decode_all(out["codes"])
    _ = [np.asarray(w) for w in wavs]

    t0 = time.perf_counter()
    total_tokens = 0
    pending = None
    nsamples = 0
    for i in range(iters):
        out = run(jax.random.PRNGKey(2 + i))
        wavs = decode_all(out["codes"])
        total_tokens += batch * max_new  # forbid_eos: full-length decode
        if not pipelined:
            host = [np.asarray(w) for w in wavs]
            nsamples += sum(h.size for h in host)
            continue
        if pending is not None:  # fetch batch i-1 while batch i computes
            host = [np.asarray(w) for w in pending]
            nsamples += sum(h.size for h in host)
        pending = wavs
    if pending is not None:
        host = [np.asarray(w) for w in pending]
        nsamples += sum(h.size for h in host)
    dt = time.perf_counter() - t0
    thr = total_tokens / macros.AUDIO_FRAME_RATE / dt
    assert nsamples == iters * batch * max_new * hop  # every sample landed
    if label:
        print(f"{label}: {dt / iters:.3f}s/iter  {thr:.1f} audio-s/s wav-out",
              file=sys.stderr, flush=True)
    return thr


def bench_train(accum=4, batch=8, s=128, t=752, iters=5, train_stage=1,
                prompt_len=0, dtype="bfloat16", **cfg_overrides):
    """Flagship AR training step (BASELINE config 3): bf16, grad-accum 4,
    ~80 s of audio per micro-batch (8 utts x ~10 s at 75 Hz), ScaledAdam.

    train_stage=2 benchmarks BASELINE config 4 instead (NAR stage, prefix-
    mode-4 prompted features; pass prompt_len=225 for the 3 s prompts and
    batch=4 for the max-duration-40 recipe, ref README.md:106-112).

    Returns {audio_frames_per_s, tokens_per_s, step_time_s, mfu}.
    """
    from valle_tpu.models import ModelConfig, VALLE
    from valle_tpu.optim import eden_lr, scaled_adam, valle_batched_axis
    from valle_tpu.train.step import init_train_state, make_train_step

    # Measured round-3 winners (docs/perf_notes.md): the custom fused Pallas
    # attention kernel (in-register dropout, in-kernel prefix mask) never
    # materializes the O(T^2) probs, so remat is unnecessary — 0.425 s/step
    # MFU 39.5% vs 0.576/29.1% for round 2's xla+full-remat.
    cfg_overrides.setdefault("remat", "none")
    cfg_overrides.setdefault("attn_impl", "fused")
    if train_stage == 2:
        cfg_overrides.setdefault("prefix_mode", 4)
    cfg = ModelConfig(dtype=dtype, **cfg_overrides)
    model = VALLE(cfg)
    tx = scaled_adam(learning_rate=0.05, clipping_scale=2.0,
                     batched_axis_fn=valle_batched_axis)

    rng = jax.random.PRNGKey(0)
    batch_arrays = {
        "text_tokens": jax.random.randint(rng, (accum, batch, s), 0,
                                          cfg.num_text_tokens),
        "text_tokens_lens": jnp.full((accum, batch), s, jnp.int32),
        "audio_features": jax.random.randint(
            rng, (accum, batch, t, cfg.num_quantizers), 0,
            cfg.num_audio_tokens),
        "audio_features_lens": jnp.full((accum, batch), t, jnp.int32),
    }
    if prompt_len:
        batch_arrays["prompt_codes"] = jax.random.randint(
            rng, (accum, batch, prompt_len, cfg.num_quantizers), 0,
            cfg.num_audio_tokens)
    state = init_train_state(
        model, tx, rng, jax.tree.map(lambda v: v[0], batch_arrays),
        train_stage=train_stage,
    )
    step = make_train_step(
        model, tx, lambda st, e: eden_lr(0.05, st, e),
        train_stage=train_stage,
    )
    epoch = jnp.zeros((), jnp.int32)

    # rbg (hardware RNG) keys: threefry dropout-mask generation alone was
    # measured to double the step time (0.895 -> 0.579 s/step with rbg)
    mk_key = lambda i: jax.random.key(i, impl="rbg")

    # compile + warmup
    state, metrics = step(state, batch_arrays, mk_key(1), epoch)
    _ = float(metrics["loss"])

    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, batch_arrays, mk_key(2 + i), epoch)
    _ = float(metrics["loss"])  # sync
    dt = (time.perf_counter() - t0) / iters

    # analytic matmul+attention FLOPs of the decoder (fwd + ~2x bwd)
    total = train_step_flops(cfg, accum, batch, s, t, train_stage, p=prompt_len)
    mfu = total / dt / chip_peak_flops()

    frames = accum * batch * t
    stage_name = {0: "AR+NAR", 1: "AR", 2: "NAR"}[train_stage]
    return {
        "audio_frames_per_s": round(frames / dt, 1),
        "audio_s_per_s": round(frames / 75.0 / dt, 2),
        "step_time_s": round(dt, 4),
        "mfu": round(mfu, 4),
        # one scale for every row, fp32 recipes included: f32 dots run as
        # bf16 MXU passes at JAX's default precision (utils/flops.py note)
        "mfu_vs": "bf16-peak",
        "config": f"{stage_name} stage{train_stage} {dtype} accum{accum} "
                  f"B={batch} S={s} T={t}"
                  + (f" P={prompt_len}" if prompt_len else "")
                  + " ScaledAdam",
    }


def bench_train_nar(dtype="float32", **kw):
    """BASELINE config 4: NAR stage 2, prefix-mode-4 prompted features,
    max-duration-40 batch (4 utts x ~10 s), 3 s prompts, fp32 per the
    reference recipe (ref README.md:106-112)."""
    return bench_train(batch=4, train_stage=2, prompt_len=225, dtype=dtype,
                       **kw)


def main():
    # Headline: W8A8 int8 serving (the measured round-3 winner: 183.5 vs
    # 174.0 audio-s/s bf16 — int8 weights halve the decode weight stream and
    # the NAR Dense matmuls run on the MXU's int8 path; greedy/numeric parity
    # in tests/test_quantize.py).  bf16 reported alongside.
    value = bench_generate(quant="w8a8")
    # e2e headline = the SERVING DEFAULT (bf16 codec decode, serve.py):
    # 3.2x the fp32 decode and much more run-stable (the fp32 decode
    # measured 552-1340 audio-s/s across runs on this chip, swinging the
    # e2e composite 117-162; perf_notes).  The fp32-codec row stays as the
    # waveform-parity reference.
    value_e2e = bench_end_to_end(quant="w8a8", codec_dtype="bfloat16")
    value_e2e_cf32 = bench_end_to_end(quant="w8a8")
    value_bf16 = bench_generate()
    # realistic-traffic serving rate (VERDICT r4 #3): mixed per-request
    # stops ~ U[150, 512] modeling EOS (the gen_mix distribution), same
    # serving config as the headline — tracked in the JSON so regressions
    # on the realistic path are visible to the driver, not just the
    # idealized full-length number
    value_mix = bench_generate(quant="w8a8", realistic_mix=True)
    train = bench_train()
    train_nar = bench_train_nar()
    # recipe decision (round 4, `nar_dtype_parity` overfit overlay): bf16
    # NAR trains with a comparable loss trajectory; fp32 stays the benched
    # recipe-parity default (ref README.md:106-112 prescribes fp32), bf16 is
    # the recommended TPU recipe at ~17% less step time
    train_nar_bf16 = bench_train_nar(dtype="bfloat16")
    print(json.dumps({
        "metric": "audio_seconds_per_s_per_chip",
        "value": round(value, 3),
        "unit": "s/s/chip",
        "vs_baseline": round(value / 50.0, 3),
        "quant": "w8a8",
        # the north-star WAV-OUT rate: generation + EnCodec decode (bf16,
        # the serving default) + host int16 wav fetch, one chip doing
        # everything (vs_baseline's >= 50 north star reads "producing
        # mel-allclose waveforms" — this is that number; `value` is
        # token-generation only; end_to_end_codec_f32 is the parity-dtype
        # codec row)
        "end_to_end": round(value_e2e, 3),
        "end_to_end_vs_baseline": round(value_e2e / 50.0, 3),
        "end_to_end_codec_f32": round(value_e2e_cf32, 3),
        "value_bf16": round(value_bf16, 3),
        # realistic mixed-length traffic (stops ~ U[150,512], w8a8, B=256);
        # audio-s/s of USEFUL tokens — below `value` because the batch is
        # gated by its longest sequence (docs/perf_notes.md gen_mix)
        "gen_mix": round(value_mix, 3),
        "train": train,
        "train_nar": train_nar,
        "train_nar_bf16": train_nar_bf16,
    }))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "main"
    if mode == "sweep":
        for a in ("xla", "flash"):
            for k in ("model", "int8"):
                bench_generate(attn_impl=a, kv=k, label=f"attn={a} kv={k}")
    elif mode == "phase":
        # decomposition at the documented B=128 point (perf_notes.md), plus
        # the flagship B=256 row
        bench_generate(batch=128, nq=1, label="AR-only (B=128, Q=1)")
        bench_generate(batch=128, nq=8, label="full (B=128, Q=8)")
        bench_generate(batch=256, nq=8, label="flagship (B=256, Q=8)")
    elif mode == "e2e":
        # wav-out end-to-end: serial vs pipelined fetch, w8a8 vs bf16
        bench_end_to_end(quant="w8a8", pipelined=False,
                         label="e2e w8a8 serial-fetch")
        bench_end_to_end(quant="w8a8", label="e2e w8a8 pipelined")
        bench_end_to_end(label="e2e bf16 pipelined")
    elif mode == "qsweep":
        # int8-weight serving modes vs the bf16 baseline
        for qm in ("none", "w8", "w8a8"):
            bench_generate(quant=qm, label=f"quant={qm} (B=256)")
    elif mode == "train":
        print(json.dumps(bench_train()))
    elif mode == "ragged_ab":
        # ragged decode kernel A/B at the headline serving config: on
        # fixed-512 traffic (pure overhead check — no length spread to
        # exploit) and the gen_mix distribution (the intended win: finished
        # slots read nothing until the batch drains)
        bench_generate(quant="w8a8", label="dense  fixed-512")
        bench_generate(quant="w8a8", ragged=True, label="ragged fixed-512")
        bench_generate(quant="w8a8", realistic_mix=True,
                       label="dense  gen_mix")
        bench_generate(quant="w8a8", realistic_mix=True, ragged=True,
                       label="ragged gen_mix")
    elif mode == "gen_mix":
        # Realistic-length traffic. Rows:
        #   1. worst-case fixed-512 (the headline lower bound)
        #   2. mixed lengths in ONE batch — the AR while_loop early-exits,
        #      but the batch is gated by its longest sequence and the NAR
        #      region stays the static max_new — measured: no win
        #   3. the same requests split into 4 sorted batches of 64 — early
        #      exit per bucket, but B=64 loses batch amortization —
        #      measured: a clear LOSS
        #   4. short requests (150-256) served by a dedicated max_new=256
        #      program at full batch — per-bucket COMPILED programs shrink
        #      the AR chunks AND the NAR region: the real serving lever
        from valle_tpu import macros

        bench_generate(label="worst-case fixed-512")
        bench_generate(realistic_mix=True, label="mixed 150-512, one batch")

        lens = np.sort(np.random.RandomState(0).randint(150, 513, 256))
        run64 = _build_generate(batch=64)
        buckets = [jnp.asarray(lens[i * 64:(i + 1) * 64], jnp.int32)
                   for i in range(4)]
        _ = np.asarray(run64(jax.random.PRNGKey(1), buckets[0])["codes"])
        t0 = time.perf_counter()
        total = 0
        for bi, sl in enumerate(buckets):
            out = run64(jax.random.PRNGKey(2 + bi), sl)
            total += int(np.asarray(out["lengths"]).sum())
        dt = time.perf_counter() - t0
        print(f"mixed 150-512, 4 sorted buckets of 64: {dt:.3f}s  "
              f"{total / macros.AUDIO_FRAME_RATE / dt:.1f} audio-s/s",
              file=sys.stderr, flush=True)

        run256 = _build_generate(batch=256, max_new=256)
        stops = jnp.asarray(
            np.random.RandomState(0).randint(150, 257, 256), jnp.int32
        )
        _ = np.asarray(run256(jax.random.PRNGKey(1), stops)["codes"])
        t0 = time.perf_counter()
        total = 0
        for i in range(3):
            out = run256(jax.random.PRNGKey(2 + i), stops)
            total += int(np.asarray(out["lengths"]).sum())
        dt = (time.perf_counter() - t0)
        print(f"short bucket 150-256, max_new=256 program, B=256: "
              f"{dt / 3:.3f}s/iter  "
              f"{total / macros.AUDIO_FRAME_RATE / dt:.1f} audio-s/s",
              file=sys.stderr, flush=True)
    elif mode == "nar_phase":
        # Attribute one NAR refinement pass at flagship generation shapes
        # (B=256, s=64, p=225, gen=512): full pass vs stack-only vs the
        # embed/positional and predict/argmax ends.  All probe outputs are
        # scalar-reduced; inputs precomputed outside the timed region.
        from valle_tpu.models import ModelConfig, VALLE
        from valle_tpu.ops import masks as mask_ops

        cfg = ModelConfig(dtype="bfloat16", attn_impl="xla")
        model = VALLE(cfg)
        b, s, p, t = 256, 64, 225, 512
        nd = cfg.nar_decoder_dim
        rng = jax.random.PRNGKey(0)
        x = jax.random.randint(rng, (b, s), 0, cfg.num_text_tokens)
        y = jax.random.randint(rng, (b, 64, cfg.num_quantizers), 0,
                               cfg.num_audio_tokens)
        variables = jax.jit(lambda k: model.init(
            {"params": k, "stage": k}, x, jnp.full((b,), s, jnp.int32), y,
            jnp.full((b,), 64, jnp.int32), train_stage=0, deterministic=True,
            nar_stage=jnp.asarray(2)))(rng)
        tokens = jax.random.randint(rng, (b, p + t), 0, cfg.num_audio_tokens)
        positions = jnp.broadcast_to(jnp.arange(p + t)[None], (b, p + t))
        bias = mask_ops.mask_to_bias(
            jnp.zeros((b, 1, 1, s + p + t), bool), jnp.float32)
        gen_start = s + p

        # NOTE probe pitfall (perf_notes): big arrays must be jit ARGUMENTS,
        # never closure constants — constants serialize into the program and
        # ship through the axon tunnel on every compile.
        x_emb = jax.jit(lambda v, xx: model.apply(
            v, xx, method="nar_text_encode"))(variables, x)
        y_emb = jax.jit(lambda v, tt: model.apply(
            v, tt, method="nar_embed0"))(variables, tokens)
        xy = jax.jit(lambda v, xe, ye: jnp.concatenate(
            [xe, model.apply(
                v, method=lambda m: m._nar_audio_pos(
                    ye, True, positions=positions))], axis=1)
        )(variables, x_emb, y_emb)
        stage_emb = jax.jit(lambda v: model.apply(
            v, method=lambda m: m.nar_stage_embeddings[0][None]))(variables)
        dec_dummy = jax.random.normal(rng, (b, t, nd), jnp.bfloat16)

        probes = {
            "full pass": (
                lambda v, ye, xe, dd: model.apply(
                    v, 0, ye, positions, xe, bias, gen_start,
                    method="nar_forward_stage").sum(),
                (variables, y_emb, x_emb, dec_dummy)),
            "stack only": (
                lambda v, xyv, se, dd: model.apply(
                    v, method=lambda m: m.nar_decoder(
                        xyv, stage_emb=se, attn_bias=bias,
                        deterministic=True)[0].astype(jnp.float32).sum()),
                (variables, xy, stage_emb, dec_dummy)),
            "embed+pos": (
                lambda v, ye, xe, dd: model.apply(
                    v, method=lambda m: m._nar_audio_pos(
                        ye, True, positions=positions
                    ).astype(jnp.float32).sum()),
                (variables, y_emb, x_emb, dec_dummy)),
            "predict+argmax": (
                lambda v, ye, xe, dd: model.apply(
                    v, method=lambda m: jnp.argmax(
                        jnp.einsum("btd,dv->btv", dd,
                                   m._nar_predict_weights()[0].astype(
                                       dd.dtype)), axis=-1).sum()),
                (variables, y_emb, x_emb, dec_dummy)),
        }
        for name, (fn, fargs) in probes.items():
            jf = jax.jit(fn)
            _ = float(jf(*fargs))
            t0 = time.perf_counter()
            for _ in range(3):
                _ = float(jf(*fargs))
            dt = (time.perf_counter() - t0) / 3
            print(f"nar {name}: {dt * 1000:.1f} ms", file=sys.stderr,
                  flush=True)
    elif mode == "fused_fwd_probe":
        # Forward-only custom fused kernel vs XLA einsum+softmax at NAR
        # generation shapes (key-padding-only mask).  24 chained layers,
        # carry-dependent, scalar output, arrays as arguments.
        from valle_tpu.ops.fused_attention import fused_prefix_attention

        b, t, h, dh = 256, 800, 16, 64
        rng = jax.random.PRNGKey(0)
        q0 = jax.random.normal(rng, (b, t, h, dh), jnp.bfloat16)
        kv_bias = jnp.zeros((b, t), jnp.float32)  # all-valid key rows

        def xla_layer(x, _):
            scale = 1.0 / np.sqrt(dh)
            logits = jnp.einsum("bqhd,bkhd->bhqk", x * scale, x)
            p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            return jnp.einsum("bhqk,bkhd->bqhd", p.astype(x.dtype), x), None

        def fused_layer(x, _):
            return fused_prefix_attention(x, x, x, kv_bias, prefix_s=None), None

        for name, layer in (("xla", xla_layer), ("fused", fused_layer)):
            fn = jax.jit(lambda x, f=layer: jnp.sum(
                jax.lax.scan(f, x, None, length=24)[0].astype(jnp.float32)))
            _ = float(fn(q0))
            t0 = time.perf_counter()
            for _ in range(3):
                _ = float(fn(q0))
            dt = (time.perf_counter() - t0) / 3
            print(f"nar-attn fwd {name}: {dt * 1000 / 24:.2f} ms/layer",
                  file=sys.stderr, flush=True)
    elif mode == "attn_int8_probe":
        # Can int8 QK^T / PV halve the NAR refinement attention (the
        # measured 19.75 ms/layer einsum+f32-softmax, docs/perf_notes.md)?
        # 24 chained layers, carry-dependent, scalar output (probe rules).
        b, t, h, dh = 256, 800, 16, 64
        rng = jax.random.PRNGKey(0)
        q0 = jax.random.normal(rng, (b, t, h, dh), jnp.bfloat16)

        def bf16_layer(x, _):
            scale = 1.0 / np.sqrt(dh)
            logits = jnp.einsum("bqhd,bkhd->bhqk", x * scale, x)
            p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            return jnp.einsum(
                "bhqk,bkhd->bqhd", p.astype(x.dtype), x
            ), None

        def int8_layer(x, _):
            from valle_tpu.nn.attention import quantize_kv

            x8, xs = quantize_kv(x)  # (b,t,h) scales
            l32 = jax.lax.dot_general(
                jnp.swapaxes(x8, 1, 2), jnp.swapaxes(x8, 1, 2),
                (((3,), (3,)), ((0, 1), (0, 1))),
                preferred_element_type=jnp.int32,
            )  # (b,h,q,k)
            sT = jnp.swapaxes(xs, 1, 2)  # (b,h,t)
            logits = (l32.astype(jnp.float32)
                      * (sT[:, :, :, None] * sT[:, :, None, :])
                      / np.sqrt(dh))
            p = jax.nn.softmax(logits, axis=-1)
            pmax = jnp.max(p, axis=-1, keepdims=True)
            ps = jnp.maximum(pmax, 1e-8) / 127.0
            p8 = jnp.round(p / ps).astype(jnp.int8)
            o32 = jax.lax.dot_general(
                p8, jnp.swapaxes(x8, 1, 2),
                (((3,), (2,)), ((0, 1), (0, 1))),
                preferred_element_type=jnp.int32,
            )  # (b,h,q,d)
            o = (o32.astype(jnp.float32) * ps
                 * sT[:, :, :, None]).astype(x.dtype)
            return jnp.swapaxes(o, 1, 2), None

        for name, layer in (("bf16", bf16_layer), ("int8", int8_layer)):
            fn = jax.jit(lambda x, f=layer: jnp.sum(
                jax.lax.scan(f, x, None, length=24)[0].astype(jnp.float32)))
            _ = float(fn(q0))
            t0 = time.perf_counter()
            for _ in range(3):
                _ = float(fn(q0))
            dt = (time.perf_counter() - t0) / 3
            print(f"nar-attn {name}: {dt * 1000 / 24:.2f} ms/layer",
                  file=sys.stderr, flush=True)
    elif mode == "tokenize":
        for b in (8, 16, 32, 64):
            bench_tokenize(batch=b, label="tokenize")
        for b in (16, 32):
            bench_tokenize(batch=b, decode=True, label="decode")
    elif mode == "decode_phase":
        # Decompose EnCodec decode (the wav-out serving post-process): full
        # codes->wav, RVQ-only, conv-stack-only (LSTM stubbed), LSTM-only at
        # the bottleneck shape, for several unroll factors.  All probe
        # outputs scalar-reduced, arrays passed as jit arguments.
        import torch
        from transformers import EncodecConfig as HFConfig, EncodecModel

        from valle_tpu.codec import encodec_model as em
        from valle_tpu.codec.convert import convert_encodec_state_dict

        torch.manual_seed(0)
        hf = EncodecModel(HFConfig())
        sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
        params = convert_encodec_state_dict(sd)
        cfg = em.EncodecConfig()
        b, secs = 64, 10.0
        t = int(secs * 75)
        codes = jnp.asarray(np.random.RandomState(0).randint(
            0, 1024, (b, t, 8)).astype(np.int32))

        def timeit(name, fn, *args, iters=5):
            # dispatch all iters, sync ONCE: a per-iter float() sync pays the
            # axon tunnel round trip every iteration, which dominates
            # sub-second probes and made round-4 run-to-run numbers noisy
            _ = float(fn(*args))
            t0 = time.perf_counter()
            outs = [fn(*args) for _ in range(iters)]
            _ = float(outs[-1])
            dt = (time.perf_counter() - t0) / iters
            print(f"decode {name}: {dt * 1000:.1f} ms  "
                  f"({b * secs / dt:.1f} audio-s/s)", file=sys.stderr,
                  flush=True)
            return dt

        # tunnel round-trip floor: a scalar add, synced
        tiny = jax.jit(lambda a: a + 1.0)
        _ = float(tiny(jnp.float32(0)))
        t0 = time.perf_counter()
        for _ in range(5):
            _ = float(tiny(jnp.float32(0)))
        print(f"tunnel round trip: {(time.perf_counter() - t0) / 5 * 1000:.1f}"
              " ms", file=sys.stderr, flush=True)

        full = jax.jit(lambda p, c: jnp.sum(em.decode_latents(
            p, em.rvq_decode(p["quantizer"], c), cfg)))
        rvq = jax.jit(lambda p, c: jnp.sum(em.rvq_decode(p["quantizer"], c)))
        timeit("full", full, params, codes)
        timeit("rvq only", rvq, params, codes)

        real_lstm = em.lstm_stack
        try:
            em.lstm_stack = lambda p, x, **kw: x  # stub out the recurrence
            convs = jax.jit(lambda p, c: jnp.sum(em.decode_latents(
                p, em.rvq_decode(p["quantizer"], c), cfg)))
            timeit("convs only (no LSTM)", convs, params, codes)
        finally:
            em.lstm_stack = real_lstm

        lat = jax.random.normal(jax.random.PRNGKey(0), (b, t, 512),
                                jnp.float32)
        for unroll in (1, 4, 8, 16, 32):
            f = jax.jit(functools_partial_lstm(em, unroll))
            timeit(f"lstm-only unroll={unroll}", f,
                   params["decoder"]["layers_1"], lat)
        # batch sweep of the full decode at the current defaults
        for bb in (32, 64, 128, 256):
            try:
                cb = jnp.asarray(np.random.RandomState(0).randint(
                    0, 1024, (bb, t, 8)).astype(np.int32))
                _ = float(full(params, cb))
                t0 = time.perf_counter()
                outs = [full(params, cb) for _ in range(3)]
                _ = float(outs[-1])
                dt = (time.perf_counter() - t0) / 3
                print(f"decode full B={bb}: {dt:.3f} s ({bb * secs / dt:.1f} "
                      f"audio-s/s)", file=sys.stderr, flush=True)
            except Exception as e:
                print(f"decode full B={bb}: {str(e)[:120]}", file=sys.stderr,
                      flush=True)
    elif mode == "train_phase":
        # Attribute the 0.425 s AR train step: forward loss only, forward +
        # backward (grads, accum scan), and the ScaledAdam update alone.
        from valle_tpu.models import ModelConfig, VALLE
        from valle_tpu.optim import eden_lr, scaled_adam, valle_batched_axis
        from valle_tpu.train.state import partition_params
        from valle_tpu.train.step import init_train_state, make_train_step

        accum, b, s, t = 4, 8, 128, 752
        cfg = ModelConfig(dtype="bfloat16", attn_impl="fused", remat="none")
        model = VALLE(cfg)
        tx = scaled_adam(learning_rate=0.05, clipping_scale=2.0,
                     batched_axis_fn=valle_batched_axis)
        rng = jax.random.PRNGKey(0)
        batch = {
            "text_tokens": jax.random.randint(rng, (accum, b, s), 0,
                                              cfg.num_text_tokens),
            "text_tokens_lens": jnp.full((accum, b), s, jnp.int32),
            "audio_features": jax.random.randint(
                rng, (accum, b, t, cfg.num_quantizers), 0,
                cfg.num_audio_tokens),
            "audio_features_lens": jnp.full((accum, b), t, jnp.int32),
        }
        state = init_train_state(
            model, tx, rng, jax.tree.map(lambda v: v[0], batch),
            train_stage=1)
        train_p, frozen_p = partition_params(state.params, 1)
        mk_key = lambda i: jax.random.key(i, impl="rbg")

        def loss_fn(tp, micro, key):
            from valle_tpu.train.state import merge_params

            out = model.apply(
                {"params": merge_params(tp, frozen_p)},
                micro["text_tokens"], micro["text_tokens_lens"],
                micro["audio_features"], micro["audio_features_lens"],
                train_stage=1, deterministic=False,
                rngs={"dropout": key, "stage": key},
            )
            return out["loss"]

        def fwd_all(tp, bb, key):
            keys = jax.random.split(key, accum)
            return jax.lax.scan(
                lambda c, inp: (c + loss_fn(tp, inp[0], inp[1]), None),
                jnp.zeros(()), (bb, keys))[0]

        def grads_all(tp, bb, key):
            keys = jax.random.split(key, accum)

            def mic(c, inp):
                l, g = jax.value_and_grad(loss_fn)(tp, inp[0], inp[1])
                return jax.tree.map(jnp.add, c, g), l

            zeros = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32),
                                 tp)
            g, _ = jax.lax.scan(mic, zeros, (bb, keys))
            return jax.tree.map(lambda x: jnp.sum(jnp.abs(x)), g)

        grads_fixed = jax.jit(lambda tp, bb, key: jax.lax.scan(
            lambda c, inp: (jax.tree.map(
                jnp.add, c, jax.grad(loss_fn)(tp, inp[0], inp[1])), None),
            jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), tp),
            (bb, jax.random.split(key, accum)))[0]
        )(train_p, batch, mk_key(0))

        def opt_only(tp, g, st):
            upd, new_st = tx.update(g, st, tp, lr=0.05)
            return jnp.sum(jnp.abs(upd["ar_predict_layer"]["kernel"])), new_st

        step = make_train_step(model, tx,
                               lambda st, e: eden_lr(0.05, st, e),
                               train_stage=1)
        epoch = jnp.zeros((), jnp.int32)
        # sync via float() host transfers — block_until_ready returns early
        # through the axon tunnel (see probe gotchas above)
        cases = {
            "fwd only": (jax.jit(fwd_all),
                         lambda i: (train_p, batch, mk_key(i)),
                         lambda o: float(o)),
            "fwd+bwd": (jax.jit(
                lambda tp, bb, key: jax.tree_util.tree_reduce(
                    jnp.add, grads_all(tp, bb, key))),
                        lambda i: (train_p, batch, mk_key(i)),
                        lambda o: float(o)),
            "optimizer only": (jax.jit(opt_only),
                               lambda i: (train_p, grads_fixed,
                                          state.opt_state),
                               lambda o: float(o[0])),
        }
        for name, (fn, argf, sync) in cases.items():
            _ = sync(fn(*argf(1)))
            t0 = time.perf_counter()
            for i in range(5):
                out = fn(*argf(2 + i))
            _ = sync(out)
            dt = (time.perf_counter() - t0) / 5
            print(f"train {name}: {dt * 1000:.1f} ms", file=sys.stderr,
                  flush=True)
        st = state
        st, m = step(st, batch, mk_key(1), epoch)  # warmup (donates input)
        _ = float(m["loss"])
        t0 = time.perf_counter()
        for i in range(5):
            st, m = step(st, batch, mk_key(2 + i), epoch)
        _ = float(m["loss"])
        print(f"train full step: {(time.perf_counter() - t0) / 5 * 1000:.1f}"
              " ms", file=sys.stderr, flush=True)
    elif mode == "fwd_attrib":
        # Attribute the AR forward (round-3: 133 ms, ~42% analytic MFU, gap
        # "spread"): full loss vs no-CE vs no-dropout vs XLA attention, plus
        # the isolated attention fwd at train shapes.  One sync per case.
        from valle_tpu.models import ModelConfig, VALLE

        accum, b, s, t = 4, 8, 128, 752
        rng = jax.random.PRNGKey(0)
        batch = {
            "text_tokens": jax.random.randint(rng, (accum, b, s), 0, 512),
            "text_tokens_lens": jnp.full((accum, b), s, jnp.int32),
            "audio_features": jax.random.randint(rng, (accum, b, t, 8), 0,
                                                 1024),
            "audio_features_lens": jnp.full((accum, b), t, jnp.int32),
        }
        mk_key = lambda i: jax.random.key(i, impl="rbg")

        def build(attn, dropout=0.1):
            cfg = ModelConfig(dtype="bfloat16", attn_impl=attn, remat="none",
                              dropout=dropout)
            model = VALLE(cfg)
            variables = jax.jit(lambda k: model.init(
                {"params": k, "stage": k},
                batch["text_tokens"][0], batch["text_tokens_lens"][0],
                batch["audio_features"][0], batch["audio_features_lens"][0],
                train_stage=1, deterministic=True))(rng)
            return model, variables

        def fwd_all(model, variables, det):
            def f(v, bb, key):
                keys = jax.random.split(key, accum)

                def mic(c, inp):
                    out = model.apply(
                        {"params": v["params"]},
                        inp[0]["text_tokens"], inp[0]["text_tokens_lens"],
                        inp[0]["audio_features"],
                        inp[0]["audio_features_lens"],
                        train_stage=1, deterministic=det,
                        rngs=(None if det
                              else {"dropout": inp[1], "stage": inp[1]}),
                    )
                    return c + out["loss"], None

                return jax.lax.scan(mic, jnp.zeros(()), (bb, keys))[0]

            return jax.jit(f)

        def run_case(name, fn, *args, iters=5):
            _ = float(fn(*args))
            t0 = time.perf_counter()
            outs = [fn(*args) for _ in range(iters)]
            _ = float(outs[-1])
            dt = (time.perf_counter() - t0) / iters
            print(f"fwd {name}: {dt * 1000:.1f} ms", file=sys.stderr,
                  flush=True)

        model_f, var_f = build("fused")
        run_case("fused full loss", fwd_all(model_f, var_f, False),
                 var_f, batch, mk_key(1))
        run_case("fused no-dropout", fwd_all(model_f, var_f, True),
                 var_f, batch, mk_key(1))
        model_x, var_x = build("xla")
        run_case("xla full loss", fwd_all(model_x, var_x, False),
                 var_x, batch, mk_key(1))
        run_case("xla no-dropout", fwd_all(model_x, var_x, True),
                 var_x, batch, mk_key(1))

        # no-CE variant: visualize_forward runs embeddings + full AR stack
        # (deterministic, no predict head / loss)
        stack_fn = jax.jit(lambda v, bb: jax.lax.scan(
            lambda c, inp: (c + model_f.apply(
                {"params": v["params"]}, inp["text_tokens"],
                inp["text_tokens_lens"], inp["audio_features"],
                inp["audio_features_lens"],
                method="visualize_forward")[1].astype(jnp.float32).sum(),
                None),
            jnp.zeros(()), bb)[0])
        run_case("fused stack-only (no CE head)", stack_fn, var_f, batch)

        # isolated attention fwd at train shapes, 12 chained layers
        from valle_tpu.ops.fused_attention import fused_prefix_attention

        tt = s + t + 1
        q0 = jax.random.normal(rng, (b, tt, 16, 64), jnp.bfloat16)
        kv_bias = jnp.zeros((b, tt), jnp.float32)

        def fused_layer(x, _):
            return fused_prefix_attention(x, x, x, kv_bias, prefix_s=s), None

        def xla_layer(x, _):
            scale = 1.0 / np.sqrt(64)
            logits = jnp.einsum("bqhd,bkhd->bhqk", x * scale, x)
            qpos = jnp.arange(tt)[:, None]
            kpos = jnp.arange(tt)[None, :]
            m = (kpos < s) | (kpos <= qpos)
            logits = jnp.where(m[None, None], logits.astype(jnp.float32),
                               -1e9)
            p = jax.nn.softmax(logits, axis=-1)
            return jnp.einsum("bhqk,bkhd->bqhd", p.astype(x.dtype), x), None

        for name, layer in (("fused", fused_layer), ("xla", xla_layer)):
            fn = jax.jit(lambda x, f=layer: jnp.sum(
                jax.lax.scan(f, x, None, length=12)[0].astype(jnp.float32)))
            run_case(f"attn-only {name} (12 layers, 4x dispatch)",
                     lambda x, f=fn: f(x) + f(x) + f(x) + f(x), q0)
    elif mode == "kernel_block_sweep":
        # q-block-size sweep of the fused kernel at AR train shapes
        # (B=8, T=881->896, H=16, Dh=64, prefix_s=128, dropout 0.1).
        # 896 grid cells at bq=128 cost ~9 us each while per-cell compute is
        # ~0.15 us at peak — per-cell overhead dominates; bigger blocks
        # amortize it.
        from valle_tpu.ops.fused_attention import fused_prefix_attention

        b, s, t, h, dh = 8, 128, 753, 16, 64
        tq = s + t  # 881
        rng = jax.random.PRNGKey(0)
        x0 = jax.random.normal(rng, (b, tq, h, dh), jnp.bfloat16)
        kv_bias = jnp.zeros((b, tq), jnp.float32)
        key = jax.random.key(7, impl="rbg")

        def run_case(name, fn, *args, iters=5):
            try:
                _ = float(fn(*args))
                t0 = time.perf_counter()
                outs = [fn(*args) for _ in range(iters)]
                _ = float(outs[-1])
                dt = (time.perf_counter() - t0) / iters
                print(f"{name}: {dt * 1000:.2f} ms", file=sys.stderr,
                      flush=True)
            except Exception as e:
                print(f"{name}: {str(e)[:140]}", file=sys.stderr, flush=True)

        def make_fwd(bq, dropout):
            def layer(x, _):
                return fused_prefix_attention(
                    x, x, x, kv_bias, prefix_s=s,
                    dropout_rate=dropout, dropout_rng=key,
                    block_q_fwd=bq, block_q_bwd=bq), None

            return jax.jit(lambda x: jnp.sum(jax.lax.scan(
                layer, x, None, length=12)[0].astype(jnp.float32)))

        def make_grad(bqf, bqb, dropout):
            def layer(x, _):
                return fused_prefix_attention(
                    x, x, x, kv_bias, prefix_s=s,
                    dropout_rate=dropout, dropout_rng=key,
                    block_q_fwd=bqf, block_q_bwd=bqb), None

            def loss(x):
                return jnp.sum(jax.lax.scan(
                    layer, x, None, length=12)[0].astype(jnp.float32))

            return jax.jit(lambda x: jnp.sum(jnp.abs(jax.grad(loss)(x))
                                             .astype(jnp.float32)))

        for dropout in (0.0, 0.1):
            for bq in (128, 448, 896):
                run_case(f"fwd bq={bq} drop={dropout}",
                         make_fwd(bq, dropout), x0)
        for dropout in (0.0, 0.1):
            for bqf in (128, 448, 896):
                for bqb in (128, 448):
                    run_case(f"grad bqf={bqf} bqb={bqb} drop={dropout}",
                             make_grad(bqf, bqb, dropout), x0)
    elif mode == "train_nar":
        # recipe-parity fp32 row + the TPU-native bf16 recommendation
        for dt in ("float32", "bfloat16"):
            for attn in ("xla", "fused"):
                try:
                    r = bench_train_nar(dtype=dt, attn_impl=attn)
                except Exception as e:
                    r = {"error": str(e)[:200]}
                print(json.dumps({"dtype": dt, "attn": attn, **r}))
    elif mode == "continuous":
        # Continuous batching vs the bucket scheduler on mixed-length
        # traffic (the gen_mix distribution: stops uniform 150-512), 512
        # requests at B=128 slots.  Both schemes do identical NAR work at
        # the 512 bucket; the A/B is AR slot occupancy.
        from valle_tpu import macros
        from valle_tpu.models import ModelConfig, VALLE
        from valle_tpu.sample import generate
        from valle_tpu.sample.continuous import serve_continuous

        cfg = ModelConfig(dtype="bfloat16", attn_impl="xla",
                          kv_cache_dtype="int8")
        model = VALLE(cfg)
        rng = jax.random.PRNGKey(0)
        R, B, s, p, max_new = 512, 128, 64, 225, 512
        x = jax.random.randint(rng, (R, s), 0, cfg.num_text_tokens)
        x_lens = np.full((R,), s, np.int32)
        prompts = jax.random.randint(rng, (R, p, cfg.num_quantizers), 0,
                                     cfg.num_audio_tokens)
        plens = np.full((R,), p, np.int32)
        stops = np.random.RandomState(0).randint(150, max_new + 1, R)
        dummy_y = jax.random.randint(rng, (B, 64, cfg.num_quantizers), 0,
                                     cfg.num_audio_tokens)
        variables = jax.jit(lambda k: model.init(
            {"params": k, "stage": k},
            x[:B], jnp.asarray(x_lens[:B]), dummy_y,
            jnp.full((B,), 64, jnp.int32),
            train_stage=0, deterministic=True, nar_stage=jnp.asarray(2),
        ))(rng)

        # ---- baseline: bucket scheme, 4 sequential full batches ----------
        def run_bucket(key, ragged=False):
            total = 0
            for i in range(R // B):
                sl = jnp.asarray(stops[i * B : (i + 1) * B], jnp.int32)
                out = generate(
                    model, variables, jax.random.fold_in(key, i),
                    x[i * B : (i + 1) * B], jnp.asarray(x_lens[:B]),
                    prompts[i * B : (i + 1) * B], jnp.asarray(plens[:B]),
                    top_k=10, max_new_tokens=max_new, forbid_eos=True,
                    stop_lens=sl, ragged_decode=ragged,
                )
                total += int(np.asarray(out["lengths"]).sum())
            return total

        reqs = {"x": np.asarray(x), "x_lens": x_lens,
                "prompts": np.asarray(prompts), "prompt_lens": plens,
                "stop_lens": stops.astype(np.int32)}

        def run_cont(key, ragged=False):
            out = serve_continuous(
                model, variables, key, reqs, batch_size=B,
                cap_steps=2048, chunk=128, admit_width=32, top_k=10,
                forbid_eos=True, nar_bucket=max_new, ragged_decode=ragged,
            )
            return sum(o["length"] for o in out)

        thr_b = None
        for label, fn, ragged in (
            ("bucket scheme (4 x B=128), dense", run_bucket, False),
            ("bucket scheme (4 x B=128), RAGGED", run_bucket, True),
            ("continuous (B=128 slots, refill), dense", run_cont, False),
            ("continuous (B=128 slots, refill), RAGGED", run_cont, True),
        ):
            _ = fn(jax.random.PRNGKey(1), ragged)  # compile + warmup
            t0 = time.perf_counter()
            total = fn(jax.random.PRNGKey(2), ragged)
            dt = time.perf_counter() - t0
            thr = total / macros.AUDIO_FRAME_RATE / dt
            vs = "" if thr_b is None else (
                f"  ({100 * (thr / thr_b - 1):+.1f}% vs dense bucket)")
            if thr_b is None:
                thr_b = thr
            print(f"{label}: {dt:.2f}s  {thr:.1f} audio-s/s{vs}",
                  file=sys.stderr, flush=True)
    elif mode == "nar_dtype_parity":
        # Recipe decision evidence (VERDICT r3 #4): overfit a fixed tiny
        # corpus with the stage-2 NAR recipe in fp32 vs bf16 (params stay
        # f32; dtype is the compute/activation precision) and overlay the
        # loss curves.  Flagship dims, 2 fixed batches alternated, 120 steps.
        from valle_tpu.models import ModelConfig, VALLE
        from valle_tpu.optim import eden_lr, scaled_adam, valle_batched_axis
        from valle_tpu.train.step import init_train_state, make_train_step

        accum, b, s, t, p = 4, 4, 128, 752, 225
        rng = jax.random.PRNGKey(0)
        batches = []
        for i in range(2):
            r = jax.random.PRNGKey(100 + i)
            batches.append({
                "text_tokens": jax.random.randint(r, (accum, b, s), 0, 512),
                "text_tokens_lens": jnp.full((accum, b), s, jnp.int32),
                "audio_features": jax.random.randint(
                    r, (accum, b, t, 8), 0, 1024),
                "audio_features_lens": jnp.full((accum, b), t, jnp.int32),
                "prompt_codes": jax.random.randint(
                    r, (accum, b, p, 8), 0, 1024),
            })
        curves = {}
        for dtype in ("float32", "bfloat16"):
            cfg = ModelConfig(dtype=dtype, attn_impl="fused", remat="none",
                              prefix_mode=4)
            model = VALLE(cfg)
            tx = scaled_adam(learning_rate=0.05, clipping_scale=2.0,
                     batched_axis_fn=valle_batched_axis)
            state = init_train_state(
                model, tx, rng,
                jax.tree.map(lambda v: v[0], batches[0]), train_stage=2)
            step = make_train_step(
                model, tx, lambda st, e: eden_lr(0.05, st, e), train_stage=2)
            epoch = jnp.zeros((), jnp.int32)
            losses = []
            for i in range(120):
                # fixed dropout/stage keys per step index: both dtypes see
                # the same randomness
                key = jax.random.key(1000 + i, impl="rbg")
                state, m = step(state, dict(batches[i % 2]), key, epoch)
                if i % 10 == 0 or i == 119:
                    losses.append((i, float(m["loss"])))
            curves[dtype] = losses
            print(f"nar overfit {dtype}: " + " ".join(
                f"{i}:{l:.4f}" for i, l in losses), file=sys.stderr,
                flush=True)
        f32 = dict(curves["float32"])
        bf16 = dict(curves["bfloat16"])
        rel = [abs(bf16[i] - f32[i]) / max(abs(f32[i]), 1e-9) for i in f32]
        print(f"nar dtype parity: max rel loss gap {max(rel):.4f}, "
              f"final f32 {curves['float32'][-1][1]:.4f} vs bf16 "
              f"{curves['bfloat16'][-1][1]:.4f}", file=sys.stderr, flush=True)
    elif mode == "gather_probe":
        # SURVEY §7.1 kernel (c): is a custom multi-codebook gather worth
        # it?  Formulations of _rest_gather at NAR train shapes
        # (B*accum=16, T=977, Q-1=7, nd=1024): current flat-take+einsum vs
        # take+weighted-sum vs one-hot matmul (MXU).  Scalar-reduced,
        # arrays as arguments, grads included (training is the target).
        b, t, qm1, v, nd = 16, 977, 7, 1024, 1024
        rng = jax.random.PRNGKey(0)
        table = jax.random.normal(rng, (qm1, v, nd), jnp.float32)
        codes = jax.random.randint(rng, (b, t, qm1), 0, v)
        w = (jnp.arange(qm1)[None, None, :] < 5).astype(jnp.float32)

        def flat_take(tbl, cds, ww):
            flat = tbl.reshape(qm1 * v, nd)
            idx = cds + (jnp.arange(qm1, dtype=cds.dtype) * v)[None, None, :]
            g = jnp.take(flat, idx, axis=0)
            return jnp.einsum("btqd,btq->btd", g,
                              jnp.broadcast_to(ww, g.shape[:-1]))

        def take_sum(tbl, cds, ww):
            g = jnp.take(tbl.reshape(qm1 * v, nd),
                         cds + (jnp.arange(qm1, dtype=cds.dtype) * v)[None,
                                                                      None, :],
                         axis=0)
            return jnp.sum(g * ww[..., None], axis=2)

        def onehot_mm(tbl, cds, ww):
            oh = jax.nn.one_hot(cds, v, dtype=jnp.bfloat16)  # (b,t,q,v)
            oh = oh * ww[..., None].astype(jnp.bfloat16)
            return jnp.einsum("btqv,qvd->btd", oh,
                              tbl.astype(jnp.bfloat16)).astype(jnp.float32)

        for name, fn in (("flat take+einsum (current)", flat_take),
                         ("take+sum", take_sum),
                         ("one-hot matmul", onehot_mm)):
            fwd = jax.jit(lambda tb, cd, ww, f=fn: jnp.sum(f(tb, cd, ww)))
            g = jax.jit(lambda tb, cd, ww, f=fn: jnp.sum(jnp.abs(
                jax.grad(lambda tt: jnp.sum(f(tt, cd, ww)))(tb))))
            for tag, jf in (("fwd", fwd), ("fwd+bwd", g)):
                _ = float(jf(table, codes, w))
                t0 = time.perf_counter()
                outs = [jf(table, codes, w) for _ in range(5)]
                _ = float(outs[-1])
                dt = (time.perf_counter() - t0) / 5
                print(f"gather {name} {tag}: {dt * 1000:.2f} ms",
                      file=sys.stderr, flush=True)
    elif mode == "loader":
        # Host loader throughput at flagship rate (no TPU needed): the
        # 0.386 s/step AR recipe consumes ~2.6 batches/s of
        # accum4 x (8, 752, 8) gathers + collation; prove the native C++
        # path AND the numpy fallback hold >= 2x that margin, and that the
        # Prefetcher hides assembly behind a simulated device step.
        import tempfile
        import types

        from valle_tpu import macros
        from valle_tpu.data import (
            CodeShardWriter, Manifest, SymbolTable, TextTokenizer,
            TtsDataLoader, get_text_token_collater,
        )
        from valle_tpu.data import native_loader as nl_mod
        from valle_tpu.data.dataset import Prefetcher

        rng = np.random.RandomState(0)
        tok = TextTokenizer(backend="chars")
        words = ["hello", "world", "speech", "codec", "neural", "audio"]
        root = tempfile.mkdtemp(prefix="loaderbench_")
        from pathlib import Path as _P

        root = _P(root)
        records, symbols = [], set()
        n_utts = 640
        with CodeShardWriter(root) as w:
            for k in range(n_utts):
                text = " ".join(rng.choice(words, 12))
                utt_id = f"0_{100}_{k:06d}_000000"
                dur = float(rng.uniform(9.9, 10.03))
                t = int(dur * macros.AUDIO_FRAME_RATE)
                codes = rng.randint(0, 1024, (t, 8))
                shard, key = w.write(utt_id, codes)
                tokens = tok([text])[0]
                symbols.update(tokens)
                records.append({"id": utt_id, "text": text, "tokens": tokens,
                                "duration": dur, "shard": shard, "key": key})
        Manifest.save(iter(records), root / "manifest_train.jsonl.gz")
        table = SymbolTable()
        for s_ in sorted(symbols):
            table.add(s_)
        table.to_file(root / "unique_text_tokens.k2symbols")
        collater = get_text_token_collater(
            str(root / "unique_text_tokens.k2symbols"))

        def build_loader():
            m = Manifest.load(root / "manifest_train.jsonl.gz")
            ld = TtsDataLoader(m, collater, max_duration=80.0,
                               accum_steps=4, num_buckets=2, shuffle=True)
            ld.set_epoch(0)
            return ld

        step_s = 0.386  # measured flagship AR step (round 4)
        for path in ("native", "numpy"):
            if path == "numpy":
                real_avail = nl_mod.available
                nl_mod.available = lambda: False
            try:
                ld = build_loader()
                using_native = ld.dataset._native is not None
                n, frames = 0, 0
                t0 = time.perf_counter()
                for batch in ld:
                    n += 1
                    frames += int(batch["audio_features_lens"].sum())
                dt = time.perf_counter() - t0
                print(f"loader {path} (native={using_native}): "
                      f"{n / dt:.1f} batches/s "
                      f"({n / dt / (1 / step_s):.1f}x the step rate), "
                      f"{frames / 75.0 / dt:.0f} audio-s/s", file=sys.stderr,
                      flush=True)
                # Prefetcher occupancy: consumer simulates the device step
                ld.set_epoch(1)
                t0 = time.perf_counter()
                n = 0
                for batch in Prefetcher(iter(ld)):
                    time.sleep(step_s)
                    n += 1
                wall = time.perf_counter() - t0
                ideal = n * step_s
                print(f"loader {path} + Prefetcher under {step_s:.3f}s "
                      f"steps: wall {wall:.2f}s vs device-bound {ideal:.2f}s "
                      f"(overhead {100 * (wall / ideal - 1):.1f}%)",
                      file=sys.stderr, flush=True)
            finally:
                if path == "numpy":
                    nl_mod.available = real_avail
        import shutil

        shutil.rmtree(root)
    elif mode == "train_geom":
        # Same optimizer step (sum of grads over 32 utts), different
        # micro-batch geometry: fused attention freed the remat memory, so
        # larger micro-batches may fit and utilize the MXU better.
        for accum, b in ((4, 8), (2, 16), (1, 32)):
            try:
                r = bench_train(accum=accum, batch=b)
            except Exception as e:
                r = {"error": str(e)[:200]}
            print(json.dumps({"accum": accum, "batch": b, **r}))
    elif mode == "train_sweep":
        # remat-policy x attn_impl decomposition of the training step
        for remat in ("full", "dots_nobatch", "none"):
            for attn in ("xla", "fused"):
                try:
                    r = bench_train(remat=remat, attn_impl=attn)
                except Exception as e:  # OOM etc. — record and continue
                    r = {"error": str(e)[:200]}
                print(json.dumps({"remat": remat, "attn": attn, **r}))
    else:
        main()
