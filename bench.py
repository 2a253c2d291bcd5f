"""Benchmark: batched zero-shot generation throughput on one chip.

Prints ONE JSON line:
  {"metric": "audio_seconds_per_s_per_chip", "value": N, "unit": "s/s/chip",
   "vs_baseline": N}

The north-star target is >= 50 generated audio-seconds per wall second per
chip (BASELINE.json); vs_baseline is value / 50.  The flagship config
(decoder-dim 1024, 16 heads, 12 AR + 12 NAR layers, 8 codebooks) runs the
full pipeline: AR KV-cache sampling loop + 7 NAR refinement passes.
EnCodec frame rate 75 Hz converts tokens to audio seconds.
"""

import json
import time

import jax
import jax.numpy as jnp


def main():
    from valle_tpu import macros
    from valle_tpu.models import ModelConfig, VALLE
    from valle_tpu.sample import generate

    cfg = ModelConfig(dtype="bfloat16")
    model = VALLE(cfg)
    rng = jax.random.PRNGKey(0)

    batch, s, p, max_new = 128, 64, 225, 512

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

    def run(key):
        return generate(
            model, variables, key, x, x_lens, prompt,
            top_k=10, temperature=1.0, max_new_tokens=max_new,
            forbid_eos=True,  # measure full-length decode (no lucky EOS)
        )

    import numpy as np

    # compile + warmup; NOTE: host transfer (np.asarray) is the sync point —
    # block_until_ready returns early through the axon tunnel.
    out = run(jax.random.PRNGKey(1))
    _ = np.asarray(out["codes"])

    t0 = time.perf_counter()
    iters = 3
    total_tokens = 0
    for i in range(iters):
        out = run(jax.random.PRNGKey(2 + i))
        total_tokens += int(np.asarray(out["lengths"]).sum())
    dt = time.perf_counter() - t0

    audio_seconds = total_tokens / macros.AUDIO_FRAME_RATE
    value = audio_seconds / dt
    print(json.dumps({
        "metric": "audio_seconds_per_s_per_chip",
        "value": round(value, 3),
        "unit": "s/s/chip",
        "vs_baseline": round(value / 50.0, 3),
    }))


if __name__ == "__main__":
    main()
