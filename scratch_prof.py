"""Scratch: decompose bench time into AR loop vs NAR passes; batch scaling."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from valle_tpu import macros
from valle_tpu.models import ModelConfig, VALLE
from valle_tpu.sample import generate


def run_case(batch, nq, attn_impl="xla", iters=2, max_new=512):
    cfg = ModelConfig(dtype="bfloat16", num_quantizers=nq, attn_impl=attn_impl)
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

    def run(key):
        return generate(model, variables, key, x, x_lens, prompt,
                        top_k=10, temperature=1.0, max_new_tokens=max_new,
                        forbid_eos=True)

    out = run(jax.random.PRNGKey(1))
    _ = np.asarray(out["codes"])
    t0 = time.perf_counter()
    tok = 0
    for i in range(iters):
        out = run(jax.random.PRNGKey(2 + i))
        tok += int(np.asarray(out["lengths"]).sum())
    dt = time.perf_counter() - t0
    thr = tok / macros.AUDIO_FRAME_RATE / dt
    print(f"B={batch} Q={nq} impl={attn_impl} max_new={max_new}: "
          f"{dt/iters:.3f}s/iter  {thr:.1f} audio-s/s", flush=True)
    return dt / iters


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "ar"):
        run_case(128, 1)          # AR loop only
    if which in ("all", "full"):
        run_case(128, 8)          # full (baseline config)
    if which in ("all", "b256"):
        run_case(256, 8)
    if which in ("all", "b256ar"):
        run_case(256, 1)
