"""Batch serving CLI: length-bucketed zero-shot TTS at full chip batch.

The reference has no serving layer (inference is a batch-1 Python loop,
ref /root/reference/valle/bin/infer.py:126-259).  This CLI operationalizes
the measured serving recipe (docs/perf_notes.md "realistic-length traffic"
and the round-4 end-to-end work):

  - requests are routed to LENGTH BUCKETS, each served by its own compiled
    program with a smaller ``max_new_tokens`` — the measured lever (a
    max_new=256 program serves short traffic ~45% faster than the 512 one);
  - every batch is padded to a quantized size (powers of two up to
    ``--batch-size``) so the number of compiled programs stays bounded under
    varied traffic while small request files don't pay for a full B=256;
  - prompt wavs are EnCodec-encoded in BATCHES grouped by sample length
    (B=1 encodes measured ~4x slower than batched, docs/perf_notes.md);
  - codec decode runs per generation batch in ``--decode-batch`` chunks with
    ON-DEVICE int16 conversion (halves the device->host transfer), and the
    fetch + wav writing of batch i overlaps batch i+1's device compute;
  - optional int8 W8A8 weight quantization (the measured +5.5% serving
    winner, ``--quantize-weights w8a8``).

Input: a TSV of requests ``id<TAB>text[<TAB>prompt_wav<TAB>prompt_text]``
(prompt columns optional/'-' for promptless prefix-mode-0 generation).
Output: ``<id>.wav`` + ``<id>_codes.npy`` per request and a
``manifest.jsonl`` with lengths and timings.

Run: python -m valle_tpu.bin.serve --requests reqs.tsv --checkpoint ...
     --text-tokens tokens.k2symbols --codec-checkpoint codec.npz
"""

from __future__ import annotations

import argparse
import contextlib
import json
import logging
import time
from collections import defaultdict
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from valle_tpu import macros
from valle_tpu.bin.infer import load_codec, load_model_params
from valle_tpu.data import (
    convert_audio,
    get_text_token_collater,
    read_wav,
    write_wav,
)
from valle_tpu.data.text_tokenizer import TextTokenizer, tokenize_text
from valle_tpu.models import add_model_arguments, config_from_args, get_model
from valle_tpu.sample import generate


def get_args():
    p = argparse.ArgumentParser()
    p.add_argument("--requests", type=str, required=True,
                   help="TSV: id<TAB>text[<TAB>prompt_wav<TAB>prompt_text]")
    add_model_arguments(p)
    # serving defaults differ from the (recipe-parity) training defaults:
    # bf16 compute + int8 KV-cache are the measured serving winners
    # (docs/perf_notes.md); f32 compute at B=256 doesn't even fit one v5e
    p.set_defaults(dtype="bfloat16", kv_cache_dtype="int8")
    p.add_argument("--text-tokens", type=str, required=True)
    p.add_argument("--text-extractor", type=str, default="espeak")
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--codec-checkpoint", type=str, default="",
                   help=".npz converted EnCodec weights; omit to emit codes "
                   "only")
    p.add_argument("--codec-dtype", type=str, default="bfloat16",
                   choices=("float32", "bfloat16"),
                   help="decode-direction compute dtype; bfloat16 measured "
                   "3.2x faster (552 -> 1791 audio-s/s at B=128) at "
                   "bf16-rounding waveform deviation; float32 for bit-level "
                   "parity work (encode/tokenization is always float32)")
    p.add_argument("--output-dir", type=Path, default=Path("serve_out"))
    p.add_argument("--batch-size", type=int, default=256,
                   help="max sequences per compiled batch (the measured "
                   "B=256 optimum on v5e); partial batches quantize to "
                   "powers of two below this")
    p.add_argument("--decode-batch", type=int, default=128,
                   help="codec-decode chunk size (B=256 decode OOMs on one "
                   "v5e; 128 measured best, docs/perf_notes.md)")
    p.add_argument("--encode-batch", type=int, default=64,
                   help="prompt-encode chunk size (batched encode measured "
                   "~4x over B=1)")
    p.add_argument("--length-buckets", type=str, default="256,512",
                   help="comma-separated max_new_tokens per bucket program")
    p.add_argument("--frames-per-phoneme", type=float, default=8.0,
                   help="audio-frame estimate per phoneme for bucket "
                   "routing (75 Hz frames / ~9 phonemes per second, with "
                   "headroom)")
    p.add_argument("--prompt-cap-frames", type=int, default=225,
                   help="prompt region size (3 s at 75 Hz, the reference's "
                   "enrollment length)")
    p.add_argument("--quantize-weights", type=str, default="none",
                   choices=("none", "w8", "w8a8"))
    p.add_argument("--data-parallel", type=int, default=1,
                   help="shard each batch over this many devices (mesh "
                   "'data' axis; batch-size must divide by it)")
    p.add_argument("--tensor-parallel", type=int, default=1,
                   help="Megatron-shard the decoder weights over this many "
                   "devices (mesh 'model' axis)")
    p.add_argument("--top-k", type=int, default=-100)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def read_requests(path: str):
    rows = []
    for lineno, line in enumerate(Path(path).read_text().splitlines(), 1):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split("\t")
        if len(parts) < 2:
            raise ValueError(
                f"{path}:{lineno}: expected id<TAB>text"
                f"[<TAB>prompt_wav<TAB>prompt_text], got {line!r}"
            )
        rid, text = parts[0], parts[1]
        wav = parts[2] if len(parts) > 2 and parts[2] != "-" else ""
        ptext = parts[3] if len(parts) > 3 and parts[3] != "-" else ""
        rows.append({"id": rid, "text": text, "wav": wav, "ptext": ptext})
    return rows


def _pad_to(arr, n, fill=0):
    out = np.full((n,), fill, arr.dtype if hasattr(arr, "dtype") else np.int32)
    out[: len(arr)] = arr
    return out


def _quantize_batch(n: int, full: int) -> int:
    """Smallest power of two >= n (floor 8), capped at ``full`` — bounds the
    number of compiled programs under varied traffic without padding a
    3-request file to a 256-wide batch."""
    b = 8
    while b < n and b < full:
        b *= 2
    return min(b, full)


def encode_prompts(requests, codec, pcap: int, encode_batch: int):
    """Batch the prompt EnCodec encodes, grouped by truncated sample length.

    Wavs are truncated to the prompt cap (pcap frames x hop samples) BEFORE
    encoding, so every >=3 s prompt lands in one group and the whole set
    encodes in a few full-batch calls instead of one B=1 call per request
    (measured ~4x, docs/perf_notes.md).  Truncation-then-encode equals
    encode-then-truncate for every frame but the last (causal encoder); the
    boundary frame sits at the enrollment cap where the reference's own
    3 s cut happens (ref input_strategies.py:115-159).
    """
    hop = codec.cfg.hop_length
    cap_samples = pcap * hop
    wavs = {}
    for i, r in enumerate(requests):
        if not r["wav"]:
            continue
        wav, sr = read_wav(r["wav"])
        wav = convert_audio(wav, sr, codec.sample_rate, codec.channels)
        wavs[i] = np.asarray(wav)[..., :cap_samples]
    groups = defaultdict(list)
    for i, w in wavs.items():
        groups[w.shape[-1]].append(i)
    for _length, idxs in sorted(groups.items()):
        for j0 in range(0, len(idxs), encode_batch):
            chunk = idxs[j0 : j0 + encode_batch]
            batchw = np.stack([wavs[i] for i in chunk])  # (n, C, L)
            codes = np.asarray(codec.encode(batchw))  # (n, T', Q)
            for j, i in enumerate(chunk):
                requests[i]["prompt"] = codes[j, :pcap]


def main():
    args = get_args()
    logging.basicConfig(
        level=logging.INFO, force=True,
        format="%(asctime)s %(levelname)s %(message)s",
    )
    args.output_dir.mkdir(parents=True, exist_ok=True)
    buckets = sorted(int(b) for b in args.length_buckets.split(","))

    cfg = config_from_args(args)
    if args.quantize_weights == "w8a8":
        cfg = cfg.replace(act_quant=True)
    variant = "vallf" if cfg.model_name.lower() in ("vall-f", "vallf") else "valle"
    model = get_model(cfg)
    variables = {"params": load_model_params(args.checkpoint, cfg, variant)}
    if args.quantize_weights != "none":
        from valle_tpu.nn.qdense import quantize_variables

        # quantize on the HOST cpu backend and re-materialize as numpy:
        # shipping int8 kernels + scales to the accelerator is ~4x less
        # transfer than the f32 checkpoint (1.4 GB -> 0.37 GB at flagship
        # dims — the dominant cold-start cost through a network-attached
        # device)
        cpu = jax.local_devices(backend="cpu")[0]
        variables = jax.tree.map(
            np.asarray,
            jax.jit(quantize_variables, device=cpu)(variables),
        )

    # multi-chip serving: dp shards the batch, tp Megatron-shards the
    # weights (and the qscale scales with them); GSPMD inserts the
    # collectives — exact token parity with single-chip is pinned by
    # tests/test_sharded_generate.py
    mesh = None
    if args.data_parallel * args.tensor_parallel > 1:
        from valle_tpu.parallel.mesh import (
            batch_sharding, make_mesh, quantized_shardings,
        )

        assert args.batch_size % args.data_parallel == 0, (
            "--batch-size must divide by --data-parallel")
        mesh = make_mesh(args.data_parallel, args.tensor_parallel)
        with mesh:
            variables = jax.tree.map(
                jax.device_put, variables, quantized_shardings(variables, mesh)
            )
        bshard = batch_sharding(mesh)

    logging.info("model loaded%s", " + quantized" if args.quantize_weights
                 != "none" else "")
    tokenizer = TextTokenizer(backend=args.text_extractor)
    collater = get_text_token_collater(args.text_tokens)
    codec = (
        load_codec(args.codec_checkpoint, decode_dtype=args.codec_dtype)
        if args.codec_checkpoint
        else None
    )
    # frame rate / hop come from the loaded codec (a codec at another
    # sample rate or hop would otherwise silently mis-time durations)
    frame_rate = (
        codec.cfg.frame_rate if codec is not None else macros.AUDIO_FRAME_RATE
    )
    hop = codec.cfg.hop_length if codec is not None else 320

    # ---------------- host preprocessing: tokenize + encode prompts --------
    requests = read_requests(args.requests)
    pcap = args.prompt_cap_frames
    if any(r["wav"] for r in requests):
        assert codec is not None, "--codec-checkpoint required for prompts"
        encode_prompts(requests, codec, pcap, args.encode_batch)
    for r in requests:
        full = f"{r['ptext']} {r['text']}".strip()
        toks, lens = collater([tokenize_text(tokenizer, full)])
        r["x"], r["x_len"] = np.asarray(toks[0]), int(lens[0])
        if cfg.prefix_mode in (2, 4) and r["ptext"]:
            _, el = collater([tokenize_text(tokenizer, r["ptext"].strip())])
            el = int(el[0])
            # SOS + synthesis text + EOS (ref valle.py:1068-1079)
            nar = np.concatenate([r["x"][:1], r["x"][el - 1 :]])
            r["nar_x"], r["nar_len"] = nar, r["x_len"] - (el - 2)
        else:
            r["nar_x"], r["nar_len"] = r["x"], r["x_len"]
        if "prompt" not in r:
            r["prompt"] = np.zeros((0, cfg.num_quantizers), np.int32)
        # bucket routing by estimated audio length
        est = int(r["nar_len"] * args.frames_per_phoneme)
        r["bucket"] = next((b for b in buckets if est <= b), buckets[-1])

    logging.info("host preprocessing done (%d requests)", len(requests))

    # ---------------- bucketed batched generation --------------------------
    rng = jax.random.PRNGKey(args.seed)
    manifest = []
    writers = ThreadPoolExecutor(max_workers=8)
    wall0 = time.perf_counter()
    jobs = []  # (chunk, bucket) work list
    for bucket in buckets:
        group = [r for r in requests if r["bucket"] == bucket]
        if group:
            logging.info(f"bucket max_new={bucket}: {len(group)} requests")
        for i in range(0, len(group), args.batch_size):
            jobs.append((group[i : i + args.batch_size], bucket))

    def dispatch(chunk, bucket, key):
        """Pad + device-put one batch and dispatch generate (+ chunked
        decode); returns device futures, no host sync."""
        n = len(chunk)
        b = _quantize_batch(n, args.batch_size)
        if mesh is not None:  # batch must divide over the data axis
            dp = args.data_parallel
            b = max(dp, -(-b // dp) * dp)
        # pad ragged shapes to the batch maxima (one compile per
        # (b, S, P, max_new) tuple; S/P rounded up to multiples of 32 and b
        # quantized to powers of two to bound program count — a distinct
        # shape costs 30-60 s of tracing + remote compile per process, so
        # chunks should SHARE programs whenever text lengths are close)
        rnd = lambda v: max(32, -(-v // 32) * 32)
        s = rnd(max(r["x_len"] for r in chunk))
        sn = rnd(max(r["nar_len"] for r in chunk))
        pmax = max((len(r["prompt"]) for r in chunk), default=0)
        p = rnd(pmax) if pmax else 0
        pad = lambda k, w: np.stack(
            [_pad_to(np.asarray(r[k])[:w], w) for r in chunk]
            + [np.zeros((w,), np.int32)] * (b - n)
        )
        x = pad("x", s)
        nar_x = pad("nar_x", sn)
        x_lens = _pad_to(np.asarray([r["x_len"] for r in chunk]), b, 1)
        nar_lens = _pad_to(np.asarray([r["nar_len"] for r in chunk]), b, 1)
        prompts = np.zeros((b, p, cfg.num_quantizers), np.int32)
        plens = np.ones((b,), np.int32)
        for j, r in enumerate(chunk):
            pr = r["prompt"]
            prompts[j, : len(pr)] = pr
            plens[j] = len(pr)
        if mesh is not None:
            put = lambda a: jax.device_put(jnp.asarray(a), bshard)
            ctx = mesh
        else:
            put = jnp.asarray
            ctx = contextlib.nullcontext()
        with ctx:
            out = generate(
                model, variables, key,
                put(x), put(x_lens), put(prompts), put(plens),
                top_k=args.top_k, temperature=args.temperature,
                max_new_tokens=bucket,
                nar_text=put(nar_x),
                nar_text_lens=put(nar_lens),
            )
        wavs = None
        if codec is not None:
            # chunked batched decode with on-device int16 conversion (B=1
            # decodes measured ~4x slower than batched; int16 halves the
            # device->host wav transfer); the decoder is causal, so
            # trimming the padded output to L*hop samples per request
            # equals an unpadded decode
            wavs = [
                codec.decode(out["codes"][j : j + args.decode_batch],
                             out_int16=True)
                for j in range(0, n, args.decode_batch)
            ]
        return {"chunk": chunk, "bucket": bucket, "out": out, "wavs": wavs,
                "t0": time.perf_counter()}

    def finish(job):
        """Fetch + write one dispatched job (runs while the NEXT job's
        device work executes)."""
        chunk, bucket = job["chunk"], job["bucket"]
        n = len(chunk)
        codes = np.asarray(job["out"]["codes"])[:n]
        lengths = np.asarray(job["out"]["lengths"])[:n]
        wavs = (
            np.concatenate([np.asarray(w) for w in job["wavs"]])[:n]
            if job["wavs"] is not None
            else None
        )
        dt = time.perf_counter() - job["t0"]
        logging.info(
            f"  batch of {n} (max_new={bucket}): {dt:.2f}s device+fetch "
            f"({lengths.sum() / frame_rate / dt:.1f} audio-s/s)"
        )
        futures = []
        for j, (r, c, L) in enumerate(zip(chunk, codes, lengths)):
            L = int(L)
            np.save(args.output_dir / f"{r['id']}_codes.npy", c[:L])
            entry = {"id": r["id"], "frames": L,
                     "seconds": L / frame_rate, "bucket": bucket}
            if wavs is not None and L > 0:
                # wav writes go through a thread pool: a full batch is 256
                # files and the serial writes sat on the critical path
                futures.append(writers.submit(
                    write_wav, str(args.output_dir / f"{r['id']}.wav"),
                    wavs[j][..., : L * hop], codec.sample_rate,
                ))
            manifest.append(entry)
        for f in futures:
            f.result()

    pending = None
    for chunk, bucket in jobs:
        rng, sub = jax.random.split(rng)
        t_d = time.perf_counter()
        job = dispatch(chunk, bucket, sub)
        logging.info("  dispatched batch of %d (max_new=%d) in %.2fs host",
                     len(chunk), bucket, time.perf_counter() - t_d)
        if pending is not None:
            finish(pending)  # overlaps the job just dispatched
        pending = job
    if pending is not None:
        finish(pending)

    total_s = sum(m["seconds"] for m in manifest)
    wall = time.perf_counter() - wall0
    with open(args.output_dir / "manifest.jsonl", "w") as f:
        for m in manifest:
            f.write(json.dumps(m) + "\n")
    logging.info(
        f"served {len(manifest)} requests, {total_s:.1f} audio-s in "
        f"{wall:.1f}s ({total_s / max(wall, 1e-9):.1f} audio-s/s wav-out "
        f"incl. host pre/post)"
    )


if __name__ == "__main__":
    main()
