"""Batch serving CLI: length-bucketed zero-shot TTS at full chip batch.

The reference has no serving layer (inference is a batch-1 Python loop,
ref /root/reference/valle/bin/infer.py:126-259).  This CLI operationalizes
the measured serving recipe (docs/perf_notes.md "realistic-length traffic"):

  - requests are routed to LENGTH BUCKETS, each served by its own compiled
    program with a smaller ``max_new_tokens`` — the measured lever (a
    max_new=256 program serves short traffic ~45% faster than the 512 one);
  - every bucket runs at full ``--batch-size`` (splitting batches to sort by
    length measurably LOSES — B=256 weight-read amortization beats early
    exit), padding the last partial batch with repeats that are discarded;
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
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

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
    p.add_argument("--text-tokens", type=str, required=True)
    p.add_argument("--text-extractor", type=str, default="espeak")
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--codec-checkpoint", type=str, default="",
                   help=".npz converted EnCodec weights; omit to emit codes "
                   "only")
    p.add_argument("--output-dir", type=Path, default=Path("serve_out"))
    p.add_argument("--batch-size", type=int, default=256,
                   help="sequences per compiled batch (the measured B=256 "
                   "optimum on v5e)")
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
    for line in Path(path).read_text().splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split("\t")
        rid, text = parts[0], parts[1]
        wav = parts[2] if len(parts) > 2 and parts[2] != "-" else ""
        ptext = parts[3] if len(parts) > 3 and parts[3] != "-" else ""
        rows.append({"id": rid, "text": text, "wav": wav, "ptext": ptext})
    return rows


def _pad_to(arr, n, fill=0):
    out = np.full((n,), fill, arr.dtype if hasattr(arr, "dtype") else np.int32)
    out[: len(arr)] = arr
    return out


def main():
    args = get_args()
    logging.basicConfig(level=logging.INFO, force=True)
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

        variables = quantize_variables(variables)

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

    tokenizer = TextTokenizer(backend=args.text_extractor)
    collater = get_text_token_collater(args.text_tokens)
    codec = load_codec(args.codec_checkpoint) if args.codec_checkpoint else None

    # ---------------- host preprocessing: tokenize + encode prompts --------
    requests = read_requests(args.requests)
    pcap = args.prompt_cap_frames
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
        if r["wav"]:
            assert codec is not None, "--codec-checkpoint required for prompts"
            wav, sr = read_wav(r["wav"])
            wav = convert_audio(wav, sr, codec.sample_rate, codec.channels)
            codes = np.asarray(codec.encode(wav[None]))[0]  # (T', Q)
            r["prompt"] = codes[:pcap]
        else:
            r["prompt"] = np.zeros((0, cfg.num_quantizers), np.int32)
        # bucket routing by estimated audio length
        est = int(r["nar_len"] * args.frames_per_phoneme)
        r["bucket"] = next((b for b in buckets if est <= b), buckets[-1])

    # ---------------- bucketed batched generation --------------------------
    rng = jax.random.PRNGKey(args.seed)
    manifest = []
    wall0 = time.perf_counter()
    for bucket in buckets:
        group = [r for r in requests if r["bucket"] == bucket]
        if not group:
            continue
        logging.info(f"bucket max_new={bucket}: {len(group)} requests")
        for i in range(0, len(group), args.batch_size):
            chunk = group[i : i + args.batch_size]
            n = len(chunk)
            b = args.batch_size if len(group) > args.batch_size else n
            if mesh is not None:  # batch must divide over the data axis
                dp = args.data_parallel
                b = max(dp, -(-b // dp) * dp)
            # pad ragged shapes to the batch maxima (one compile per
            # (S, P, max_new) triple; S/P rounded up to multiples of 16
            # to bound program count)
            rnd = lambda v: max(16, -(-v // 16) * 16)
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
            rng, sub = jax.random.split(rng)
            t0 = time.perf_counter()
            if mesh is not None:
                put = lambda a: jax.device_put(jnp.asarray(a), bshard)
                ctx = mesh
            else:
                put = jnp.asarray
                ctx = contextlib.nullcontext()
            with ctx:
                out = generate(
                    model, variables, sub,
                    put(x), put(x_lens), put(prompts), put(plens),
                    top_k=args.top_k, temperature=args.temperature,
                    max_new_tokens=bucket,
                    nar_text=put(nar_x),
                    nar_text_lens=put(nar_lens),
                )
            codes = np.asarray(out["codes"])[:n]
            lengths = np.asarray(out["lengths"])[:n]
            dt = time.perf_counter() - t0
            logging.info(
                f"  batch of {n}: {dt:.2f}s "
                f"({lengths.sum() / 75.0 / dt:.1f} audio-s/s)"
            )
            wavs = None
            if codec is not None and lengths.max(initial=0) > 0:
                # one batched decode per generation batch (B=1 decodes
                # measured ~4x slower than B=64, bench.py tokenize); the
                # decoder is causal, so trimming the padded output to each
                # request's L*hop samples equals an unpadded decode
                tmax = int(lengths.max())
                wavs = np.asarray(codec.decode(codes[:, :tmax]))
                hop = 320
            for j, (r, c, L) in enumerate(zip(chunk, codes, lengths)):
                L = int(L)
                np.save(args.output_dir / f"{r['id']}_codes.npy", c[:L])
                entry = {"id": r["id"], "frames": L, "seconds": L / 75.0,
                         "bucket": bucket}
                if wavs is not None and L > 0:
                    write_wav(str(args.output_dir / f"{r['id']}.wav"),
                              wavs[j][..., : L * hop], codec.sample_rate)
                manifest.append(entry)
    total_s = sum(m["seconds"] for m in manifest)
    wall = time.perf_counter() - wall0
    with open(args.output_dir / "manifest.jsonl", "w") as f:
        for m in manifest:
            f.write(json.dumps(m) + "\n")
    logging.info(
        f"served {len(manifest)} requests, {total_s:.1f} audio-s in "
        f"{wall:.1f}s ({total_s / max(wall, 1e-9):.1f} audio-s/s incl. "
        f"host pre/post)"
    )


if __name__ == "__main__":
    main()
