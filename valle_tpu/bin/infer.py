"""Zero-shot TTS inference CLI.

Parity: ref /root/reference/valle/bin/infer.py — phonemize prompt+target
text, EnCodec-encode the prompt wav, run batched sampling (top-k /
temperature), EnCodec-decode to wav.  Supports ``--continual`` and the
multi-prompt "|"-separated demo mode; additionally supports true batched
multi-prompt generation (the reference loops batch-1).

Checkpoints:
  --checkpoint      orbax dir saved by valle_tpu.bin.train, OR an .npz of
                    flattened flax params, OR a reference .pt state dict
                    (converted on the fly via utils/convert_reference).
  --codec-checkpoint  .npz produced by valle_tpu.bin.convert_codec from the
                    public EnCodec weights.

Run: python -m valle_tpu.bin.infer --text "..." --text-prompts "..."
     --audio-prompts p.wav --checkpoint exp/checkpoints/best ...
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from valle_tpu.codec import EncodecJax
from valle_tpu.data import (
    convert_audio,
    get_text_token_collater,
    read_wav,
    write_wav,
)
from valle_tpu.data.text_tokenizer import TextTokenizer, tokenize_text
from valle_tpu.models import add_model_arguments, config_from_args, get_model, str2bool
from valle_tpu.sample import continual, generate


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--text-prompts", type=str, default="",
                        help="Text prompts separated by |.")
    parser.add_argument("--audio-prompts", type=str, default="",
                        help="Audio prompt wavs separated by |.")
    parser.add_argument("--text", type=str,
                        default="To get up and running quickly just follow the steps below.",
                        help="Text to be synthesized; | separates multiple.")
    add_model_arguments(parser)
    parser.add_argument("--text-tokens", type=str,
                        default="data/tokenized/unique_text_tokens.k2symbols")
    parser.add_argument("--text-extractor", type=str, default="espeak",
                        help="espeak | pypinyin | pypinyin_initials_finals | chars")
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--codec-checkpoint", type=str, default="",
                        help=".npz of converted EnCodec weights")
    parser.add_argument("--output-dir", type=Path, default=Path("infer/demo"))
    parser.add_argument("--top-k", type=int, default=-100)
    parser.add_argument("--temperature", type=float, default=1.0)
    parser.add_argument("--max-new-tokens", type=int, default=1024)
    parser.add_argument("--continual", type=str2bool, default=False)
    parser.add_argument("--use-averaged-model", type=str2bool, default=False,
                        help="load the running model average saved by the "
                        "trainer's --average-period instead of the raw "
                        "params (icefall-style eval weights)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--quantize-weights", type=str, default="none",
                        choices=("none", "w8", "w8a8"),
                        help="int8-quantize decoder weights for serving "
                        "(w8a8 also runs the Dense matmuls on the MXU int8 "
                        "path); see valle_tpu/nn/qdense.py")
    return parser.parse_args()


def load_model_params(path: str, cfg, variant: str, use_averaged=False):
    p = Path(path)
    if p.suffix == ".npz":
        assert not use_averaged, ".npz checkpoints carry no averaged model"
        flat = dict(np.load(p, allow_pickle=False))
        return unflatten(flat)
    if p.suffix == ".pt":
        import torch

        from valle_tpu.utils.convert_reference import convert_state_dict

        sd = torch.load(p, map_location="cpu", weights_only=False)
        if use_averaged:
            # icefall's save_checkpoint stores the running average under
            # "model_avg" (ref valle/bin/trainer.py:334-378 via
            # icefall.checkpoint.save_checkpoint)
            sd = sd.get("model_avg")
            assert sd is not None, (
                f"{path} has no model_avg (reference run trained without "
                "averaging)"
            )
        elif "model" in sd:
            sd = sd["model"]
        sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
        return jax.tree.map(jnp.asarray, convert_state_dict(sd, cfg, variant))
    # orbax checkpoint dir saved by our trainer.  Restore every leaf as a
    # plain numpy array: the checkpoint may have been written from a
    # DIFFERENT device topology (e.g. trained on an 8-chip mesh, inferred
    # on one chip), and restoring with the saved shardings would fail.
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    meta = ckptr.metadata(p.absolute()).item_metadata
    restore_args = jax.tree.map(
        lambda m: ocp.RestoreArgs(restore_type=np.ndarray), meta.tree
    )
    restored = ckptr.restore(p.absolute(), restore_args=restore_args)
    if use_averaged:
        avg = restored.get("model_avg")
        assert avg is not None, (
            f"{path} has no model_avg (train with --average-period > 0)"
        )
        # averaged weights are kept f32; cast to each param's stored dtype
        params = restored["params"] if "params" in restored else None
        if params is not None:
            return jax.tree.map(
                lambda a, q: jnp.asarray(a, jnp.asarray(q).dtype), avg, params
            )
        return jax.tree.map(jnp.asarray, avg)
    params = restored["params"] if "params" in restored else restored
    return jax.tree.map(jnp.asarray, params)


def unflatten(flat: dict) -> dict:
    out: dict = {}
    for k, v in flat.items():
        parts = k.split("/")
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = jnp.asarray(v)
    return out


def load_codec(path: str, decode_dtype: str = "float32") -> EncodecJax:
    flat = dict(np.load(path, allow_pickle=False))
    params = unflatten(flat)
    # lstm lists were saved as indexed keys; restore list structure
    def fix_lstm(tree):
        if isinstance(tree, dict):
            if set(tree) and all(k.isdigit() for k in tree):
                return [fix_lstm(tree[str(i)]) for i in range(len(tree))]
            return {k: fix_lstm(v) for k, v in tree.items()}
        return tree

    return EncodecJax(fix_lstm(params), decode_dtype=decode_dtype)


def main():
    args = get_args()
    logging.basicConfig(level=logging.INFO, force=True)
    args.output_dir.mkdir(parents=True, exist_ok=True)

    cfg = config_from_args(args)
    if args.quantize_weights == "w8a8":
        cfg = cfg.replace(act_quant=True)
    variant = "vallf" if cfg.model_name.lower() in ("vall-f", "vallf") else "valle"
    model = get_model(cfg)
    params = load_model_params(
        args.checkpoint, cfg, variant,
        use_averaged=args.use_averaged_model,
    )
    variables = {"params": params}
    if args.quantize_weights != "none":
        from valle_tpu.nn.qdense import quantize_variables

        # host-side quantization: ship int8+scales (not the f32 checkpoint)
        # to the accelerator — ~4x less cold-start transfer (see serve.py)
        cpu = jax.local_devices(backend="cpu")[0]
        variables = jax.tree.map(
            np.asarray,
            jax.jit(quantize_variables, device=cpu)(variables),
        )

    text_tokenizer = TextTokenizer(backend=args.text_extractor)
    collater = get_text_token_collater(args.text_tokens)
    codec = load_codec(args.codec_checkpoint) if args.codec_checkpoint else None

    text_prompts = " ".join(args.text_prompts.split("|"))

    # encode audio prompts (concatenated along time, ref infer.py:157-168)
    if args.audio_prompts:
        assert codec is not None, "--codec-checkpoint required with audio prompts"
        segs = []
        for audio_file in args.audio_prompts.split("|"):
            wav, sr = read_wav(audio_file)
            wav = convert_audio(wav, sr, codec.sample_rate, codec.channels)
            segs.append(np.asarray(codec.encode(wav[None]))[0])  # (T', Q)
        prompt_codes = np.concatenate(segs, axis=0)[None]  # (1, P, Q)
    else:
        # promptless (unconditional) generation: a zero-length prompt region.
        # Only meaningful for prefix-mode 0; the model then conditions on the
        # text alone (the reference mostly assumes prompts and asserts).
        prompt_codes = np.zeros((1, 0, cfg.num_quantizers), np.int32)

    rng = jax.random.PRNGKey(args.seed)

    if args.continual:
        # Continual task (ref infer.py:224-230): keep codebook 1 of the prompt
        # codes, re-generate codebooks 2..Q for the region past the first
        # min(T/2, 3 s); the synthesized text must be empty — only the prompt
        # text conditions the NAR passes (ref asserts text == "").
        assert args.audio_prompts, "--continual requires --audio-prompts"
        assert args.text.strip() == "", "--continual requires empty --text"
        tokens, lens = collater([tokenize_text(text_tokenizer, text_prompts)])
        x = jnp.asarray(tokens, jnp.int32)
        x_lens = jnp.asarray(lens, jnp.int32)
        out = continual(
            model, variables, x, x_lens, jnp.asarray(prompt_codes, jnp.int32)
        )
        length = int(out["lengths"][0])
        codes = np.asarray(out["codes"][0, :length])  # (T', Q)
        logging.info(f"continual: {length} frames ({length / 75:.2f}s)")
        if codec is not None:
            wav = np.asarray(codec.decode(codes[None]))[0]
            path = args.output_dir / "continual.wav"
            write_wav(str(path), wav, codec.sample_rate)
            logging.info(f"wrote {path}")
        np.save(args.output_dir / "continual_codes.npy", codes)
        return

    for n, text in enumerate(args.text.split("|")):
        logging.info(f"synthesize text: {text}")
        tokens, lens = collater(
            [tokenize_text(text_tokenizer, f"{text_prompts} {text}".strip())]
        )
        x = jnp.asarray(tokens, jnp.int32)
        x_lens = jnp.asarray(lens, jnp.int32)

        nar_text, nar_text_lens = x, x_lens
        if cfg.prefix_mode in (2, 4) and text_prompts:
            _, enroll_lens = collater(
                [tokenize_text(text_tokenizer, text_prompts.strip())]
            )
            el = int(enroll_lens[0])
            # SOS + synthesis text + EOS (ref valle.py:1068-1079)
            nar_text = jnp.concatenate([x[:, :1], x[:, el - 1 :]], axis=1)
            nar_text_lens = x_lens - (el - 2)

        rng, sub = jax.random.split(rng)
        out = generate(
            model,
            variables,
            sub,
            x,
            x_lens,
            jnp.asarray(prompt_codes, jnp.int32),
            top_k=args.top_k,
            temperature=args.temperature,
            max_new_tokens=args.max_new_tokens,
            nar_text=nar_text,
            nar_text_lens=nar_text_lens,
        )
        length = int(out["lengths"][0])
        codes = np.asarray(out["codes"][0, :length])  # (T', Q)
        logging.info(f"generated {length} frames ({length / 75:.2f}s)")
        if codec is not None:
            wav = np.asarray(codec.decode(codes[None]))[0]
            path = args.output_dir / f"{n}.wav"
            write_wav(str(path), wav, codec.sample_rate)
            logging.info(f"wrote {path}")
        np.save(args.output_dir / f"{n}_codes.npy", codes)


if __name__ == "__main__":
    main()
