"""The whole-system proof: tokenize -> train (AR then NAR, real CLIs) ->
checkpoint -> infer -> decoded waveform, asserted against ground truth.

Every stage of the pipeline is proven piecewise elsewhere (loss parity,
optimizer parity, sampler parity, codec parity); this test composes them the
way the reference's recipes do (ref /root/reference/README.md:96-121 trains
a demo model whose checkpoint bin/infer.py consumes,
ref valle/bin/infer.py:138-145): a tiny synthetic corpus is tokenized with
the real ``tokenize_dataset`` CLI through a (random-weight) EnCodec codec,
both training stages run through the real ``train`` CLI until overfit, and
the real ``infer`` CLI then reproduces the training utterances from their
text alone — token-exact over the ground-truth length and mel-identical
after codec decode.

This is the strongest released-weight substitute available in this
environment (HF weight downloads are network-blocked, docs/goldens.md);
with real codec weights the same loop asserts against real audio.

Wall-clock note: the module fixture trains ~170 real optimizer steps on CPU
(~4-6 min); it is the single most expensive test in the suite and the only
one that drives the full train->infer composition.
"""

import gzip
import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np
import pytest

TEXTS = ["alpha one", "bravo two", "charlie three", "delta four"]
DIMS = ["--decoder-dim", "128", "--nhead", "4",
        "--num-decoder-layers", "4", "--num-quantizers", "8",
        "--prefix-mode", "0", "--dropout", "0.0"]
REPO = Path(__file__).resolve().parent.parent


def _run_cli(module, argv):
    """Run a CLI module in a CPU-pinned subprocess (the container's
    sitecustomize pins JAX_PLATFORMS=axon over the env var, so the launch
    goes through an explicit jax.config override)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_PLATFORM_NAME", None)
    code = ("import jax; jax.config.update('jax_platforms','cpu');"
            "import runpy, sys; mod = sys.argv[1];"
            "sys.argv = [mod.rsplit('.', 1)[-1]] + sys.argv[2:];"
            "runpy.run_module(mod, run_name='__main__')")
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "-c", code, module] + [str(a) for a in argv],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, (
        f"{module} failed in {time.time() - t0:.0f}s\n"
        f"stdout:\n{r.stdout[-2000:]}\nstderr:\n{r.stderr[-4000:]}"
    )
    return r


def _write_corpus(root: Path):
    """Four distinct sine-mix utterances with transcripts."""
    from valle_tpu.data import write_wav

    sr = 24000
    rows = []
    for i, text in enumerate(TEXTS):
        dur = 1.1 + 0.15 * i
        t = np.arange(int(dur * sr)) / sr
        f0 = 150.0 + 90.0 * i
        wav = (0.45 * np.sin(2 * np.pi * f0 * t)
               + 0.3 * np.sin(2 * np.pi * (2.3 * f0) * t)
               + 0.15 * np.sin(2 * np.pi * (3.7 * f0) * t))
        wav *= 0.6 + 0.4 * np.sin(2 * np.pi * 2.0 * t + i)  # slow AM
        p = root / f"utt{i}.wav"
        write_wav(str(p), wav.astype(np.float32), sr)
        rows.append((f"spk_0_{i:06d}_000000", str(p), text))
    tsv = root / "train.tsv"
    tsv.write_text("".join("\t".join(r) + "\n" for r in rows))
    return tsv


def _write_random_codec(path: Path):
    """Random-weight EnCodec in the convert_codec .npz format (weight values
    are arbitrary but FIXED, so encode/decode is a deterministic codec)."""
    import torch
    from transformers import EncodecConfig as HFConfig, EncodecModel

    from valle_tpu.bin.convert_codec import flatten
    from valle_tpu.codec.convert import convert_encodec_state_dict

    torch.manual_seed(0)
    hf = EncodecModel(HFConfig())
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    np.savez(path, **flatten(convert_encodec_state_dict(sd)))


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    data, exp = root / "data", root / "exp"
    data.mkdir(), exp.mkdir()
    tsv = _write_corpus(root)
    codec_npz = root / "codec.npz"
    _write_random_codec(codec_npz)

    _run_cli("valle_tpu.bin.tokenize_dataset", [
        "--tsv", tsv, "--output-dir", data, "--split", "train",
        "--codec-checkpoint", codec_npz, "--text-extractor", "chars",
        "--batch-frames", "4",
    ])

    # replicate manifest records (same shard keys -> no extra audio work) so
    # each epoch sees enough optimizer steps
    man = data / "manifest_train.jsonl.gz"
    recs = [json.loads(l) for l in gzip.open(man, "rt")]
    with gzip.open(man, "wt") as f:
        for rep in range(24):
            for r in recs:
                f.write(json.dumps({**r, "id": f"{r['id']}_r{rep}"}) + "\n")

    train = ["valle_tpu.bin.train", "--manifest-dir", data, "--exp-dir", exp,
             "--max-duration", "20", "--num-buckets", "1",
             "--base-lr", "0.05", "--warmup-steps", "30",
             "--log-interval", "20", "--save-every-n", "0",
             "--valid-interval", "100000", "--keep-last-k", "2",
             "--tensorboard", "false", "--oom-check", "false",
             "--rng-impl", "threefry2x32"] + DIMS
    # two-stage recipe through the SAME exp dir: stage 2 resumes from the
    # stage-1 checkpoint (shared weights carried over, optimizer reset)
    _run_cli(train[0], train[1:] + ["--train-stage", "1",
                                    "--num-epochs", "8"])
    _run_cli(train[0], train[1:] + ["--train-stage", "2",
                                    "--num-epochs", "16"])
    return root, data, exp, codec_npz


def test_overfit_infer_reproduces_training_audio(trained):
    root, data, exp, codec_npz = trained
    from valle_tpu.bin.infer import load_codec
    from valle_tpu.data import Manifest
    from valle_tpu.data.fbank import mel_distance

    m = Manifest.load(data / "manifest_train.jsonl.gz")
    gt = {m.records[i]["text"]: m.codes(i) for i in range(len(TEXTS))}

    ckdir = exp / "checkpoints"
    eps = [d for d in os.listdir(ckdir)
           if d.startswith("epoch-") and not d.endswith(".json")]
    ck = ckdir / sorted(eps, key=lambda s: int(s.split("-")[1]))[-1]
    meta = json.loads((ckdir / f"{ck.name}.meta.json").read_text())
    assert meta["train_stage"] == 2

    outdir = root / "infer_out"
    _run_cli("valle_tpu.bin.infer", [
        "--checkpoint", ck, "--codec-checkpoint", codec_npz,
        "--text-tokens", data / "unique_text_tokens.k2symbols",
        "--text-extractor", "chars",
        "--text", "|".join(TEXTS),
        "--top-k", "1", "--max-new-tokens", "150",
        "--output-dir", outdir,
    ] + DIMS)

    codec = load_codec(str(codec_npz))
    for n, text in enumerate(TEXTS):
        gen = np.load(outdir / f"{n}_codes.npy")
        ref = gt[text]
        # wav written by the CLI (the full pipeline product)
        assert (outdir / f"{n}.wav").exists()
        # EOS must fire near the ground-truth length (not run to max_new)
        assert len(gen) < 150, f"{text}: EOS never fired"
        assert abs(len(gen) - len(ref)) <= int(0.2 * len(ref)) + 3, (
            f"{text}: generated length {len(gen)} vs ground truth {len(ref)}"
        )
        L = min(len(gen), len(ref))
        acc = float((gen[:L] == ref[:L]).mean())
        assert acc >= 0.98, f"{text}: token accuracy {acc:.3f}"
        wav_g = np.asarray(codec.decode(gen[None]))[0].squeeze()
        wav_r = np.asarray(codec.decode(ref[None]))[0].squeeze()
        lw = min(wav_g.shape[-1], wav_r.shape[-1])
        md = mel_distance(wav_g[..., :lw], wav_r[..., :lw])
        assert md < 0.1, f"{text}: mel distance {md:.3f}"
