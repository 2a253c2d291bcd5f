"""CLI-level tests for valle_tpu.bin.infer: --continual wiring and the
promptless (no --audio-prompts) path (ref /root/reference/valle/bin/infer.py:
224-230 for continual; the reference crashes without prompts)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from valle_tpu.models import ModelConfig, VALLE

D, NHEAD, LAYERS, Q = 64, 4, 2, 8


def _save_tiny_checkpoint(tmp_path, prefix_mode=0):
    cfg = ModelConfig(
        decoder_dim=D, nhead=NHEAD, num_layers=LAYERS, num_quantizers=Q,
        prefix_mode=prefix_mode,
    )
    model = VALLE(cfg)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 8), jnp.int32)
    y = jnp.zeros((1, 16, Q), jnp.int32)
    variables = model.init(
        {"params": rng, "stage": rng},
        x, jnp.asarray([8], jnp.int32), y, jnp.asarray([16], jnp.int32),
        train_stage=0, deterministic=True, nar_stage=jnp.asarray(2),
    )
    flat = {}

    def walk(tree, prefix):
        for k, v in tree.items():
            path = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, path)
            else:
                flat[path] = np.asarray(v)

    walk(variables["params"], "")
    ckpt = tmp_path / "model.npz"
    np.savez(ckpt, **flat)
    return ckpt


def _write_symbols(tmp_path):
    # chars extractor: every character of the test text must be a symbol
    syms = sorted(set("hello world test"))
    path = tmp_path / "tokens.k2symbols"
    path.write_text("".join(f"{s if s != ' ' else '_'} {i}\n"
                            for i, s in enumerate(syms)))
    return path


class _FakeCodec:
    """Stands in for EncodecJax in CLI tests (no real codec weights needed)."""

    sample_rate = 24000
    channels = 1

    class cfg:
        hop_length = 320
        frame_rate = 75

    def encode(self, wav):
        b = wav.shape[0] if wav.ndim > 1 else 1
        t = max(wav.shape[-1] // 320, 8)
        rng = np.random.RandomState(0)
        return jnp.asarray(rng.randint(0, 1024, (b, t, Q)), jnp.int32)

    def decode(self, codes, out_int16=False):
        t = codes.shape[1] * 320
        dt = jnp.int16 if out_int16 else jnp.float32
        return jnp.zeros((codes.shape[0], t), dt)


def _run_cli(monkeypatch, argv):
    from valle_tpu.bin import infer

    monkeypatch.setattr(sys, "argv", ["infer"] + argv)
    infer.main()


def _char_symbols(tmp_path, text):
    # the chars backend maps inter-word spaces to "_"
    syms = sorted((set(text) - {" "}) | ({"_"} if " " in text else set()))
    path = tmp_path / "tokens.k2symbols"
    path.write_text("".join(f"{s} {i + 1}\n" for i, s in enumerate(syms)))
    return path


def test_infer_promptless(tmp_path, monkeypatch):
    """No --audio-prompts: zero-length prompt region, codes .npy written."""
    text = "hi"
    ckpt = _save_tiny_checkpoint(tmp_path)
    symbols = _char_symbols(tmp_path, text)
    out_dir = tmp_path / "out"
    _run_cli(monkeypatch, [
        "--checkpoint", str(ckpt),
        "--text-tokens", str(symbols),
        "--text-extractor", "chars",
        "--text", text,
        "--decoder-dim", str(D), "--nhead", str(NHEAD),
        "--num-decoder-layers", str(LAYERS), "--num-quantizers", str(Q),
        "--output-dir", str(out_dir),
        "--top-k", "1",
        "--max-new-tokens", "16",
    ])
    codes = np.load(out_dir / "0_codes.npy")
    assert codes.ndim == 2 and codes.shape[1] == Q


def test_infer_continual(tmp_path, monkeypatch):
    """--continual: keeps codebook 1, regenerates 2..Q, writes wav+codes."""
    from valle_tpu.bin import infer

    prompt_text = "hello world"
    ckpt = _save_tiny_checkpoint(tmp_path, prefix_mode=1)
    symbols = _char_symbols(tmp_path, prompt_text)
    out_dir = tmp_path / "out"

    wav_path = tmp_path / "prompt.wav"
    wav_path.write_bytes(b"")  # read_wav is monkeypatched below
    monkeypatch.setattr(infer, "load_codec", lambda path, **kw: _FakeCodec())
    monkeypatch.setattr(
        infer, "read_wav",
        lambda path: (np.zeros(24000 * 2, np.float32), 24000),
    )
    monkeypatch.setattr(infer, "convert_audio", lambda w, sr, tsr, ch: w)

    _run_cli(monkeypatch, [
        "--checkpoint", str(ckpt),
        "--text-tokens", str(symbols),
        "--text-extractor", "chars",
        "--text", "",
        "--text-prompts", prompt_text,
        "--audio-prompts", str(wav_path),
        "--codec-checkpoint", "fake.npz",
        "--prefix-mode", "1",
        "--decoder-dim", str(D), "--nhead", str(NHEAD),
        "--num-decoder-layers", str(LAYERS), "--num-quantizers", str(Q),
        "--output-dir", str(out_dir),
        "--continual", "true",
    ])
    codes = np.load(out_dir / "continual_codes.npy")
    assert codes.ndim == 2 and codes.shape[1] == Q
    assert (out_dir / "continual.wav").exists()


def test_continual_requires_prompts(tmp_path, monkeypatch):
    ckpt = _save_tiny_checkpoint(tmp_path)
    symbols = _char_symbols(tmp_path, "hi")
    with pytest.raises(AssertionError):
        _run_cli(monkeypatch, [
            "--checkpoint", str(ckpt),
            "--text-tokens", str(symbols),
            "--text-extractor", "chars",
            "--text", "",
            "--decoder-dim", str(D), "--nhead", str(NHEAD),
            "--num-decoder-layers", str(LAYERS), "--num-quantizers", str(Q),
            "--continual", "true",
        ])
