"""EnCodec parity: our JAX implementation vs the public PyTorch model
(transformers modeling_encodec) with identical (random) weights.

Covers: causal conv padding rules, ConvTranspose right-trim, LSTM residual
bottleneck, RVQ code assignment, full encode->codes and codes->wav paths,
and round-trip shape law (75 Hz, hop 320)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from valle_tpu.codec.convert import convert_encodec_state_dict
from valle_tpu.codec.encodec_model import EncodecConfig, EncodecJax


@pytest.fixture(scope="module")
def models():
    from transformers import EncodecConfig as HFConfig, EncodecModel

    torch.manual_seed(0)
    hf = EncodecModel(HFConfig())
    hf.eval()
    # random codebooks (HF initializes them to zeros, which would make every
    # distance tie at 0 — fill with real values)
    with torch.no_grad():
        for layer in hf.quantizer.layers:
            layer.codebook.embed.normal_()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert_encodec_state_dict(sd)
    ours = EncodecJax(params)
    return hf, ours


def test_encode_codes_match(models):
    hf, ours = models
    rng = np.random.RandomState(0)
    wav = rng.randn(2, 1, 24000).astype(np.float32) * 0.1

    with torch.no_grad():
        enc = hf.encode(torch.tensor(wav), bandwidth=6.0)
    ref_codes = enc.audio_codes  # (1, B, Q, T') chunked or (B, Q, T')?
    ref = np.asarray(ref_codes)
    ref = ref.reshape(ref.shape[-3], ref.shape[-2], ref.shape[-1])  # (B,Q,T')

    got = np.asarray(ours.encode(wav, bandwidth=6.0))  # (B, T', Q)
    assert got.shape == (2, 75, 8), got.shape
    mismatch = (got.transpose(0, 2, 1) != ref).mean()
    assert mismatch < 0.005, f"code mismatch rate {mismatch}"


def test_decode_wav_match(models):
    hf, ours = models
    rng = np.random.RandomState(1)
    codes = rng.randint(0, 1024, (2, 8, 75))  # (B, Q, T')

    with torch.no_grad():
        ref = hf.decode(
            torch.tensor(codes)[None], audio_scales=[None]
        ).audio_values.numpy()

    got = np.asarray(ours.decode(jnp.asarray(codes.transpose(0, 2, 1))))
    assert got.shape == ref.shape, (got.shape, ref.shape)
    err = np.max(np.abs(got - ref)) / max(np.max(np.abs(ref)), 1e-6)
    assert err < 2e-3, err


def test_roundtrip_shapes(models):
    _, ours = models
    rng = np.random.RandomState(2)
    for t in (24000, 36017, 7900):
        wav = rng.randn(1, 1, t).astype(np.float32) * 0.1
        codes = ours.encode(wav)
        expected_frames = int(np.ceil(t / 320))
        assert codes.shape == (1, expected_frames, 8), (t, codes.shape)
        out = ours.decode(codes)
        assert out.shape[-1] >= t - 320 and out.shape[-1] % 320 == 0


def test_real_prompt_wav_codes_match(models):
    """Parity on REAL speech: the LibriTTS prompt wav bundled with the
    reference (egs/libritts/prompts), not synthetic noise.  The released
    24 kHz EnCodec weights are unreachable in this environment (no network;
    see docs/goldens.md), so weights are seeded-random — the audio
    distribution is the real thing the convs/RVQ see in production."""
    import os

    hf, ours = models
    path = "/root/reference/egs/libritts/prompts/8455_210777_000067_000000.wav"
    if not os.path.exists(path):
        pytest.skip("reference prompt wavs unavailable")
    from valle_tpu.data import convert_audio, read_wav

    wav, sr = read_wav(path)
    wav = convert_audio(wav, sr, 24000, 1)[None].astype(np.float32)  # (1,1,T)

    with torch.no_grad():
        enc = hf.encode(torch.tensor(wav), bandwidth=6.0)
    ref = np.asarray(enc.audio_codes)
    ref = ref.reshape(ref.shape[-3], ref.shape[-2], ref.shape[-1])  # (B,Q,T')

    got = np.asarray(ours.encode(wav, bandwidth=6.0))  # (B, T', Q)
    mismatch = (got.transpose(0, 2, 1) != ref).mean()
    assert mismatch < 0.005, f"code mismatch rate {mismatch}"

    # decode parity on the same codes
    with torch.no_grad():
        ref_wav = hf.decode(
            torch.tensor(np.asarray(got.transpose(0, 2, 1)))[None],
            audio_scales=[None],
        ).audio_values.numpy()
    got_wav = np.asarray(ours.decode(jnp.asarray(got)))
    err = np.max(np.abs(got_wav - ref_wav)) / max(np.max(np.abs(ref_wav)), 1e-6)
    assert err < 2e-3, err

    # mel closeness of the two decodes (the mel-allclose north-star check,
    # run with converted weights; real-weight version blocked on network)
    from valle_tpu.data.fbank import mel_distance

    d = mel_distance(got_wav[0, 0], ref_wav[0, 0])
    assert d < 0.05, d


def test_decode_bf16_close_and_int16(models):
    """decode_dtype='bfloat16' (serving knob): waveform within bf16-rounding
    distance of fp32; out_int16 conversion matches a host-side conversion
    of the fp32 decode within 2 LSB."""
    _hf, ours = models
    bf = EncodecJax(ours.params, decode_dtype="bfloat16")
    rng = np.random.RandomState(2)
    codes = jnp.asarray(rng.randint(0, 1024, (2, 75, 8)).astype(np.int32))

    f32 = np.asarray(ours.decode(codes))
    b16 = np.asarray(bf.decode(codes))
    assert b16.dtype == np.float32  # cast back on the way out
    scale = max(np.max(np.abs(f32)), 1e-6)
    assert np.max(np.abs(b16 - f32)) / scale < 0.05

    i16 = np.asarray(ours.decode(codes, out_int16=True))
    assert i16.dtype == np.int16
    ref_i16 = np.round(np.clip(f32, -1, 1) * 32767.0).astype(np.int16)
    assert np.max(np.abs(i16.astype(np.int32) - ref_i16.astype(np.int32))) <= 2
