"""VALL-F greedy inference parity and the continual task vs the reference."""

import numpy as np
import pytest
import torch

from tests.ref_utils import make_ref

import jax
import jax.numpy as jnp

from valle_tpu.models import ModelConfig, VALLE, VALLF
from valle_tpu.sample import continual, generate
from valle_tpu.utils.convert_reference import convert_state_dict

D, NHEAD, LAYERS, Q = 64, 4, 2, 8


def _setup(variant, prefix_mode, seed=0):
    ref = make_ref(variant, prefix_mode, d=D, nhead=NHEAD, layers=LAYERS, q=Q, seed=seed)
    cfg = ModelConfig(
        decoder_dim=D, nhead=NHEAD, num_layers=LAYERS, num_quantizers=Q,
        prefix_mode=prefix_mode,
    )
    model = (VALLE if variant == "valle" else VALLF)(cfg)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_state_dict(sd, cfg, variant))
    return ref, model, {"params": params}


@pytest.mark.parametrize("seed", [0, 3])
def test_vallf_greedy_inference_parity(seed):
    ref, model, variables = _setup("vallf", 0, seed)
    rng = np.random.RandomState(seed)
    S, P = 4, 6
    x = rng.randint(0, 512, (1, S)).astype(np.int64)
    x_lens = np.array([S], np.int64)
    prompt = rng.randint(0, 1024, (1, P, Q)).astype(np.int64)

    try:
        with torch.no_grad():
            ref_codes = ref.inference(
                torch.tensor(x), torch.tensor(x_lens), torch.tensor(prompt),
                enroll_x_lens=torch.tensor(x_lens), top_k=1, temperature=1.0,
            ).numpy()
        ref_len = ref_codes.shape[1]
    except SyntaxError:
        ref_codes, ref_len = None, 0

    out = generate(
        model, variables, jax.random.PRNGKey(0),
        jnp.asarray(x), jnp.asarray(x_lens), jnp.asarray(prompt),
        top_k=1, max_new_tokens=S * 16 + 8,
    )
    got_len = int(out["lengths"][0])
    assert got_len == ref_len, (got_len, ref_len)
    if ref_len:
        got = np.asarray(out["codes"][0, :got_len])
        np.testing.assert_array_equal(got[:, 0], ref_codes[0, :, 0])
        mismatch = (got[:, 1:] != ref_codes[0, :, 1:]).mean()
        assert mismatch < 0.02, mismatch


@pytest.mark.parametrize("prefix_mode", [0, 1])
def test_continual_parity(prefix_mode):
    ref, model, variables = _setup("valle", prefix_mode, seed=1)
    rng = np.random.RandomState(1)
    S, T = 5, 40
    x = rng.randint(0, 512, (1, S)).astype(np.int64)
    x_lens = np.array([S], np.int64)
    y = rng.randint(0, 1024, (1, T, Q)).astype(np.int64)

    with torch.no_grad():
        ref_codes = ref.continual(
            torch.tensor(x), torch.tensor(x_lens), torch.tensor(y)
        ).numpy()  # (1, T - prefix, Q)

    out = continual(
        model, variables, jnp.asarray(x), jnp.asarray(x_lens), jnp.asarray(y)
    )
    L = int(out["lengths"][0])
    got = np.asarray(out["codes"][0, :L])
    assert got.shape == ref_codes[0].shape, (got.shape, ref_codes.shape)
    np.testing.assert_array_equal(got[:, 0], ref_codes[0, :, 0])
    mismatch = (got[:, 1:] != ref_codes[0, :, 1:]).mean()
    assert mismatch < 0.02, mismatch


@pytest.mark.parametrize("prefix_mode", [0, 1])
def test_continual_ragged_batch(prefix_mode):
    """Per-sequence prefix semantics: in a padded batch, each row's
    min(len/2, 225) split must come from ITS OWN length — every row of a
    ragged batch must match the same sequence run at batch 1 (where the
    padded and true lengths coincide, the reference's setting)."""
    _, model, variables = _setup("valle", prefix_mode, seed=2)
    rng = np.random.RandomState(2)
    S = 5
    t_pad = 48
    true_lens = [48, 30, 17]
    x = rng.randint(0, 512, (3, S)).astype(np.int64)
    x_lens = np.array([S, S, S], np.int64)
    y = rng.randint(0, 1024, (3, t_pad, Q)).astype(np.int64)
    for i, L in enumerate(true_lens):
        y[i, L:] = 0

    batched = continual(
        model, variables, jnp.asarray(x), jnp.asarray(x_lens),
        jnp.asarray(y), jnp.asarray(true_lens, dtype=jnp.int32),
    )
    for i, L in enumerate(true_lens):
        single = continual(
            model, variables, jnp.asarray(x[i : i + 1]),
            jnp.asarray(x_lens[i : i + 1]), jnp.asarray(y[i : i + 1, :L]),
        )
        lb = int(batched["lengths"][i])
        ls = int(single["lengths"][0])
        assert lb == ls == L - min(L // 2, 225), (i, lb, ls)
        got_b = np.asarray(batched["codes"][i, :lb])
        got_s = np.asarray(single["codes"][0, :ls])
        # codebook 1 is copied input (exact); NAR stages see different
        # padded widths, so allow rare argmax flips at ties
        np.testing.assert_array_equal(got_b[:, 0], got_s[:, 0])
        mismatch = (got_b[:, 1:] != got_s[:, 1:]).mean()
        assert mismatch < 0.05, (i, mismatch)
