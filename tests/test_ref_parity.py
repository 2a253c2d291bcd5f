"""Golden parity tests: our JAX model vs the reference PyTorch model.

The reference (read-only at /root/reference) is imported through minimal shims
(tests/ref_shims + tests/ref_utils).  Weights are converted torch -> flax and
the training forward losses must agree to fp32 tolerance for every variant and
prefix mode.  Random choices the reference draws internally (NAR stage, prefix
length, segment starts) are pinned on both sides.
"""

import numpy as np
import pytest
import torch

from tests.ref_utils import FixedRng, PromptedFeatures, make_ref

import jax
import jax.numpy as jnp

from valle_tpu.models import ModelConfig, VALLE, VALLF
from valle_tpu.utils.convert_reference import convert_state_dict

D, NHEAD, LAYERS, Q = 64, 4, 2, 8
B, S, T = 2, 10, 32


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randint(0, 512, (B, S)).astype(np.int64)
    x_lens = np.array([S, S - 3], np.int64)
    y = rng.randint(0, 1024, (B, T, Q)).astype(np.int64)
    y_lens = np.array([T, T - 9], np.int64)
    return x, x_lens, y, y_lens


def _convert(ref, cfg, variant):
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    return jax.tree.map(jnp.asarray, convert_state_dict(sd, cfg, variant))


@pytest.mark.parametrize("variant", ["valle", "vallf"])
@pytest.mark.parametrize("prefix_mode", [0, 1, 2, 4])
def test_forward_loss_parity(variant, prefix_mode):
    nar_stage = 3
    prefix_len = 5
    starts = [2, 1]

    ref = make_ref(variant, prefix_mode, d=D, nhead=NHEAD, layers=LAYERS, q=Q)
    ref.rng = FixedRng(nar_stage, starts)

    x, x_lens, y, y_lens = _inputs()
    tx, txl, ty, tyl = map(torch.tensor, (x, x_lens, y, y_lens))

    jkwargs = {}
    if prefix_mode == 4:
        p = np.random.RandomState(1).randint(0, 1024, (B, 12, Q)).astype(np.int64)
        prompts_len = np.array([12, 12], np.int64)
        ty_in = PromptedFeatures(torch.tensor(p), ty)
        tyl_in = PromptedFeatures(torch.tensor(prompts_len), tyl)
        jkwargs["y_prompts_codes"] = jnp.asarray(p)
    else:
        ty_in, tyl_in = ty, tyl

    if prefix_mode == 1:
        # pin torch.randint used for the prefix length (ref valle.py:349)
        real_randint = torch.randint
        torch.randint = lambda *a, **k: torch.tensor(prefix_len)
        try:
            with torch.no_grad():
                _, ref_loss, ref_metrics = ref(
                    tx, txl, ty_in, tyl_in, reduction="sum", train_stage=0
                )
        finally:
            torch.randint = real_randint
        jkwargs["prefix_len"] = jnp.asarray(prefix_len)
    else:
        with torch.no_grad():
            _, ref_loss, ref_metrics = ref(
                tx, txl, ty_in, tyl_in, reduction="sum", train_stage=0
            )
        if prefix_mode == 2:
            jkwargs["prefix_len"] = jnp.asarray(min(225, int(0.25 * y_lens.min())))
            jkwargs["prompt_starts"] = jnp.asarray(starts)

    cfg = ModelConfig(
        decoder_dim=D,
        nhead=NHEAD,
        num_layers=LAYERS,
        num_quantizers=Q,
        prefix_mode=prefix_mode,
    )
    cls = VALLE if variant == "valle" else VALLF
    model = cls(cfg)
    params = _convert(ref, cfg, variant)

    out = model.apply(
        {"params": params},
        jnp.asarray(x),
        jnp.asarray(x_lens),
        jnp.asarray(y),
        jnp.asarray(y_lens),
        train_stage=0,
        deterministic=True,
        nar_stage=jnp.asarray(nar_stage),
        **jkwargs,
    )

    assert float(out["loss"]) == pytest.approx(float(ref_loss), rel=2e-4), (
        variant,
        prefix_mode,
    )
    assert float(out["ArTop10Accuracy"]) == pytest.approx(
        float(ref_metrics["ArTop10Accuracy"]), rel=1e-3, abs=1e-5
    )
    assert float(out["NarTop10Accuracy"]) == pytest.approx(
        float(ref_metrics["NarTop10Accuracy"]), rel=1e-3, abs=1e-5
    )


@pytest.mark.parametrize("prepend_bos", [True, False])
def test_prepend_bos_parity(prepend_bos):
    ref = make_ref("valle", 0, d=D, nhead=NHEAD, layers=LAYERS, q=Q,
                   prepend_bos=prepend_bos)
    ref.rng = FixedRng(2)
    x, x_lens, y, y_lens = _inputs(3)
    with torch.no_grad():
        _, ref_loss, _ = ref(
            torch.tensor(x),
            torch.tensor(x_lens),
            torch.tensor(y),
            torch.tensor(y_lens),
            reduction="sum",
            train_stage=0,
        )
    cfg = ModelConfig(
        decoder_dim=D,
        nhead=NHEAD,
        num_layers=LAYERS,
        num_quantizers=Q,
        prefix_mode=0,
        prepend_bos=prepend_bos,
    )
    model = VALLE(cfg)
    params = _convert(ref, cfg, "valle")
    out = model.apply(
        {"params": params},
        jnp.asarray(x),
        jnp.asarray(x_lens),
        jnp.asarray(y),
        jnp.asarray(y_lens),
        train_stage=0,
        deterministic=True,
        nar_stage=jnp.asarray(2),
    )
    assert float(out["loss"]) == pytest.approx(float(ref_loss), rel=2e-4)
