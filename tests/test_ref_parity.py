"""Golden parity tests: our JAX model vs the reference PyTorch model.

The reference (read-only at /root/reference) is imported through minimal shims
(tests/ref_shims) standing in for icefall/torchmetrics/lhotse.  Weights are
converted torch -> flax and the training forward losses must agree to fp32
tolerance for every variant and prefix mode.  Random choices the reference
draws internally (NAR stage, prefix length, segment starts) are pinned on
both sides.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "ref_shims"))
sys.path.insert(0, "/root/reference")

import jax
import jax.numpy as jnp
import torch

# Pre-register a lightweight valle.data.input_strategies so importing the
# reference model does not drag in the full lhotse-dependent data package.
import types


class _PromptedFeatures:
    def __init__(self, prompts, features):
        self.prompts = prompts
        self.features = features

    def to(self, device):
        return _PromptedFeatures(self.prompts.to(device), self.features.to(device))

    def sum(self):
        return self.features.sum()

    @property
    def ndim(self):
        return self.features.ndim

    @property
    def data(self):
        return (self.prompts, self.features)


# Must be registered before any `valle` import: valle/__init__.py eagerly
# imports valle.data, which needs the full lhotse stack.
_data_pkg = types.ModuleType("valle.data")
_strat = types.ModuleType("valle.data.input_strategies")
_strat.PromptedFeatures = _PromptedFeatures
_data_pkg.input_strategies = _strat
sys.modules.setdefault("valle.data", _data_pkg)
sys.modules.setdefault("valle.data.input_strategies", _strat)

from valle_tpu.models import ModelConfig, VALLE, VALLF
from valle_tpu.utils.convert_reference import convert_state_dict

D, NHEAD, LAYERS, Q = 64, 4, 2, 8
B, S, T = 2, 10, 32


class _RefDecoder(torch.nn.Module):
    """Old-torch-style TransformerDecoder driver: modern torch's
    nn.TransformerDecoder rejects the reference's (x, stage_emb) tuple
    inputs, so VALL-F needs this loop shim to run at all."""

    def __init__(self, layer, num_layers, norm=None):
        super().__init__()
        import copy

        self.layers = torch.nn.ModuleList(
            [copy.deepcopy(layer) for _ in range(num_layers)]
        )
        self.norm = norm

    def forward(self, tgt, memory, tgt_mask=None, memory_mask=None,
                tgt_key_padding_mask=None, memory_key_padding_mask=None):
        output = tgt
        for mod in self.layers:
            output = mod(
                output,
                memory,
                tgt_mask=tgt_mask,
                memory_mask=memory_mask,
                tgt_key_padding_mask=tgt_key_padding_mask,
                memory_key_padding_mask=memory_key_padding_mask,
            )
        if self.norm is not None:
            output = self.norm(output)
        return output


def _make_ref(variant, prefix_mode, share_embedding=True, prepend_bos=False):
    from valle.models.valle import VALLE as RefVALLE, VALLF as RefVALLF
    from valle.modules.transformer import TransformerDecoderLayer

    torch.manual_seed(0)
    if variant == "valle":
        m = RefVALLE(
            D,
            NHEAD,
            LAYERS,
            norm_first=True,
            add_prenet=False,
            prefix_mode=prefix_mode,
            share_embedding=share_embedding,
            nar_scale_factor=1.0,
            prepend_bos=prepend_bos,
            num_quantizers=Q,
        )
    else:
        m = RefVALLF(
            D,
            NHEAD,
            LAYERS,
            norm_first=True,
            add_prenet=False,
            decoder_cls=_RefDecoder,
            decoder_layer_cls=TransformerDecoderLayer,
            prefix_mode=prefix_mode,
            share_embedding=share_embedding,
            nar_scale_factor=1.0,
            prepend_bos=prepend_bos,
            num_quantizers=Q,
        )
    m.eval()
    return m


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randint(0, 512, (B, S)).astype(np.int64)
    x_lens = np.array([S, S - 3], np.int64)
    y = rng.randint(0, 1024, (B, T, Q)).astype(np.int64)
    y_lens = np.array([T, T - 9], np.int64)
    return x, x_lens, y, y_lens


class _FixedRng:
    """Stands in for the reference's random.Random to pin draws."""

    def __init__(self, stage, starts=None):
        self._stage = stage
        self._starts = list(starts or [])

    def choices(self, population, weights=None, k=1):
        return [self._stage]

    def randint(self, a, b):
        return self._starts.pop(0)


@pytest.mark.parametrize("variant", ["valle", "vallf"])
@pytest.mark.parametrize("prefix_mode", [0, 1, 2, 4])
def test_forward_loss_parity(variant, prefix_mode):
    from valle.data.input_strategies import PromptedFeatures

    nar_stage = 3
    prefix_len = 5
    starts = [2, 1]

    ref = _make_ref(variant, prefix_mode)
    ref.rng = _FixedRng(nar_stage, starts)

    x, x_lens, y, y_lens = _inputs()
    tx = torch.tensor(x)
    txl = torch.tensor(x_lens)
    ty = torch.tensor(y)
    tyl = torch.tensor(y_lens)

    kwargs = {}
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

        def fake_randint(*a, **k):
            return torch.tensor(prefix_len)

        torch.randint = fake_randint
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
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_state_dict(sd, cfg, variant))

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

    ref_total = float(ref_loss)
    got_total = float(out["loss"])
    assert got_total == pytest.approx(ref_total, rel=2e-4), (
        variant,
        prefix_mode,
        got_total,
        ref_total,
    )
    assert float(out["ArTop10Accuracy"]) == pytest.approx(
        float(ref_metrics["ArTop10Accuracy"]), rel=1e-3, abs=1e-5
    )
    assert float(out["NarTop10Accuracy"]) == pytest.approx(
        float(ref_metrics["NarTop10Accuracy"]), rel=1e-3, abs=1e-5
    )


@pytest.mark.parametrize("prepend_bos", [True, False])
def test_prepend_bos_parity(prepend_bos):
    ref = _make_ref("valle", 0, prepend_bos=prepend_bos)
    ref.rng = _FixedRng(2)
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
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_state_dict(sd, cfg, "valle"))
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
