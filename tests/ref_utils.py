"""Shared helpers for golden-parity tests against the PyTorch reference."""

import os
import sys
import types

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "ref_shims"))
sys.path.insert(0, "/root/reference")

import torch  # noqa: E402


class PromptedFeatures:
    def __init__(self, prompts, features):
        self.prompts = prompts
        self.features = features

    def to(self, device):
        return PromptedFeatures(self.prompts.to(device), self.features.to(device))

    def sum(self):
        return self.features.sum()

    @property
    def ndim(self):
        return self.features.ndim

    @property
    def data(self):
        return (self.prompts, self.features)


def _register_shims():
    """Register a lightweight valle.data so importing the reference model
    does not drag in the full lhotse-dependent data package."""
    if "valle.data" in sys.modules:
        return
    data_pkg = types.ModuleType("valle.data")
    strat = types.ModuleType("valle.data.input_strategies")
    strat.PromptedFeatures = PromptedFeatures
    data_pkg.input_strategies = strat
    sys.modules["valle.data"] = data_pkg
    sys.modules["valle.data.input_strategies"] = strat


_register_shims()


class RefDecoder(torch.nn.Module):
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


def make_ref(variant, prefix_mode, *, d=64, nhead=4, layers=2, q=8,
             share_embedding=True, prepend_bos=False, seed=0):
    from valle.models.valle import VALLE as RefVALLE, VALLF as RefVALLF
    from valle.modules.transformer import TransformerDecoderLayer

    torch.manual_seed(seed)
    common = dict(
        norm_first=True,
        add_prenet=False,
        prefix_mode=prefix_mode,
        share_embedding=share_embedding,
        nar_scale_factor=1.0,
        prepend_bos=prepend_bos,
        num_quantizers=q,
    )
    if variant == "valle":
        m = RefVALLE(d, nhead, layers, **common)
    else:
        m = RefVALLF(
            d,
            nhead,
            layers,
            decoder_cls=RefDecoder,
            decoder_layer_cls=TransformerDecoderLayer,
            **common,
        )
    m.eval()
    return m


class FixedRng:
    """Stands in for the reference's random.Random to pin draws."""

    def __init__(self, stage, starts=None):
        self._stage = stage
        self._starts = list(starts or [])

    def choices(self, population, weights=None, k=1):
        return [self._stage]

    def randint(self, a, b):
        return self._starts.pop(0)
