"""--inf-check localization: injecting a NaN into a specific parameter must
name that parameter and the first contaminated module (per-module parity
with ref trainer.py:992-993 inf/nan hooks, implemented post-hoc here)."""

import numpy as np

import jax
import jax.numpy as jnp

from valle_tpu.models import ModelConfig, VALLE
from valle_tpu.train.debug import (
    find_nonfinite_params,
    localize_nonfinite_forward,
    nonfinite_report,
)

CFG = ModelConfig(decoder_dim=64, nhead=4, num_layers=2, num_quantizers=8)


def _setup():
    model = VALLE(CFG)
    rng = np.random.RandomState(0)
    b, s, t = 2, 8, 24
    micro = {
        "text_tokens": jnp.asarray(rng.randint(0, 512, (b, s)), jnp.int32),
        "text_tokens_lens": jnp.asarray([s, s - 2], jnp.int32),
        "audio_features": jnp.asarray(
            rng.randint(0, 1024, (b, t, 8)), jnp.int32
        ),
        "audio_features_lens": jnp.asarray([t, t - 4], jnp.int32),
    }
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "stage": key},
        micro["text_tokens"], micro["text_tokens_lens"],
        micro["audio_features"], micro["audio_features_lens"],
        train_stage=0, deterministic=True, nar_stage=jnp.asarray(2),
    )
    return model, variables["params"], micro


def test_clean_model_reports_nothing():
    model, params, micro = _setup()
    assert find_nonfinite_params(params) == []
    assert localize_nonfinite_forward(model, params, micro) == []
    assert "no module localized" in nonfinite_report(model, params, micro)


def test_nan_param_is_named():
    model, params, micro = _setup()
    k = params["ar_decoder"]["layers"]["linear1"]["kernel"]
    params["ar_decoder"]["layers"]["linear1"]["kernel"] = (
        k.at[0, 0, 0].set(jnp.nan)
    )
    bad = find_nonfinite_params(params)
    assert any("ar_decoder" in b and "linear1" in b for b in bad), bad

    mods = localize_nonfinite_forward(model, params, micro)
    assert mods, "no module localized"
    # the first contaminated module must be inside the AR decoder stack
    assert "ar_decoder" in mods[0], mods
    report = nonfinite_report(model, params, micro)
    assert "linear1" in report and "ar_decoder" in report
