"""Non-finite (inf/nan) localization for --inf-check.

The reference attaches per-module forward/backward hooks
(icefall ``register_inf_check_hooks``, ref trainer.py:178-180,992-993) that
run on every step.  Under jit that would poison fusion, so the TPU-native
design is post-hoc: the hot step only checks the final loss; when it goes
non-finite, the offending batch is re-run ONCE through an instrumented
(un-jitted-cost is irrelevant at crash time) forward with flax's
``capture_intermediates``, and the first module producing a non-finite
output is named.  Complemented by a parameter sweep that names poisoned
weights (the optimizer update after an inf loss typically NaNs params).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


def find_nonfinite_params(params) -> List[str]:
    """Names of parameter leaves containing inf/nan."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        if not bool(jnp.all(jnp.isfinite(leaf.astype(jnp.float32)))):
            bad.append("/".join(str(getattr(k, "key", k)) for k in path))
    return bad


def localize_nonfinite_forward(
    model,
    params,
    micro: Dict[str, jnp.ndarray],
    *,
    train_stage: int = 0,
    rngs: Optional[dict] = None,
) -> List[str]:
    """Re-run one micro-batch capturing every submodule output; returns the
    module paths whose outputs are non-finite, in call order (the FIRST entry
    is the culprit — everything downstream is contaminated)."""
    kw = {}
    if "prompt_codes" in micro:
        kw["y_prompts_codes"] = micro["prompt_codes"]
    if "example_mask" in micro:
        kw["example_mask"] = micro["example_mask"]
    rngs = dict(rngs or {})
    rngs.setdefault("stage", jax.random.PRNGKey(0))
    out, variables = model.apply(
        {"params": params},
        micro["text_tokens"],
        micro["text_tokens_lens"],
        micro["audio_features"],
        micro["audio_features_lens"],
        train_stage=train_stage,
        deterministic=True,
        rngs=rngs,
        capture_intermediates=True,
        mutable=["intermediates"],
        **kw,
    )

    bad: List[str] = []

    def walk(tree, prefix):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, f"{prefix}/{k}" if prefix else str(k))
            return
        # a sown intermediate: tuple of outputs
        for item in tree if isinstance(tree, (tuple, list)) else (tree,):
            leaves = jax.tree_util.tree_leaves(item)
            for leaf in leaves:
                arr = np.asarray(leaf)
                if arr.dtype.kind == "f" and not np.isfinite(arr).all():
                    bad.append(prefix)
                    return

    walk(variables["intermediates"], "")
    return bad


def nonfinite_report(model, params, micro, *, train_stage: int = 0) -> str:
    """Human-readable localization used by the trainer's --inf-check."""
    lines = []
    bad_params = find_nonfinite_params(params)
    if bad_params:
        lines.append(f"non-finite params: {bad_params[:10]}")
    bad_mods = localize_nonfinite_forward(
        model, params, micro, train_stage=train_stage
    )
    if bad_mods:
        lines.append(f"first non-finite module output: {bad_mods[0]}")
        if len(bad_mods) > 1:
            lines.append(f"(contaminated downstream: {bad_mods[1:6]} ...)")
    if not lines:
        lines.append(
            "re-run was finite (non-determinism or optimizer-transient); "
            "no module localized"
        )
    return "; ".join(lines)
