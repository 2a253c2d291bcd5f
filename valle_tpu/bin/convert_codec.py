"""Convert public EnCodec 24 kHz weights to the framework's .npz format.

Input: a torch state-dict file (.pt/.bin) or safetensors with the
transformers/facebook EnCodec layout.  Output: flattened .npz consumed by
bin/infer.py and bin/tokenize_dataset.py.

Run: python -m valle_tpu.bin.convert_codec --input encodec_24khz.bin \
        --output codec.npz
"""

from __future__ import annotations

import argparse

import numpy as np

from valle_tpu.codec.convert import convert_encodec_state_dict


def flatten(tree, prefix="") -> dict:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    args = p.parse_args()

    if args.input.endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = load_file(args.input)
    else:
        import torch

        sd = torch.load(args.input, map_location="cpu", weights_only=False)
        if "state_dict" in sd:
            sd = sd["state_dict"]
        sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}

    params = convert_encodec_state_dict(sd)
    np.savez(args.output, **flatten(params))
    print(f"wrote {args.output} ({len(flatten(params))} arrays)")


if __name__ == "__main__":
    main()
