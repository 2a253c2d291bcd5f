"""Warm-starting bin/train from a reference PyTorch checkpoint.

The torch -> TPU migration path: a user with a reference-trained ``.pt``
(ref /root/reference/valle/bin/trainer.py checkpoints, ``{"model": sd}``)
passes ``--init-checkpoint`` and continues training here.  The weights go
through utils/convert_reference; optimizer/scheduler state starts fresh
(ScaledAdam's param_rms is re-initialized from the LOADED weights, not the
random init).  Trained with lr=0 for one epoch, the saved checkpoint must
reproduce the converted reference weights exactly.

The resume test also pins a bug this file caught: same-stage CLI resume on
a multi-device mesh (orbax restore used to commit leaves to device 0,
which jit rejects against mesh-sharded batches).
"""

import gzip
import json
from pathlib import Path

import numpy as np
import pytest

from tests.test_e2e_overfit import _run_cli, _write_corpus, _write_random_codec

DIMS = ["--decoder-dim", "64", "--nhead", "4", "--num-decoder-layers", "2",
        "--num-quantizers", "8", "--prefix-mode", "0", "--dropout", "0.0"]


def _train_argv(data, exp, root, epochs):
    return ["valle_tpu.bin.train", "--manifest-dir", data, "--exp-dir", exp,
            "--init-checkpoint", root / "init.pt",
            "--train-stage", "1", "--num-epochs", str(epochs),
            "--base-lr", "0.0", "--warmup-steps", "1",
            "--max-duration", "20", "--num-buckets", "1",
            "--save-every-n", "0", "--valid-interval", "100000",
            "--tensorboard", "false", "--oom-check", "false",
            "--rng-impl", "threefry2x32"] + DIMS


@pytest.fixture(scope="module")
def warm_started(tmp_path_factory):
    """Tokenized corpus + one lr=0 epoch warm-started from a reference .pt.

    Returns (root, data, exp, reference state_dict as numpy)."""
    import torch

    from tests.ref_utils import make_ref

    root = tmp_path_factory.mktemp("warmstart")
    data = root / "data"
    data.mkdir()
    tsv = _write_corpus(root)
    codec_npz = root / "codec.npz"
    _write_random_codec(codec_npz)
    _run_cli("valle_tpu.bin.tokenize_dataset", [
        "--tsv", tsv, "--output-dir", data, "--split", "train",
        "--codec-checkpoint", codec_npz, "--text-extractor", "chars",
        "--batch-frames", "4",
    ])
    man = data / "manifest_train.jsonl.gz"
    recs = [json.loads(l) for l in gzip.open(man, "rt")]
    with gzip.open(man, "wt") as f:
        for rep in range(4):
            for r in recs:
                f.write(json.dumps({**r, "id": f"{r['id']}_r{rep}"}) + "\n")

    ref = make_ref("valle", 0, d=64, nhead=4, layers=2, q=8)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    torch.save({"model": ref.state_dict()}, root / "init.pt")

    exp = root / "exp_pt"
    exp.mkdir()
    r = _run_cli(*_split(_train_argv(data, exp, root, epochs=1)))
    assert "warm-started weights" in (r.stderr + r.stdout)
    return root, data, exp, sd


def _split(argv):
    return argv[0], argv[1:]


def test_warm_start_from_reference_pt(warm_started):
    root, data, exp, sd = warm_started
    from valle_tpu.bin.infer import load_model_params
    from valle_tpu.models import ModelConfig
    from valle_tpu.utils.convert_reference import convert_state_dict

    cfg = ModelConfig(decoder_dim=64, nhead=4, num_layers=2,
                      num_quantizers=8, prefix_mode=0)
    expected = convert_state_dict(sd, cfg, "valle")
    got = load_model_params(str(exp / "checkpoints" / "epoch-1"),
                            cfg, "valle")
    flat_e = _flatten(expected)
    flat_g = _flatten(got)
    assert flat_e.keys() == flat_g.keys()
    for k in flat_e:
        e, g = np.asarray(flat_e[k]), np.asarray(flat_g[k])
        assert e.shape == g.shape, k
        np.testing.assert_allclose(g, e, rtol=0, atol=1e-7, err_msg=k)


def test_warm_start_skipped_when_resuming(warm_started):
    """A restart of a warm-started run must resume its own checkpoint (on
    the 8-device test mesh — pinning the topology-independent restore),
    not re-load --init-checkpoint (which would discard progress)."""
    root, data, exp, _ = warm_started
    assert (exp / "checkpoints" / "epoch-1").exists()
    r = _run_cli(*_split(_train_argv(data, exp, root, epochs=2)))
    log = r.stderr + r.stdout
    assert "warm-started weights" not in log
    assert "resumed from epoch-1" in log


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out


def test_pt_use_averaged_model(tmp_path):
    """infer/serve consume the reference checkpoint's model_avg with
    --use-averaged-model (icefall stores it under "model_avg")."""
    import torch

    from tests.ref_utils import make_ref
    from valle_tpu.bin.infer import load_model_params
    from valle_tpu.models import ModelConfig
    from valle_tpu.utils.convert_reference import convert_state_dict

    ref = make_ref("valle", 0, d=64, nhead=4, layers=2, q=8, seed=0)
    avg = make_ref("valle", 0, d=64, nhead=4, layers=2, q=8, seed=1)
    pt = tmp_path / "ckpt.pt"
    torch.save({"model": ref.state_dict(), "model_avg": avg.state_dict()}, pt)

    cfg = ModelConfig(decoder_dim=64, nhead=4, num_layers=2,
                      num_quantizers=8, prefix_mode=0)
    sd_avg = {k: v.detach().numpy() for k, v in avg.state_dict().items()}
    expected = _flatten(convert_state_dict(sd_avg, cfg, "valle"))
    got = _flatten(load_model_params(str(pt), cfg, "valle",
                                     use_averaged=True))
    assert expected.keys() == got.keys()
    for k in expected:
        np.testing.assert_array_equal(np.asarray(got[k], np.float32),
                                      np.asarray(expected[k], np.float32),
                                      err_msg=k)
