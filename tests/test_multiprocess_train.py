"""2-process GLOBAL-mesh training step (VERDICT r2 gap #5).

The closest analogue of the reference's DDP backward all-reduce
(ref /root/reference/valle/bin/trainer.py:913-915): two CPU processes with 4
virtual devices each form one global 8-device data-parallel mesh, jit the
REAL ScaledAdam train step over it, and the resulting loss/params must match
a single-process 8-device run of the identical step bit-for-bit (modulo
collective reduction order).  Also exercises Orbax checkpoint save/restore
across processes (all ranks participate in the distributed save).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

# Shared between the 2-process workers and the single-process reference run
# below — keep one source of truth for model/batch construction.
_COMMON = r"""
import numpy as np
import jax
import jax.numpy as jnp


def build_model_and_batch():
    from valle_tpu.models import ModelConfig, VALLE
    from valle_tpu.optim import eden_lr, scaled_adam

    cfg = ModelConfig(decoder_dim=64, nhead=4, num_layers=2,
                      num_quantizers=8, dropout=0.0)
    model = VALLE(cfg)
    tx = scaled_adam(learning_rate=0.02, clipping_scale=2.0)
    rng = np.random.RandomState(0)
    a, b, s, t = 2, 8, 16, 24
    batch = {
        "text_tokens": rng.randint(0, 512, (a, b, s)).astype(np.int32),
        "text_tokens_lens": np.full((a, b), s, np.int32),
        "audio_features": rng.randint(0, 1024, (a, b, t, 8)).astype(np.int32),
        "audio_features_lens": np.full((a, b), t, np.int32),
    }
    return cfg, model, tx, batch


def run_step(model, tx, batch_global_arrays):
    from valle_tpu.optim import eden_lr
    from valle_tpu.train.step import init_train_state, make_train_step

    host_batch = jax.tree.map(lambda v: jnp.asarray(v[0]),
                              batch_global_arrays)
    state = init_train_state(
        model, tx, jax.random.PRNGKey(0), host_batch, train_stage=1
    )
    step = make_train_step(
        model, tx, lambda s_, e: eden_lr(0.05, s_, e),
        train_stage=1, deterministic=True,
    )
    return state, step


def checksum(params):
    return float(
        sum(jnp.sum(jnp.abs(x.astype(jnp.float32))) for x in
            jax.tree.leaves(params))
    )
"""

_WORKER = _COMMON + r"""
import sys
rank = int(sys.argv[1]); world = int(sys.argv[2])
coord = sys.argv[3]; out_dir = sys.argv[4]

jax.distributed.initialize(coordinator_address=coord,
                           num_processes=world, process_id=rank)
assert len(jax.devices()) == 8

from valle_tpu.parallel.mesh import make_mesh
from jax.sharding import NamedSharding, PartitionSpec as P

cfg, model, tx, batch = build_model_and_batch()
mesh = make_mesh(8, 1, devices=jax.devices())

with mesh:
    state, step = run_step(model, tx, batch)
    # per-host half of the global batch, assembled into one global array
    # sharded over 'data' (the multi-host loader-shard path)
    bsh = NamedSharding(mesh, P(None, "data"))
    lo, hi = rank * 4, rank * 4 + 4
    gbatch = {
        k: jax.make_array_from_process_local_data(bsh, v[:, lo:hi])
        for k, v in batch.items()
    }
    # replicate params/opt state over the global mesh
    rep = NamedSharding(mesh, P())
    state = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(rep, np.asarray(x)),
        state,
    )
    state2, metrics = step(state, gbatch, jax.random.PRNGKey(1),
                           jnp.zeros((), jnp.int32))
    loss = float(metrics["loss"])
    csum = checksum(state2.params)

    # distributed checkpoint: every rank participates in the Orbax save
    from valle_tpu.train.checkpoint import CheckpointManager
    mgr = CheckpointManager(out_dir + "/ckpt", keep_last_k=2)
    mgr.save_step(1, state2, {"loss": loss})
    restored, meta = mgr.restore("checkpoint-1", state2)
    rcsum = checksum(restored.params)
    assert int(restored.step) == int(state2.step)

import json, os
with open(os.path.join(out_dir, f"train_rank{rank}.json"), "w") as f:
    json.dump({"loss": loss, "checksum": csum, "restored_checksum": rcsum,
               "meta_loss": meta.get("loss")}, f)
print("TRAIN_WORKER_OK", rank)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single_process_reference():
    """The same step on this process's local 8-device mesh."""
    import jax

    ns = {}
    exec(_COMMON, ns)
    from valle_tpu.parallel.mesh import make_mesh, shard_batch

    cfg, model, tx, batch = ns["build_model_and_batch"]()
    mesh = make_mesh(8, 1, devices=jax.devices()[:8])
    with mesh:
        state, step = ns["run_step"](model, tx, batch)
        gbatch = shard_batch(
            {k: jax.numpy.asarray(v) for k, v in batch.items()}, mesh, axis=1
        )
        state2, metrics = step(state, gbatch, jax.random.PRNGKey(1),
                               jax.numpy.zeros((), jax.numpy.int32))
        return float(metrics["loss"]), ns["checksum"](state2.params)


def test_two_process_global_mesh_train_step(tmp_path):
    port = _free_port()
    out = tmp_path / "out"
    out.mkdir()
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env.pop("JAX_PLATFORM_NAME", None)
        procs.append(subprocess.Popen(
            [sys.executable, "-c",
             "import jax; jax.config.update('jax_platforms','cpu');"
             f"exec({_WORKER!r})",
             str(rank), "2", f"127.0.0.1:{port}", str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ))
    outs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=600)
        outs.append((p.returncode, stdout, stderr))
    for rc, stdout, stderr in outs:
        assert rc == 0 and "TRAIN_WORKER_OK" in stdout, (stdout + stderr)[-4000:]

    r0 = json.loads((out / "train_rank0.json").read_text())
    r1 = json.loads((out / "train_rank1.json").read_text())
    # both ranks observe the same replicated loss/updated params
    assert r0["loss"] == r1["loss"]
    assert r0["checksum"] == r1["checksum"]
    # checkpoint round-trip is lossless and carries metadata
    for r in (r0, r1):
        assert abs(r["restored_checksum"] - r["checksum"]) < 1e-6
        assert r["meta_loss"] == r["loss"]

    # and the global 2-process result matches a single-process 8-device run
    ref_loss, ref_csum = _single_process_reference()
    np.testing.assert_allclose(r0["loss"], ref_loss, rtol=1e-5)
    np.testing.assert_allclose(r0["checksum"], ref_csum, rtol=1e-5)


def _build_codes_corpus(root):
    """Small VSH codes corpus (25 utts) for the CLI-level run."""
    from valle_tpu import macros
    from valle_tpu.data import (
        CodeShardWriter, Manifest, SymbolTable, TextTokenizer,
    )

    rng = np.random.RandomState(0)
    tok = TextTokenizer(backend="chars")
    words = ["hello", "world", "voice", "test", "codec"]
    records, symbols = [], set()
    with CodeShardWriter(root) as w:
        for k in range(25):
            text = " ".join(rng.choice(words, 4))
            utt_id = f"0_{100}_{k:06d}_000000"
            dur = float(rng.uniform(1.0, 3.0))
            t = int(dur * macros.AUDIO_FRAME_RATE)
            shard, key = w.write(utt_id, rng.randint(0, 1024, (t, 8)))
            tokens = tok([text])[0]
            symbols.update(tokens)
            records.append({"id": utt_id, "text": text, "tokens": tokens,
                            "duration": dur, "shard": shard, "key": key})
    Manifest.save(iter(records), root / "manifest_train.jsonl.gz")
    table = SymbolTable()
    for s in sorted(symbols):
        table.add(s)
    table.to_file(root / "unique_text_tokens.k2symbols")


def test_train_cli_two_process(tmp_path):
    """The FULL bin/train CLI across 2 processes: --num-processes /
    --coordinator-address wire jax.distributed.initialize, the rank-sharded
    loader equalizes per-host group counts, shard_batch assembles the
    global batch from process-local data, and the distributed Orbax
    epoch checkpoint lands.  (The step-level 2-process test above pins
    numerics; this pins the CLI plumbing.)"""
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    _build_codes_corpus(corpus)
    exp = tmp_path / "exp"
    exp.mkdir()
    port = _free_port()
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env.pop("JAX_PLATFORM_NAME", None)
        # the container's sitecustomize pins JAX_PLATFORMS=axon over the
        # env var, so the CLI must be launched through an explicit
        # jax.config override (same pattern as the step-level workers)
        procs.append(subprocess.Popen(
            [sys.executable, "-c",
             "import jax; jax.config.update('jax_platforms','cpu');"
             "import runpy, sys;"
             "sys.argv = ['train'] + sys.argv[1:];"
             "runpy.run_module('valle_tpu.bin.train', run_name='__main__')",
             "--manifest-dir", str(corpus),
             "--exp-dir", str(exp),
             "--decoder-dim", "64", "--nhead", "4",
             "--num-decoder-layers", "2", "--num-quantizers", "8",
             "--num-epochs", "1",
             "--max-duration", "8.0",
             "--num-buckets", "2",
             "--accumulate-grad-steps", "2",
             "--oom-check", "false",
             "--tensorboard", "false",
             "--valid-interval", "100000",
             "--save-every-n", "0",
             "--log-interval", "1",
             "--num-processes", "2",
             "--process-id", str(rank),
             "--coordinator-address", f"127.0.0.1:{port}"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ))
    outs = [p.communicate(timeout=900) for p in procs]
    for p, (stdout, stderr) in zip(procs, outs):
        assert p.returncode == 0, (stdout + stderr)[-4000:]
    log = (exp / "log.txt").read_text()
    assert "distributed: process" in log
    assert "epoch 1 done" in log
    ckpts = list((exp / "checkpoints").iterdir())
    assert ckpts, "no distributed checkpoint written"
