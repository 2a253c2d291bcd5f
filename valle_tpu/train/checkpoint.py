"""Checkpoint save/load/resume on Orbax.

Parity with the reference's icefall checkpoint flow
(ref /root/reference/valle/bin/trainer.py:331-483, 703-755):
  - per-epoch checkpoints ``epoch-N`` and per-N-batches ``checkpoint-<step>``
    with pruning to ``keep-last-k`` (ref :716-738)
  - ``best-train-loss`` / ``best-valid-loss`` copies (ref :477-483)
  - state includes params, averaged model, optimizer state, sampler state,
    and counters for mid-epoch resume (ref :995-1012)
  - train-stage switching: resuming into a different stage keeps model
    weights but drops optimizer/scheduler/sampler state (ref :383-416)
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from valle_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str | Path, keep_last_k: int = 20):
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.keep_last_k = keep_last_k
        self._ckpt = ocp.StandardCheckpointer()

    # ------------------------------------------------------------- low level
    @staticmethod
    def _barrier(tag: str) -> None:
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(tag)

    def _save(self, name: str, state: TrainState, meta: Dict) -> Path:
        path = (self.dir / name).absolute()
        # pre-save cleanup on the primary ONLY, with a barrier before the
        # distributed save: every rank runs _save, and an unbarriered
        # rmtree on rank 1 can delete the directory rank 0's in-flight
        # Orbax save just created (a measured flake in the 2-process CLI
        # train test)
        if jax.process_index() == 0 and path.exists():
            shutil.rmtree(path)
        self._barrier(f"ckpt_clean_{name}")
        self._ckpt.save(path, state)
        self._ckpt.wait_until_finished()
        if jax.process_index() == 0:
            (self.dir / f"{name}.meta.json").write_text(json.dumps(meta))
        self._barrier(f"ckpt_done_{name}")
        return path

    def _restore(
        self, name: str, template: TrainState
    ) -> Tuple[TrainState, Dict]:
        path = (self.dir / name).absolute()
        state = self._ckpt.restore(path, template)
        # Orbax commits the restored leaves to the template's devices
        # (typically device 0).  The train step's batches are sharded over
        # the run's mesh, and jit rejects mixing committed single-device
        # arrays with mesh-sharded ones.  Convert to host numpy: the
        # leaves become uncommitted and the first jitted step places them
        # under whatever mesh THIS run uses — resume is topology-
        # independent (same fix as bin/infer.load_model_params; caught by
        # tests/test_init_checkpoint.py resuming on an 8-device mesh).
        import numpy as np

        state = jax.tree.map(np.asarray, state)
        meta_file = self.dir / f"{name}.meta.json"
        meta = json.loads(meta_file.read_text()) if meta_file.exists() else {}
        return state, meta

    # ------------------------------------------------------------ public api
    def save_epoch(self, epoch: int, state: TrainState, meta: Dict) -> None:
        meta = dict(meta, epoch=epoch)
        self._save(f"epoch-{epoch}", state, meta)
        self._update_best(f"epoch-{epoch}", meta)

    def save_step(self, step: int, state: TrainState, meta: Dict) -> None:
        self._save(f"checkpoint-{step}", state, meta)
        self._update_best(f"checkpoint-{step}", meta)
        self._prune()

    def _update_best(self, name: str, meta: Dict) -> None:
        """Track best-train-loss / best-valid-loss as symlink-style markers
        (ref trainer.py:477-483 copies; we record the source name).
        Primary-only: concurrent read-modify-writes of the marker files
        from multiple ranks would race."""
        if jax.process_index() != 0:
            return
        for key, marker in (
            ("train_loss", "best-train-loss"),
            ("valid_loss", "best-valid-loss"),
        ):
            if key not in meta or meta[key] is None:
                continue
            marker_file = self.dir / f"{marker}.json"
            prev = (
                json.loads(marker_file.read_text()) if marker_file.exists() else None
            )
            if prev is None or meta[key] < prev["value"]:
                marker_file.write_text(
                    json.dumps({"value": meta[key], "source": name})
                )

    def _prune(self) -> None:
        if jax.process_index() != 0:
            return
        steps = sorted(
            int(p.name.split("-")[1])
            for p in self.dir.iterdir()
            if p.is_dir() and p.name.startswith("checkpoint-")
        )
        protected = set()
        for marker in ("best-train-loss", "best-valid-loss"):
            f = self.dir / f"{marker}.json"
            if f.exists():
                protected.add(json.loads(f.read_text())["source"])
        for s in steps[: -self.keep_last_k] if self.keep_last_k else []:
            name = f"checkpoint-{s}"
            if name in protected:
                continue
            shutil.rmtree(self.dir / name, ignore_errors=True)
            (self.dir / f"{name}.meta.json").unlink(missing_ok=True)

    def latest(self) -> Optional[str]:
        """Most recent checkpoint name: prefer highest checkpoint-<step>,
        else highest epoch-N (ref load_checkpoint_if_available :331-433)."""
        steps = [
            int(p.name.split("-")[1])
            for p in self.dir.iterdir()
            if p.is_dir() and p.name.startswith("checkpoint-")
        ]
        if steps:
            return f"checkpoint-{max(steps)}"
        epochs = [
            int(p.name.split("-")[1])
            for p in self.dir.iterdir()
            if p.is_dir() and p.name.startswith("epoch-")
        ]
        if epochs:
            return f"epoch-{max(epochs)}"
        return None

    def best(self, which: str = "valid") -> Optional[str]:
        f = self.dir / f"best-{which}-loss.json"
        if f.exists():
            return json.loads(f.read_text())["source"]
        return None

    def restore(
        self,
        name: str,
        template: TrainState,
        *,
        tx=None,
        from_stage: Optional[int] = None,
        to_stage: Optional[int] = None,
    ) -> Tuple[TrainState, Dict]:
        """Restore ``name``.  When the train stage changes (AR -> NAR), keep
        model weights but reinitialize optimizer state and drop sampler state
        (ref trainer.py:383-416)."""
        stage_switch = (
            from_stage is not None
            and to_stage is not None
            and from_stage != to_stage
        )
        if not stage_switch:
            return self._restore(name, template)
        # weights-only restore: read params/model_avg with a params template,
        # rebuild optimizer state fresh for the new stage's trainable subtree
        state, meta = self._restore_weights_only(name, template)
        assert tx is not None, "tx required for stage-switch restore"
        from valle_tpu.train.state import partition_params

        train_params, _ = partition_params(state.params, to_stage)
        state = state.replace(opt_state=tx.init(train_params))
        meta = dict(meta)
        meta.pop("sampler_state", None)
        meta["stage_switched"] = True
        return state, meta

    def _restore_weights_only(self, name, template):
        # restore full tree with whatever opt_state the checkpoint has by
        # reading params subtree only
        path = (self.dir / name).absolute()
        restored = ocp.StandardCheckpointer().restore(path)
        meta_file = self.dir / f"{name}.meta.json"
        meta = json.loads(meta_file.read_text()) if meta_file.exists() else {}
        state = template.replace(
            step=jax.tree.map(lambda x: x, restored["step"]),
            params=restored["params"],
            model_avg=restored.get("model_avg", template.model_avg),
        )
        return state, meta
