"""Batch assembly: manifest + sampler -> static-shape numpy batch dicts.

Parity: ref /root/reference/valle/data/dataset.py:33-111
(``SpeechSynthesisDataset``) — batches carry utt_id, text, audio codes
(B, T, Q) with lens, text tokens with lens.  Plus the TtsDataModule loader
surface (ref datamodule.py:62-421) collapsed into one loader class: bucketed
sampling, prompt strategy for prefix mode 4, micro-batch grouping for grad
accumulation, and worker-free deterministic iteration (XLA does the heavy
lifting; host work here is gathers + pads).
"""

from __future__ import annotations

import random
from typing import Dict, Iterator, List, Optional

import numpy as np

from valle_tpu import macros
from valle_tpu.data.bucketing import BucketSpec, DynamicBucketingSampler
from valle_tpu.data.collation import TextTokenCollater
from valle_tpu.data.input_strategies import NeighborPromptStrategy
from valle_tpu.data.shards import Manifest


class SpeechSynthesisDataset:
    """Index-based access mirroring the reference dataset's output dict.

    When the manifest's shards are vsh-format and the native C++ loader is
    built (native/loader/valle_loader.cc), the codes gather+pad runs in C++
    worker threads (GIL released across the ctypes call); otherwise a numpy
    per-utterance loop.
    """

    def __init__(self, manifest: Manifest, collater: TextTokenCollater):
        self.manifest = manifest
        self.collater = collater
        # fbank manifests (.vsf float16 shards) carry mel features for the
        # Transformer baseline; gathered as float32 via the numpy path.
        self.float_features = manifest.uses_float_features()
        self._native = None
        if manifest.uses_vshards():
            from valle_tpu.data import native_loader

            if native_loader.available():
                names = manifest.shard_names()
                self._shard_index = {n: i for i, n in enumerate(names)}
                self._native = native_loader.NativeShardSet(
                    [manifest.root / n for n in names]
                )

    def __len__(self) -> int:
        return len(self.manifest)

    def _gather_codes(self, indices: List[int], t: int, num_q: int):
        if self._native is not None:
            recs = [self.manifest[i] for i in indices]
            si = [self._shard_index[r["shard"]] for r in recs]
            ri = [int(r["key"]) for r in recs]
            return self._native.gather_pad(si, ri, t, num_q)
        dtype = np.float32 if self.float_features else np.int32
        codes = np.zeros((len(indices), t, num_q), dtype)
        code_lens = np.zeros((len(indices),), np.int32)
        for k, i in enumerate(indices):
            c = self.manifest.codes(i)
            n = min(c.shape[0], t)
            codes[k, :n] = c[:n]
            code_lens[k] = n
        return codes, code_lens

    def batch(self, spec: BucketSpec, indices: List[int]) -> Dict:
        """Index -1 marks a shape-padding row (fixed-batch buckets): it gets
        [bos, eos] text, zero-length codes, and example_mask False so the
        model excludes it from loss/metrics."""
        recs = [self.manifest[i] if i >= 0 else None for i in indices]
        real0 = next(r for r in recs if r is not None)
        token_ids, token_lens = self.collater.index(
            [r["tokens"] if r is not None else [] for r in recs]
        )
        b = len(indices)
        s, t = spec.max_text_len, spec.max_audio_len
        text = np.zeros((b, s), np.int32)
        text[:, : token_ids.shape[1]] = token_ids[:, :s]
        num_q = int(
            real0.get("feature_dim") or real0.get("num_quantizers") or 8
        )
        codes, code_lens = self._gather_codes(
            [i for i in indices if i >= 0], t, num_q
        )
        mask = np.array([i >= 0 for i in indices], bool)
        if not mask.all():
            full = np.zeros((b, t, num_q), codes.dtype)
            full_lens = np.zeros((b,), np.int32)
            full[mask], full_lens[mask] = codes, code_lens
            codes, code_lens = full, full_lens
        return {
            "utt_id": [r["id"] if r is not None else real0["id"] for r in recs],
            "text": [r["text"] if r is not None else "" for r in recs],
            "text_tokens": text,
            "text_tokens_lens": np.minimum(token_lens, s).astype(np.int32),
            "audio_features": codes,
            "audio_features_lens": code_lens,
            "example_mask": mask,
        }


class TtsDataLoader:
    """Bucketed loader yielding train-step-ready batches.

    Yields dicts with a leading micro-batch axis of size ``accum_steps``
    (micro-batches drawn from the same bucket so shapes agree), matching the
    reference's gradient-accumulation loop (ref trainer.py:675-696).
    """

    def __init__(
        self,
        manifest: Manifest,
        collater: TextTokenCollater,
        *,
        max_duration: float = 40.0,
        num_buckets: int = 10,
        accum_steps: int = 1,
        shuffle: bool = True,
        seed: int = 42,
        rank: int = 0,
        world_size: int = 1,
        dataset_name: Optional[str] = None,  # enables prefix-mode-4 prompts
        min_duration: float = 0.0,
        max_utt_duration: float = float("inf"),
        batch_quant: int = 8,
        frame_rate: Optional[float] = None,  # default: EnCodec 75 Hz; fbank
        # manifests use 24000/256 = 93.75 Hz (auto-detected)
        feature_transforms: Optional[List] = None,  # e.g. [SpecAugment()],
        # applied to float (fbank) features only (ref datamodule.py:251-274)
    ):
        self.feature_transforms = list(feature_transforms or [])
        self.dataset = SpeechSynthesisDataset(manifest, collater)
        if frame_rate is None:
            frame_rate = (
                macros.SAMPLE_RATE / macros.FBANK_HOP
                if self.dataset.float_features
                else macros.AUDIO_FRAME_RATE
            )
        self.frame_rate = frame_rate
        self.manifest = manifest
        self.accum = accum_steps
        # duration filtering (ref trainer.py:832-846)
        keep = [
            i
            for i, r in enumerate(manifest.records)
            if min_duration <= r["duration"] <= max_utt_duration
        ]
        self.keep = keep
        durations = [manifest.records[i]["duration"] for i in keep]
        text_lens = [len(manifest.records[i]["tokens"]) + 2 for i in keep]
        audio_lens = [
            int(round(manifest.records[i]["duration"] * self.frame_rate))
            for i in keep
        ]
        self.sampler = DynamicBucketingSampler(
            durations,
            text_lens,
            audio_lens,
            max_duration=max_duration,
            num_buckets=num_buckets,
            shuffle=shuffle,
            seed=seed,
            rank=rank,
            world_size=world_size,
            batch_quant=batch_quant,
        )
        self.prompts = None
        if dataset_name:
            ids = [manifest.records[i]["id"] for i in keep]
            self.prompts = NeighborPromptStrategy(dataset_name, ids)
            self._codes_cache: Dict[str, np.ndarray] = {}
        self.seed = seed
        self.rank = rank
        self.world_size = world_size

    def set_epoch(self, epoch: int) -> None:
        self.sampler.set_epoch(epoch)
        self.epoch = epoch

    def state_dict(self):
        """Mid-epoch resume state.  The unit is the accumulation GROUP, not
        the sampler batch: groups are what every rank yields in lockstep, so
        the count is identical on all hosts by construction (rank-0's saved
        state is valid for everyone); per-rank batch positions are re-derived
        on resume by replaying the deterministic stream (no data loaded for
        skipped groups)."""
        return {
            "epoch": getattr(self, "epoch", 0),
            "groups_consumed": getattr(self, "_groups_done", 0),
        }

    def load_state_dict(self, state):
        if "groups_consumed" in state:
            self.epoch = int(state["epoch"])
            self.sampler.set_epoch(self.epoch)
            self._resume_groups = int(state["groups_consumed"])
            self._resume_epoch = self.epoch
        else:  # legacy (pre-round-5) batch-count state
            self.sampler.load_state_dict(state)
            self.epoch = int(state.get("epoch", 0))

    def _one(self, spec: BucketSpec, rel_indices: List[int]) -> Dict:
        # -1 = shape-padding placeholder from the quantized sampler
        indices = [self.keep[i] if i >= 0 else -1 for i in rel_indices]
        batch = self.dataset.batch(spec, indices)
        if self.feature_transforms and self.dataset.float_features:
            for tf in self.feature_transforms:
                batch["audio_features"] = tf(
                    batch["audio_features"], batch["audio_features_lens"]
                )
        return batch

    def _add_prompts(self, micros: List[Dict], rng) -> None:
        """Prefix-mode-4 prompts with ONE shared length across the whole
        accumulation group (the model derives prefix_len from the static
        prompt shape, ref models/valle.py:429,797)."""
        codes_of: Dict[str, np.ndarray] = {}
        for m in micros:
            for u in m["utt_id"]:
                for n in self.prompts.utt2neighbors[u]:
                    if n not in codes_of:
                        codes_of[n] = self.manifest.codes(self._id_index(n))
        chosen_per_micro = [
            [rng.choice(self.prompts.utt2neighbors[u]) for u in m["utt_id"]]
            for m in micros
        ]
        all_chosen = [c for row in chosen_per_micro for c in row]
        p = min(
            min(codes_of[c].shape[0] for c in all_chosen),
            3 * macros.AUDIO_FRAME_RATE,
        )
        for m, chosen in zip(micros, chosen_per_micro):
            prompts = []
            for c in chosen:
                codes = codes_of[c]
                t = codes.shape[0]
                start = rng.randint(0, t - p) if t > p else 0
                prompts.append(codes[start : start + p])
            m["prompt_codes"] = np.stack(prompts, axis=0).astype(np.int32)
            m["prompt_codes_lens"] = np.full((len(chosen),), p, np.int32)

    def _id_index(self, utt_id: str) -> int:
        if not hasattr(self, "_id2idx"):
            self._id2idx = {r["id"]: i for i, r in enumerate(self.manifest.records)}
        return self._id2idx[utt_id]

    def _count_groups(self, pairs) -> int:
        """Accumulation groups a (bucket_id, indices) stream
        (``sampler.batches_for_rank``) would yield — same per-bucket
        buffering as __iter__, specs only."""
        tally: Dict = {}
        n = 0
        for b, _rel in pairs:
            spec = self.sampler.bucket_specs[b]
            key = (spec.max_text_len, spec.max_audio_len)
            tally[key] = tally.get(key, 0) + 1
            if tally[key] == self.accum:
                n += 1
                tally[key] = 0
        return n

    def __iter__(self) -> Iterator[Dict]:
        ep = getattr(self, "epoch", 0)
        # Mid-epoch resume: replay the FULL deterministic stream and skip
        # the first ``_resume_groups`` groups without loading their data.
        # Replaying (rather than sampler-level batch skipping) keeps group
        # boundaries, per-bucket pending buffers, and the multi-host group
        # count identical to the uninterrupted run on every rank — a
        # sampler-batch skip would shift boundaries because ranks consume
        # different batch counts to yield the same group count.
        skip = 0
        if getattr(self, "_resume_epoch", None) == ep:
            skip = self._resume_groups
            self._resume_epoch = None  # one-shot
        # Multi-host: every host must yield the SAME number of groups or
        # the global-mesh collectives inside the jitted step desynchronize.
        # The global batch list is a pure function of (seed, epoch), so
        # every host derives every rank's group count and truncates to the
        # minimum — no communication needed.  Both the limit and the actual
        # iteration count groups over the full (replayed) epoch stream.
        limit = None
        if self.world_size > 1:
            limit = min(
                self._count_groups(self.sampler.batches_for_rank(r))
                for r in range(self.world_size)
            )
        self._groups_done = 0
        # per-bucket-shape buffering: a group forms whenever any bucket has
        # ``accum`` pending batches (micro-batch shapes must agree inside a
        # group).  Indices are buffered, not data — nothing is loaded for
        # batches whose group never completes, and alternating buckets no
        # longer discard partial groups (the earlier reset-on-change logic
        # could starve a rank of groups entirely).
        pending: Dict = {}
        for spec, rel in self.sampler:
            if limit is not None and self._groups_done >= limit:
                break
            key = (spec.max_text_len, spec.max_audio_len)
            pending.setdefault(key, []).append((spec, rel))
            if len(pending[key]) == self.accum:
                grp = pending.pop(key)
                g = self._groups_done
                self._groups_done += 1
                if g < skip:
                    continue  # replayed group: counted, data never loaded
                micro = [self._one(s, r) for s, r in grp]
                if self.prompts is not None:
                    # per-group seeding makes prompt draws a pure function
                    # of (seed, epoch, group index) — resume-invariant
                    rng = random.Random(
                        self.seed * 1_000_003 + ep * 8191 + g
                    )
                    self._add_prompts(micro, rng)
                yield self._stack(micro)
        # ragged per-bucket tails dropped (shapes must agree)


    @staticmethod
    def _stack(micros: List[Dict]) -> Dict:
        """Stack same-bucket micro-batches along a leading accumulation axis,
        padding ragged example counts up with masked dummy rows (dummy text =
        a copy of row 0, so attention has valid keys; audio len 0 and
        example_mask False keep it out of the loss)."""
        out: Dict = {}
        b = max(m["text_tokens"].shape[0] for m in micros)
        for m in micros:
            n = m["text_tokens"].shape[0]
            if n == b:
                continue
            pad = b - n
            m["utt_id"] = list(m["utt_id"]) + [m["utt_id"][0]] * pad
            m["text"] = list(m["text"]) + [""] * pad
            for k, v in list(m.items()):
                if k in ("utt_id", "text"):
                    continue
                if k == "example_mask":
                    m[k] = np.concatenate([v, np.zeros((pad,), bool)])
                elif k in ("text_tokens", "text_tokens_lens", "prompt_codes",
                           "prompt_codes_lens"):
                    m[k] = np.concatenate([v, np.repeat(v[:1], pad, axis=0)])
                else:  # audio_features / audio_features_lens -> zeros
                    m[k] = np.concatenate(
                        [v, np.zeros((pad,) + v.shape[1:], v.dtype)]
                    )
        for k in micros[0]:
            if k in ("utt_id", "text"):
                out[k] = [m[k] for m in micros]
            else:
                out[k] = np.stack([m[k] for m in micros], axis=0)
        return out


class Prefetcher:
    """Runs an iterator in a background thread with a bounded queue, so host
    batch assembly (native gather + text collation) overlaps device compute —
    the role of the reference's DataLoader worker processes
    (ref datamodule.py:336-343).  Exceptions propagate to the consumer."""

    def __init__(self, iterable, depth: int = 2):
        import queue
        import threading

        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._sentinel = object()
        self._err: List[BaseException] = []

        def work():
            try:
                for item in iterable:
                    self._q.put(item)
            except BaseException as e:  # noqa: BLE001 — re-raised in consumer
                self._err.append(e)
            finally:
                self._q.put(self._sentinel)

        self._thread = threading.Thread(target=work, daemon=True)
        self._thread.start()

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is self._sentinel:
                if self._err:
                    raise self._err[0]
                return
            yield item
