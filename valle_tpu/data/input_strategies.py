"""Prompt selection strategies.

Parity: ref /root/reference/valle/data/input_strategies.py:16-159 —
``PromptedFeatures`` pairs (prompts, features) through training, and the
prefix-mode-4 strategy builds a same-speaker neighbor map (LibriTTS id
structure speaker_book_x_y; LJSpeech LJxxx-yyyy chapter prefix), picks a
random neighbor per utterance at batch time, and truncates it to <= 3 s with
a random offset.

Here the strategy works over our Manifest records (speaker inferred from the
utterance id) and returns code arrays; all prompts in a batch share one
length so prefix-mode-4's equal-length invariant holds
(ref models/valle.py:429).
"""

from __future__ import annotations

import random
from collections import defaultdict
from typing import Dict, List, Sequence, Tuple

import numpy as np

from valle_tpu import macros


class PromptedFeatures:
    def __init__(self, prompts, features):
        self.prompts = prompts
        self.features = features

    @property
    def data(self):
        return (self.prompts, self.features)

    @property
    def ndim(self):
        return self.features.ndim

    def sum(self):
        return self.features.sum()


def _speaker_of(utt_id: str, dataset: str) -> str:
    if dataset.lower() == "libritts":
        return utt_id.split("_")[0]
    if dataset.lower() == "ljspeech":
        return utt_id[:5]  # LJxxx chapter prefix (ref :103-111)
    raise ValueError(dataset)


class NeighborPromptStrategy:
    """utt -> same-speaker adjacent utterances (prev + next in sorted order)."""

    def __init__(self, dataset: str, utt_ids: Sequence[str]):
        self.dataset = dataset
        self.utt2neighbors: Dict[str, List[str]] = defaultdict(list)
        if dataset.lower() == "libritts":
            speaker2utts: Dict[str, List[str]] = defaultdict(list)
            for u in utt_ids:
                speaker2utts[_speaker_of(u, dataset)].append(u)
            for spk, utts in speaker2utts.items():
                uttids = sorted(utts)
                if len(uttids) == 1:
                    self.utt2neighbors[uttids[0]].append(uttids[0])
                    continue
                utt2prev = dict(zip(uttids, [uttids[1]] + uttids[:-1]))
                utt2post = dict(zip(uttids[:-1], uttids[1:]))
                for u, p in utt2prev.items():
                    self.utt2neighbors[u].append(p)
                for u, p in utt2post.items():
                    self.utt2neighbors[u].append(p)
        elif dataset.lower() == "ljspeech":
            uttids = list(utt_ids)
            if len(uttids) == 1:
                self.utt2neighbors[uttids[0]].append(uttids[0])
            else:
                utt2prev = dict(zip(uttids, [uttids[1]] + uttids[:-1]))
                utt2post = dict(zip(uttids[:-1], uttids[1:]))
                for u, p in utt2post.items():
                    if u[:5] == p[:5]:
                        self.utt2neighbors[u].append(p)
                for u, p in utt2prev.items():
                    if u[:5] == p[:5] or not self.utt2neighbors[u]:
                        self.utt2neighbors[u].append(p)
        else:
            raise ValueError(dataset)

    def pick_prompts(
        self,
        batch_utt_ids: Sequence[str],
        codes_of: Dict[str, np.ndarray],
        rng: random.Random,
        max_prompt_frames: int = 3 * macros.AUDIO_FRAME_RATE,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (prompts (B, P, Q) int64, prompt_lens (B,)) with one shared
        P = min(shortest neighbor, 3 s), random offset per utterance
        (ref :133-152)."""
        chosen = [rng.choice(self.utt2neighbors[u]) for u in batch_utt_ids]
        lens = [codes_of[c].shape[0] for c in chosen]
        p = min(min(lens), max_prompt_frames)
        prompts = []
        for c in chosen:
            codes = codes_of[c]
            t = codes.shape[0]
            start = rng.randint(0, t - p) if t > p else 0
            prompts.append(codes[start : start + p])
        prompts = np.stack(prompts, axis=0).astype(np.int64)
        return prompts, np.full((len(chosen),), p, np.int64)
