"""Feature-space augmentation for the fbank (Transformer baseline) path.

Parity: lhotse's ``SpecAugment`` as configured by the reference datamodule
(ref /root/reference/valle/data/datamodule.py:251-274): time warp factor 80,
10 time masks of up to 100 frames, 2 frequency masks of up to 27 bins.
Runs host-side in numpy on the batch the loader assembled (the reference's
``input_transforms`` hook, ref dataset.py:87-89), so XLA sees only the final
arrays.  ``CutConcatenate`` (ref datamodule.py:236-247) is intentionally
absent: it packs short cuts into one sequence to reduce padding waste, a
role our quantized-bucket static shapes already fill.
"""

from __future__ import annotations

import numpy as np


class SpecAugment:
    """Time warp + frequency masks + time masks over (T, F) log-mel features.

    Masked regions are filled with the mean of the (valid part of the)
    utterance, matching lhotse's default mask value.
    """

    def __init__(
        self,
        time_warp_factor: int = 80,
        num_feature_masks: int = 2,
        features_mask_size: int = 27,
        num_frame_masks: int = 10,
        frames_mask_size: int = 100,
        max_frames_mask_fraction: float = 0.15,
        p: float = 0.9,
        seed: int = 0,
    ):
        self.time_warp_factor = time_warp_factor
        self.num_feature_masks = num_feature_masks
        self.features_mask_size = features_mask_size
        self.num_frame_masks = num_frame_masks
        self.frames_mask_size = frames_mask_size
        self.max_frames_mask_fraction = max_frames_mask_fraction
        # lhotse applies the masking to each cut with probability p (leaving
        # ~1-p of utterances clean); warp applies unconditionally
        self.p = p
        self.rng = np.random.RandomState(seed)

    def _time_warp(self, feats: np.ndarray) -> np.ndarray:
        """Lhotse-style warp: pick a pivot frame in the middle region and a
        shift w in [-W, W]; linearly resample the two segments."""
        w = self.time_warp_factor
        t = feats.shape[0]
        if w is None or w <= 0 or t <= 2 * w + 2:
            return feats
        center = self.rng.randint(w + 1, t - w)
        shift = self.rng.randint(-w, w + 1)
        if shift == 0:
            return feats
        pivot = center + shift

        def resample(seg: np.ndarray, new_len: int) -> np.ndarray:
            if seg.shape[0] == new_len:
                return seg
            src = np.linspace(0.0, seg.shape[0] - 1.0, new_len)
            lo = np.floor(src).astype(np.int64)
            hi = np.minimum(lo + 1, seg.shape[0] - 1)
            frac = (src - lo)[:, None].astype(seg.dtype)
            return seg[lo] * (1 - frac) + seg[hi] * frac

        left = resample(feats[:center], pivot)
        right = resample(feats[center:], t - pivot)
        return np.concatenate([left, right], axis=0)

    def _one(self, feats: np.ndarray, t_valid: int) -> np.ndarray:
        out = feats.copy()
        region = out[:t_valid]
        if t_valid > 0:
            region = self._time_warp(region)
            if self.rng.rand() < self.p:
                mean = float(region.mean())
                f = region.shape[1]
                for _ in range(self.num_feature_masks):
                    width = self.rng.randint(0, self.features_mask_size + 1)
                    if width and width < f:
                        start = self.rng.randint(0, f - width + 1)
                        region[:, start : start + width] = mean
                # per-mask width capped at (total budget) / (num masks), the
                # lhotse behavior — one mask cannot eat the whole budget
                max_total = int(self.max_frames_mask_fraction * t_valid)
                per_mask = min(
                    self.frames_mask_size,
                    max(max_total // max(self.num_frame_masks, 1), 1),
                )
                for _ in range(self.num_frame_masks):
                    width = self.rng.randint(0, per_mask + 1)
                    width = min(width, t_valid)
                    if width:
                        start = self.rng.randint(0, t_valid - width + 1)
                        region[start : start + width] = mean
            out[:t_valid] = region
        return out

    def __call__(
        self, feats: np.ndarray, lens: np.ndarray
    ) -> np.ndarray:
        """feats (B, T, F) float; lens (B,) valid frames per row."""
        return np.stack(
            [self._one(feats[i], int(lens[i])) for i in range(feats.shape[0])]
        )
