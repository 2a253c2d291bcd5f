"""Metrics accumulation with EMA window.

Parity: icefall MetricsTracker as used at ref trainer.py:667-669 —
``tot = tot * (1 - 1/reset_interval) + new * (1/reset_interval)`` summed
dict, normalized by frames for display; multi-host reduction via psum is
unnecessary here because the jitted step already returns globally-summed
metrics under GSPMD.
"""

from __future__ import annotations

from typing import Dict


class MetricsTracker:
    def __init__(self, reset_interval: int = 200):
        self.reset_interval = reset_interval
        self.tot: Dict[str, float] = {}

    def update(self, metrics: Dict[str, float]) -> None:
        a = 1.0 - 1.0 / self.reset_interval
        b = 1.0 / self.reset_interval
        for k, v in metrics.items():
            self.tot[k] = self.tot.get(k, 0.0) * a + float(v) * b

    def normalized(self) -> Dict[str, float]:
        frames = max(self.tot.get("frames", 0.0), 1e-9)
        out = {}
        for k, v in self.tot.items():
            if k in ("frames", "lr"):
                out[k] = v
            else:
                out[k] = v / frames
        return out

    def summary(self) -> str:
        n = self.normalized()
        parts = [f"{k}={v:.4f}" for k, v in sorted(n.items()) if k != "frames"]
        return " ".join(parts)
