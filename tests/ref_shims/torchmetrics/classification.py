"""Minimal torchmetrics shims (micro top-k accuracy with ignore_index)."""
import torch


class MulticlassAccuracy(torch.nn.Module):
    def __init__(self, num_classes, top_k=1, average="micro",
                 multidim_average="global", ignore_index=None):
        super().__init__()
        self.top_k = top_k
        self.ignore_index = ignore_index

    def forward(self, preds, target):
        # preds: (B, C, ...) logits; target: (B, ...)
        if preds.ndim == target.ndim + 1 and preds.shape[1] != target.shape[-1]:
            pass
        topk = preds.topk(self.top_k, dim=1).indices  # (B, k, ...)
        hit = (topk == target.unsqueeze(1)).any(dim=1)
        if self.ignore_index is not None:
            valid = target != self.ignore_index
        else:
            valid = torch.ones_like(target, dtype=torch.bool)
        n = valid.sum().clamp(min=1)
        return (hit & valid).sum().float() / n.float()


class BinaryAccuracy(torch.nn.Module):
    def __init__(self, threshold=0.5, multidim_average="global", ignore_index=None):
        super().__init__()
        self.threshold = threshold

    def forward(self, preds, target):
        pred = (preds > self.threshold).to(target.dtype)
        return (pred == target).float().mean()
