"""Frame-type lookahead: scene-cut detection.

The reference forwards x264's --scenecut / --min-keyint flags
(/root/reference/codec.c:851-855); x264 implements the decision in its
lookahead by comparing a P-frame's predicted inter cost against its intra
cost and cutting when inter prediction stops paying for itself.

This module reproduces that decision from the *input* frames only (no
dependency on reconstruction, so the device pipeline stays asynchronous).
Frames are mean-pooled 8x on host; two signals gate a cut:

  1. cost ratio  — best pooled SAD over a +-4 pool-pixel (+-32 full-res px)
     motion candidate set, against the mean spatial gradient (what intra
     prediction exploits): inter > (1 - 0.006*strength) * intra
  2. temporal spike — the inter cost jumps to >1.5x its running average
     (steady fast/noisy motion keeps a high but FLAT inter cost and must
     not cut on every frame).

Both conditions mirror x264's behaviour qualitatively: cuts between
distinct scenes fire on both; sustained fast pans and noise fail the spike
test; still/slow content fails the ratio test.
"""

from __future__ import annotations

import numpy as np

__all__ = ["SceneCut"]


def _pool8(y: np.ndarray) -> np.ndarray:
    h, w = y.shape
    h8, w8 = h - h % 8, w - w % 8
    return (y[:h8, :w8].astype(np.float32)
            .reshape(h8 // 8, 8, w8 // 8, 8).mean(axis=(1, 3)))


class SceneCut:
    """Stateful detector: feed display-order luma planes, get cut decisions."""

    RANGE = 4          # pool-px search radius (32 full-res px)
    SPIKE = 1.5        # inter cost must exceed this multiple of its average

    def __init__(self, strength: int = 40) -> None:
        self.bias = max(0, strength) * 0.006
        self.prev: np.ndarray | None = None
        self._ema: float | None = None

    def _inter_cost(self, cur: np.ndarray, prev: np.ndarray) -> float:
        best = np.inf
        R = self.RANGE
        for dy in range(-R, R + 1):
            for dx in range(-R, R + 1):
                a = cur[max(dy, 0):cur.shape[0] + min(dy, 0),
                        max(dx, 0):cur.shape[1] + min(dx, 0)]
                b = prev[max(-dy, 0):prev.shape[0] + min(-dy, 0),
                         max(-dx, 0):prev.shape[1] + min(-dx, 0)]
                if a.size:
                    best = min(best, float(np.abs(a - b).mean()))
        return best

    def is_cut(self, y: np.ndarray) -> bool:
        """True when this frame starts a new scene (inter prediction from
        the previous input frame is no cheaper than intra AND the inter
        cost spiked relative to the recent past)."""
        cur = _pool8(np.asarray(y))
        prev, self.prev = self.prev, cur
        if prev is None or self.bias <= 0:
            return False
        inter = self._inter_cost(cur, prev)
        gx = np.abs(np.diff(cur, axis=1)).mean() if cur.shape[1] > 1 else 0.0
        gy = np.abs(np.diff(cur, axis=0)).mean() if cur.shape[0] > 1 else 0.0
        intra = (gx + gy) / 2.0 + 1.0
        ratio_hit = inter > (1.0 - self.bias) * intra
        spike_hit = self._ema is None or inter > self.SPIKE * self._ema
        cut = ratio_hit and spike_hit
        if not cut:
            self._ema = inter if self._ema is None else (
                0.5 * self._ema + 0.5 * inter)
        return cut
