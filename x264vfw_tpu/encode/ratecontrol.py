"""Rate control — host-side loop over the device pipeline.

The reference exposes five modes through its GUI/flags (CQP, CRF/quality,
ABR/bitrate, 2-pass, /root/reference/codec.c:1490-1541); this module
implements them as a per-frame QP decision fed to the TPU encoder (QP is a
traced scalar, so per-frame changes don't recompile).

The 2-pass stats file is the framework's checkpoint/resume artifact
(SURVEY.md §5): pass 1 writes per-frame complexity records, pass 2 reads
them and allocates bits; it doubles as GOP-boundary restart state.
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass

from ..config.params import (EncoderParams, RC_2PASS1, RC_2PASS2, RC_ABR,
                             RC_CQP, RC_CRF)

I_FRAME_QP_OFFSET = -3  # default ipratio(1.40) bias for intra frames
B_FRAME_QP_OFFSET = 2   # default pbratio(1.30) bias for non-ref B frames


def _ratio_to_qp_offset(ratio: float) -> int:
    """x264 qscale ratio -> QP delta (6 QP per qscale doubling)."""
    return int(round(6.0 * math.log2(max(ratio, 1e-3))))


@dataclass
class FrameStats:
    idx: int
    frame_type: str  # "I" / "P"
    qp: int
    bits: int

    def to_json(self) -> str:
        return json.dumps({"idx": self.idx, "type": self.frame_type,
                           "qp": self.qp, "bits": self.bits})

    @classmethod
    def from_json(cls, line: str) -> "FrameStats":
        d = json.loads(line)
        return cls(d["idx"], d["type"], d["qp"], d["bits"])


class RateController:
    """Per-frame QP policy + feedback."""

    def __init__(self, p: EncoderParams) -> None:
        self.p = p
        self.mode = p.rc_mode
        # --ipratio/--pbratio drive the frame-type QP offsets
        # (reference forwards these, codec.c:915-916)
        self.i_offset = -_ratio_to_qp_offset(getattr(p, "ipratio", 1.4))
        self.b_offset = _ratio_to_qp_offset(getattr(p, "pbratio", 1.3))
        self.frame_idx = 0
        self.bits_total = 0
        self.stats: list[FrameStats] = []
        self._qp = p.qp
        self._stats_in: list[FrameStats] | None = None
        self._ratefactor = None

        # VBV state (frame-granular model of x264's VBV, driven by the
        # reference's --vbv-maxrate/--vbv-bufsize flags, codec.c:917-919):
        # the virtual decoder buffer fills at maxrate and drains by each
        # frame's bits; QP is biased to keep the fill away from underflow.
        self.vbv_on = p.vbv_maxrate > 0 and p.vbv_bufsize > 0
        self._vbv_fill = float(p.vbv_bufsize * 1000)  # bits, start full
        self._vbv_adj = 0

        if self.mode == RC_CRF:
            self._qp = int(round(min(max(p.crf, 0.0), 51.0)))
        elif self.mode == RC_ABR:
            # start from an estimate: bpp -> qp heuristic
            bpp = (p.bitrate * 1000.0 * p.fps_den
                   / max(1, p.fps_num * p.width * p.height)) if p.bitrate else 0.1
            self._qp = int(min(max(12.0, 38.0 - 6.0 * math.log2(max(bpp, 1e-3) / 0.06)), 51))
        elif self.mode == RC_2PASS2:
            self._load_pass1()
        elif self.mode == RC_2PASS1:
            # fast first pass: constant quality probe
            self._qp = int(round(p.crf)) if p.crf else p.qp

    # ------------------------------------------------------------- pass 2
    def _load_pass1(self) -> None:
        path = self.p.stats_file
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"2-pass stats file '{path}' not found (run pass 1 first)")
        with open(path) as f:
            self._stats_in = [FrameStats.from_json(ln) for ln in f
                              if ln.strip()]
        if not self._stats_in:
            raise ValueError("empty stats file")
        # complexity ~ bits at pass-1 qp, normalized; allocate bits per
        # frame proportional to complexity**qcomp, then map to qp deltas
        total_target = (self.p.bitrate * 1000.0 * len(self._stats_in)
                        * self.p.fps_den / max(1, self.p.fps_num))
        comps = [s.bits * math.pow(2.0, (s.qp - 26) / 6.0) for s in self._stats_in]
        weights = [math.pow(max(c, 1.0), self.p.qcomp) for c in comps]
        wsum = sum(weights)
        self._targets = [total_target * w / wsum for w in weights]
        self._comps = comps

    # ------------------------------------------------------------- policy
    def qp_for_frame(self, is_idr: bool) -> int:
        if self.mode == RC_CQP:
            qp = self.p.qp
        elif self.mode in (RC_CRF, RC_2PASS1):
            qp = self._qp
        elif self.mode == RC_ABR:
            qp = self._qp
        elif self.mode == RC_2PASS2:
            i = min(self.frame_idx, len(self._targets) - 1)
            # qp that would hit the target given measured complexity
            comp = max(self._comps[i], 1.0)
            ratio = comp / max(self._targets[i], 1.0)
            qp = int(round(26 + 6.0 * math.log2(max(ratio, 1e-3))))
        else:
            qp = self.p.qp
        if is_idr:
            qp += self.i_offset
        qp += self._vbv_adj
        return int(min(max(qp, self.p.qp_min), min(self.p.qp_max, 51)))

    def qp_for_type(self, ftype: str) -> int:
        """Per-frame-type QP (x264 CQP semantics: I = qp+ipoffset,
        B = qp+pboffset; mirrored from the reference's ipratio/pbratio
        flags, codec.c:915-916)."""
        qp = self.qp_for_frame(False)
        if ftype == "I":
            qp += self.i_offset
        elif ftype == "B":
            qp += self.b_offset
        return int(min(max(qp, self.p.qp_min), min(self.p.qp_max, 51)))

    def update(self, ftype, qp_used: int, bits: int) -> None:
        if isinstance(ftype, bool):  # legacy is_idr signature
            ftype = "I" if ftype else "P"
        self.stats.append(FrameStats(self.frame_idx, ftype, qp_used, bits))
        self.bits_total += bits
        self.frame_idx += 1
        if self.vbv_on:
            p = self.p
            per_frame_in = p.vbv_maxrate * 1000.0 * p.fps_den / max(1, p.fps_num)
            cap = float(p.vbv_bufsize * 1000)
            self._vbv_fill = min(self._vbv_fill - bits + per_frame_in, cap)
            frac = self._vbv_fill / cap
            # bias QP up as the buffer drains; recover slowly when refilled
            if frac < 0.15:
                self._vbv_adj = min(self._vbv_adj + 2, 12)
            elif frac < 0.35:
                self._vbv_adj = min(self._vbv_adj + 1, 12)
            elif frac > 0.8 and self._vbv_adj > 0:
                self._vbv_adj -= 1
            if self._vbv_fill < 0:
                self._vbv_fill = 0.0
        if self.mode == RC_ABR and self.p.bitrate:
            # proportional feedback on accumulated rate error
            target_per_frame = (self.p.bitrate * 1000.0 * self.p.fps_den
                                / max(1, self.p.fps_num))
            planned = target_per_frame * self.frame_idx
            err = (self.bits_total - planned) / max(planned, 1.0)
            step = self.p.qp_step
            adj = min(max(int(round(err * 12.0)), -step), step)
            self._qp = int(min(max(self._qp + adj, self.p.qp_min),
                               min(self.p.qp_max, 51)))

    # ---------------------------------------------------------- stats i/o
    def write_stats(self) -> None:
        """Pass-1 checkpoint write (atomic, .temp like the reference's
        MAX_STATS_SIZE reservation, x264vfw.h:79)."""
        if self.mode != RC_2PASS1:
            return
        tmp = self.p.stats_file + ".temp"
        with open(tmp, "w") as f:
            for s in self.stats:
                f.write(s.to_json() + "\n")
        os.replace(tmp, self.p.stats_file)
