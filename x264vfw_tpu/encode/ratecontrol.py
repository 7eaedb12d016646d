"""Rate control — host-side loop over the device pipeline.

The reference exposes five modes through its GUI/flags (CQP, CRF/quality,
ABR/bitrate, 2-pass, /root/reference/codec.c:1490-1541); this module
implements them with x264's rate model (not QP aliases):

  qscale = 0.85 * 2^((qp - 12) / 6)             (qp <-> quantizer scale)
  complexity_t ~= bits_t * qscale_t             (measured after encoding)
  rceq_t = blurred_complexity^(1 - qcomp)       (the qscale "request")

* CRF: qscale_t = rceq_t / rate_factor with a CONSTANT rate factor chosen
  so a frame at nominal complexity lands on the crf QP — easy frames get
  lower QP, busy frames higher, bits track complexity^qcomp.
* ABR: same curve but rate_factor adapts: rate_factor = cplxr_sum /
  wanted_bits (cumulative), with x264's overflow compensation
  qscale *= clip(1 + (total - wanted)/abr_buffer, 0.5, 2).
* VBV: PRE-EMPTIVE per-frame clamp — a bits predictor (last same-type
  frame scaled by 2^(dqp/6)) raises QP until the virtual decoder buffer
  (fills at maxrate, drains by frame bits) stays above the underflow
  guard; the post-encode fill update remains as the feedback backstop.
* 2-pass: pass 1 logs per-frame complexity (checkpoint/resume artifact,
  SURVEY §5); pass 2 allocates bits per complexity^qcomp and CLOSES THE
  LOOP with the same cumulative overflow compensation as ABR.
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass

from ..config.params import (EncoderParams, RC_2PASS1, RC_2PASS2, RC_ABR,
                             RC_CQP, RC_CRF)


def qp2qscale(qp: float) -> float:
    return 0.85 * math.pow(2.0, (qp - 12.0) / 6.0)


def qscale2qp(qs: float) -> float:
    return 12.0 + 6.0 * math.log2(max(qs, 1e-6) / 0.85)


def _ratio_to_qp_offset(ratio: float) -> int:
    """x264 qscale ratio -> QP delta (6 QP per qscale doubling)."""
    return int(round(6.0 * math.log2(max(ratio, 1e-3))))


I_FRAME_QP_OFFSET = -3  # default ipratio(1.40) bias for intra frames
B_FRAME_QP_OFFSET = 2   # default pbratio(1.30) bias for non-ref B frames


@dataclass
class FrameStats:
    idx: int
    frame_type: str  # "I" / "P" / "B"
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
    """Per-frame QP policy + feedback (x264 rate model)."""

    def __init__(self, p: EncoderParams) -> None:
        self.p = p
        self.mode = p.rc_mode
        # --ipratio/--pbratio drive the frame-type QP offsets
        # (reference forwards these, codec.c:915-916)
        self.i_offset = -_ratio_to_qp_offset(getattr(p, "ipratio", 1.4))
        self.b_offset = _ratio_to_qp_offset(getattr(p, "pbratio", 1.3))
        self.qcomp = float(min(max(p.qcomp, 0.0), 1.0))
        self.frame_idx = 0
        self.bits_total = 0
        self.stats: list[FrameStats] = []
        self._stats_in: list[FrameStats] | None = None

        fps = max(1e-3, p.fps_num / max(1, p.fps_den))
        self.bits_per_frame = (p.bitrate * 1000.0 / fps) if p.bitrate else 0.0

        # short-term blurred complexity (x264's cplx_sum/cplx_count decay)
        self._cplx_sum = 0.0
        self._cplx_count = 0.0
        # per-type last (bits, qscale) for the VBV bits predictor
        self._last: dict[str, tuple[float, float]] = {}
        self._last_qs: float | None = None

        # initial QP guess from bits-per-pixel (both ABR seeding and the
        # nominal-complexity anchor of CRF)
        bpp = (p.bitrate * 1000.0 * p.fps_den
               / max(1, p.fps_num * p.width * p.height)) if p.bitrate else 0.1
        self._qp_guess = min(max(12.0, 38.0 - 6.0 * math.log2(max(bpp, 1e-3) / 0.06)), 51.0)

        # nominal complexity anchor: what a mid-detail frame of this area
        # costs at the anchor QP (bits ~ 0.06 bpp at qp 38 by the same
        # curve the guess uses); only RATIOS against it matter
        area = max(1, p.width * p.height)
        self._cplx_anchor = 0.06 * area * qp2qscale(26.0)

        if self.mode == RC_CRF:
            crf = float(min(max(p.crf, 0.0), 51.0))
            # constant rate factor: frame at nominal complexity -> crf QP
            self._rate_factor = (math.pow(self._cplx_anchor, 1.0 - self.qcomp)
                                 / qp2qscale(crf))
        elif self.mode == RC_ABR:
            # seed the adaptive rate factor as if one nominal frame had
            # already been coded at the guessed QP
            rceq0 = math.pow(self._cplx_anchor, 1.0 - self.qcomp)
            qs0 = qp2qscale(self._qp_guess)
            self._cplxr_sum = (self.bits_per_frame or 1.0) * qs0 / rceq0
            self._wanted = self.bits_per_frame or 1.0
            self._planned = 0.0      # cumulative target bits
            self.rate_tolerance = 1.0
        elif self.mode == RC_2PASS2:
            self._load_pass1()
        elif self.mode == RC_2PASS1:
            self._qp1 = int(round(p.crf)) if p.crf else p.qp

        # VBV (x264 --vbv-maxrate/--vbv-bufsize, codec.c:917-919)
        self.vbv_on = p.vbv_maxrate > 0 and p.vbv_bufsize > 0
        self._vbv_fill = float(p.vbv_bufsize * 1000)  # bits, start full
        self._vbv_in = (p.vbv_maxrate * 1000.0 / fps) if self.vbv_on else 0.0

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
        total_target = (self.p.bitrate * 1000.0 * len(self._stats_in)
                        * self.p.fps_den / max(1, self.p.fps_num))
        comps = [s.bits * qp2qscale(s.qp) for s in self._stats_in]
        weights = [math.pow(max(c, 1.0), self.qcomp) for c in comps]
        wsum = sum(weights)
        self._targets = [total_target * w / wsum for w in weights]
        self._comps = comps
        self._total_target = total_target

    # ----------------------------------------------------------- helpers
    def _blurred_cplx(self) -> float:
        if self._cplx_count <= 0:
            return self._cplx_anchor
        return self._cplx_sum / self._cplx_count

    def _vbv_clamp(self, qp: float, ftype: str) -> float:
        """Raise QP until the predicted frame fits the buffer model."""
        if not self.vbv_on:
            return qp
        last = self._last.get(ftype) or self._last.get("P") \
            or self._last.get("I")
        if last is None:
            return qp
        lb, lqs = last
        cap = float(self.p.vbv_bufsize * 1000)
        guard = 0.1 * cap
        for _ in range(24):
            pred = lb * lqs / qp2qscale(qp)
            if self._vbv_fill - pred + self._vbv_in >= guard or qp >= 51:
                break
            qp += 1
        # hard cap: never schedule more bits than the buffer holds
        for _ in range(24):
            pred = lb * lqs / qp2qscale(qp)
            if pred <= self._vbv_fill or qp >= 51:
                break
            qp += 1
        return qp

    # ------------------------------------------------------------- policy
    def qp_for_type(self, ftype: str) -> int:
        """QP for the next frame of the given type ('I'/'P'/'B')."""
        if self.mode == RC_CQP:
            qp = float(self.p.qp)
        elif self.mode == RC_2PASS1:
            qp = float(self._qp1)
        elif self.mode == RC_CRF:
            rceq = math.pow(self._blurred_cplx(), 1.0 - self.qcomp)
            qp = qscale2qp(rceq / self._rate_factor)
        elif self.mode == RC_ABR:
            rceq = math.pow(self._blurred_cplx(), 1.0 - self.qcomp)
            rate_factor = self._cplxr_sum / max(self._wanted, 1.0)
            qs = rceq * rate_factor
            # cumulative overflow compensation (x264 abr_buffer =
            # 2 * tolerance * bitrate, in bits)
            abr_buf = 2.0 * self.rate_tolerance * self.p.bitrate * 1000.0
            overflow = min(max(
                1.0 + (self.bits_total - self._planned) / max(abr_buf, 1.0),
                0.5), 2.0)
            qp = qscale2qp(qs * overflow)
        elif self.mode == RC_2PASS2:
            i = min(self.frame_idx, len(self._targets) - 1)
            comp = max(self._comps[i], 1.0)
            qs = comp / max(self._targets[i], 1.0)
            planned = sum(self._targets[:self.frame_idx]) or 1.0
            abr_buf = 0.5 * max(self._total_target, 1.0) \
                / max(len(self._targets), 1)
            overflow = min(max(
                1.0 + (self.bits_total - planned) / max(abr_buf * 8, 1.0),
                0.5), 2.0)
            qp = qscale2qp(qs * overflow)
        else:
            qp = float(self.p.qp)

        if ftype == "I":
            qp += self.i_offset
        elif ftype == "B":
            qp += self.b_offset
        # rate of change limiter (x264 qpstep) against the last frame
        if self._last_qs is not None and self.mode != RC_CQP:
            lq = qscale2qp(self._last_qs)
            step = max(1, self.p.qp_step)
            qp = min(max(qp, lq - step), lq + step)
        qp = self._vbv_clamp(qp, ftype)
        return int(min(max(round(qp), self.p.qp_min), min(self.p.qp_max, 51)))

    def qp_for_frame(self, is_idr: bool) -> int:
        return self.qp_for_type("I" if is_idr else "P")

    # ------------------------------------------------------------ feedback
    def update(self, ftype, qp_used: int, bits: int) -> None:
        if isinstance(ftype, bool):  # legacy is_idr signature
            ftype = "I" if ftype else "P"
        self.stats.append(FrameStats(self.frame_idx, ftype, qp_used, bits))
        self.bits_total += bits
        self.frame_idx += 1
        qs = qp2qscale(qp_used)
        # normalize I/B complexity onto the P scale so the blur is stable
        norm = {"I": 1.0 / 1.4, "B": 1.3, "P": 1.0}.get(ftype, 1.0)
        cplx = max(bits * qs * norm, 1.0)
        self._cplx_sum = self._cplx_sum * 0.5 + cplx
        self._cplx_count = self._cplx_count * 0.5 + 1.0
        self._last[ftype] = (float(bits), qs)
        self._last_qs = qs
        if self.mode == RC_ABR:
            rceq = math.pow(max(cplx, 1.0), 1.0 - self.qcomp)
            self._cplxr_sum = self._cplxr_sum * 0.98 + bits * qs / rceq
            self._wanted = self._wanted * 0.98 + self.bits_per_frame
            self._planned += self.bits_per_frame
        if self.vbv_on:
            cap = float(self.p.vbv_bufsize * 1000)
            self._vbv_fill = min(self._vbv_fill - bits + self._vbv_in, cap)
            if self._vbv_fill < 0:
                self._vbv_fill = 0.0

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
