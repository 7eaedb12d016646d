"""Reference (host/numpy) H.264 encoder — closed-loop, CQP, CAVLC.

This is the bit-exact behavioral model of the TPU encode pipeline: the
device implementation in `pipeline.py` must produce identical syntax
tensors and recon.  It also serves as the conformance calibration harness:
its output must decode identically in our native decoder AND stock FFmpeg
(tests/test_encoder_conformance.py), which validates every shared VLC
table entry in the encode direction.

Capability replaced: libx264's encode loop (analyse/encode per MB,
/root/reference/codec.c:1693 x264_encoder_encode).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..bitstream.cavlc import encode_residual_block
from ..bitstream.mb_syntax import CBP_TO_CODE, i16x16_mb_type
from ..bitstream.nal import NAL_PPS, NAL_SLICE, NAL_SLICE_IDR, NAL_SPS, wrap_nal
from ..bitstream.params import PPS, SPS, PROFILE_BASELINE
from ..bitstream.slice import SliceHeader
from ..bitstream.mb_syntax import SLICE_I, SLICE_P, P_L0_16X16
from ..ops import intra_np as ipred
from ..ops import transform_np as tnp
from ..ops.deblock_np import deblock_frame
from ..ops.mc_np import chroma_mc, luma_mc
from ..utils.bitstream import BitWriter
from ..decode.decoder import BLK_X, BLK_Y

__all__ = ["RefEncoder", "EncoderConfig"]


@dataclass
class EncoderConfig:
    width: int = 64
    height: int = 64
    qp: int = 26
    keyint: int = 25
    min_keyint: int = 1      # minimum IDR distance (scenecut floor)
    scenecut: int = 0        # scene-cut strength, 0 = off (x264 --scenecut)
    deblock: bool = False
    deblock_alpha: int = 0   # slice_alpha_c0_offset_div2
    deblock_beta: int = 0    # slice_beta_offset_div2
    num_ref_frames: int = 1
    search_range: int = 8
    subpel: int = 2          # 0 = integer-pel, 1 = half, 2 = quarter
    bframes: int = 0         # consecutive B frames between anchors
    cabac: bool = False      # CABAC entropy coding (Main profile)
    aq_strength: float = 0.0  # variance AQ (0 = off); applies to P frames
    trellis: bool = False    # RD-quant refinement (approximate trellis)
    weightp: int = 0         # explicit weighted prediction for P (0 = off)
    chroma_qp_offset: int = 0  # PPS chroma_qp_index_offset (x264 flag)
    i4x4: bool = False
    # High-profile 8x8 transform for P luma residuals (x264 --8x8dct,
    # codec.c:904); per-MB 4x4-vs-8x8 decision in the device pipeline
    dct8x8: bool = False
    # P-frame inter partitions 16x8/8x16/8x8 (x264 --partitions surface,
    # codec.c:887).  Effective on the device encoder when nref == 1 and
    # entropy is CAVLC (CABAC partition binarization lands separately).
    partitions: bool = False
    fps_num: int = 25
    fps_den: int = 1
    # VUI signaling (reference forwards these to x264's SPS writer,
    # codec.c:973-979 + the range/colmatrix fixup codec.c:1566-1577)
    sar_width: int = 0
    sar_height: int = 0
    fullrange: bool = False
    colorprim: int = 2       # colour_primaries code (2 = unspecified)
    transfer: int = 2        # transfer_characteristics code
    colmatrix: int = 2       # matrix_coefficients code
    vui_timing: bool = True  # write timing_info (fps) into the SPS VUI
    # NAL HRD signaling (x264 --nal-hrd, requires VBV; codec.c:917-919):
    # "none" | "vbr" | "cbr"; rates in kbit/s, kbit (x264 flag units)
    nal_hrd: str = "none"
    vbv_maxrate: int = 0
    vbv_bufsize: int = 0
    # motion-search SAD backend: "auto" (Pallas kernel on TPU, XLA scan
    # elsewhere), "pallas", "pallas_interpret" (--no-asm analogue on TPU),
    # or "xla"
    me_backend: str = "auto"


class RefEncoder:
    """Closed-loop CQP encoder: I16x16 (+ optional I4x4) intra, P16x16 inter."""

    def __init__(self, cfg: EncoderConfig) -> None:
        self.cfg = cfg
        assert cfg.width % 2 == 0 and cfg.height % 2 == 0
        self.mbw = (cfg.width + 15) // 16
        self.mbh = (cfg.height + 15) // 16
        self.sps = SPS(
            profile_idc=PROFILE_BASELINE,
            constraint_set0=1, constraint_set1=1,
            level_idc=30,
            log2_max_frame_num_minus4=4,
            pic_order_cnt_type=2,
            max_num_ref_frames=cfg.num_ref_frames,
            pic_width_in_mbs_minus1=self.mbw - 1,
            pic_height_in_map_units_minus1=self.mbh - 1,
        )
        if cfg.width % 16 or cfg.height % 16:
            self.sps.frame_cropping_flag = 1
            self.sps.frame_crop_right_offset = (self.mbw * 16 - cfg.width) // 2
            self.sps.frame_crop_bottom_offset = (self.mbh * 16 - cfg.height) // 2
        self.pps = PPS(
            entropy_coding_mode_flag=0,
            pic_init_qp_minus26=cfg.qp - 26,
            deblocking_filter_control_present_flag=1,
        )
        self.frame_idx = 0
        self.frame_num = 0
        self.idr_id = 0
        self.ref_frames: list[dict] = []  # most recent first: {y,u,v}

    # ------------------------------------------------------------------
    def headers(self) -> bytes:
        return (wrap_nal(3, NAL_SPS, self.sps.to_rbsp())
                + wrap_nal(3, NAL_PPS, self.pps.to_rbsp()))

    def encode_frame(self, y: np.ndarray, u: np.ndarray, v: np.ndarray) -> bytes:
        cfg = self.cfg
        is_idr = (self.frame_idx % cfg.keyint) == 0
        if is_idr:
            self.frame_num = 0
        out = b""
        if is_idr:
            out += self.headers()
        fe = _FrameEncoder(self, y, u, v, is_idr)
        out += fe.encode()
        # reference update (sliding window)
        self.ref_frames.insert(0, {"y": fe.ry, "u": fe.ru, "v": fe.rv})
        del self.ref_frames[max(1, cfg.num_ref_frames):]
        self.last_recon = (fe.ry, fe.ru, fe.rv)
        self.frame_idx += 1
        self.frame_num = (self.frame_num + 1) % (1 << (self.sps.log2_max_frame_num_minus4 + 4))
        if is_idr:
            self.idr_id = (self.idr_id + 1) % 65536
        return out


class _FrameEncoder:
    def __init__(self, top: RefEncoder, y, u, v, is_idr: bool) -> None:
        self.top = top
        self.cfg = top.cfg
        self.sps, self.pps = top.sps, top.pps
        self.mbw, self.mbh = top.mbw, top.mbh
        W, H = self.mbw * 16, self.mbh * 16
        # pad source to MB multiple with edge replication
        self.sy = _pad(y, H, W)
        self.su = _pad(u, H // 2, W // 2)
        self.sv = _pad(v, H // 2, W // 2)
        self.ry = np.zeros((H, W), dtype=np.int32)
        self.ru = np.zeros((H // 2, W // 2), dtype=np.int32)
        self.rv = np.zeros((H // 2, W // 2), dtype=np.int32)
        # aliases so deblock_frame's duck-type (y/u/v planes) works
        self.y, self.u, self.v = self.ry, self.ru, self.rv
        self.is_idr = is_idr
        self.qp = self.cfg.qp
        self.qpc = int(tnp.chroma_qp(self.qp, self.pps.chroma_qp_index_offset))
        self.tc_luma = np.zeros((self.mbh * 4, self.mbw * 4), dtype=np.int32)
        self.tc_chroma = np.zeros((2, self.mbh * 2, self.mbw * 2), dtype=np.int32)
        self.mb_type = np.full((self.mbh, self.mbw), -1, dtype=np.int32)
        self.qp_map = np.full((self.mbh, self.mbw), self.qp, dtype=np.int32)
        self.mv = np.zeros((self.mbh * 4, self.mbw * 4, 2), dtype=np.int32)
        self.ref = np.full((self.mbh * 4, self.mbw * 4), -1, dtype=np.int32)
        self.blk_done = np.zeros((self.mbh * 4, self.mbw * 4), dtype=bool)
        self.i4_modes = np.full((self.mbh * 4, self.mbw * 4), -1, dtype=np.int32)
        self.w = BitWriter()
        self.skip_run = 0
        self.h: SliceHeader | None = None

    # ------------------------------------------------------------- helpers
    def mb_avail(self, mx, my):
        return 0 <= mx < self.mbw and 0 <= my < self.mbh and self.mb_type[my, mx] >= 0

    def _nc_luma(self, bx, by):
        availA = bx > 0 and self.mb_type[by // 4, (bx - 1) // 4] >= 0
        availB = by > 0 and self.mb_type[(by - 1) // 4, bx // 4] >= 0
        if availA and availB:
            return (int(self.tc_luma[by, bx - 1]) + int(self.tc_luma[by - 1, bx]) + 1) >> 1
        if availA:
            return int(self.tc_luma[by, bx - 1])
        if availB:
            return int(self.tc_luma[by - 1, bx])
        return 0

    def _nc_chroma(self, c, bx, by):
        availA = bx > 0 and self.mb_type[by // 2, (bx - 1) // 2] >= 0
        availB = by > 0 and self.mb_type[(by - 1) // 2, bx // 2] >= 0
        if availA and availB:
            return (int(self.tc_chroma[c, by, bx - 1]) + int(self.tc_chroma[c, by - 1, bx]) + 1) >> 1
        if availA:
            return int(self.tc_chroma[c, by, bx - 1])
        if availB:
            return int(self.tc_chroma[c, by - 1, bx])
        return 0

    # --------------------------------------------------------------- main
    def encode(self) -> bytes:
        cfg = self.cfg
        nal_type = NAL_SLICE_IDR if self.is_idr else NAL_SLICE
        h = SliceHeader(
            slice_type=(SLICE_I if self.is_idr else SLICE_P) + 5,
            frame_num=self.top.frame_num,
            idr_pic_id=self.top.idr_id,
            slice_qp_delta=0,
            disable_deblocking_filter_idc=0 if cfg.deblock else 1,
        )
        self.h = h
        w = self.w
        h.write(w, self.sps, self.pps, nal_type, 3)

        for my in range(self.mbh):
            for mx in range(self.mbw):
                if self.is_idr:
                    self._encode_intra_mb(mx, my)
                else:
                    self._encode_p_mb(mx, my)
        if not self.is_idr:
            # trailing skip run
            if self.skip_run > 0:
                w.ue(self.skip_run)
                self.skip_run = 0
        w.rbsp_trailing_bits()

        if cfg.deblock:
            deblock_frame(self)
        return wrap_nal(3, nal_type, w.to_rbsp())

    # -------------------------------------------------------------- intra
    def _encode_intra_mb(self, mx, my, in_p_slice=False):
        qp = self.qp
        w = self.w
        x0, y0 = mx * 16, my * 16
        src = self.sy[y0:y0 + 16, x0:x0 + 16].astype(np.int32)

        top = self.ry[y0 - 1, x0:x0 + 16].copy() if self.mb_avail(mx, my - 1) else None
        left = self.ry[y0:y0 + 16, x0 - 1].copy() if self.mb_avail(mx - 1, my) else None
        tl = int(self.ry[y0 - 1, x0 - 1]) if self.mb_avail(mx - 1, my - 1) else None

        # mode decision by SAD over available modes
        cands = [ipred.I16_DC]
        if top is not None:
            cands.append(ipred.I16_V)
        if left is not None:
            cands.append(ipred.I16_H)
        if top is not None and left is not None and tl is not None:
            cands.append(ipred.I16_P)
        best, best_sad, best_pred = None, None, None
        for m in cands:
            p = ipred.pred16x16(m, top, left, tl)
            sad = int(np.abs(src - p).sum())
            if best_sad is None or sad < best_sad:
                best, best_sad, best_pred = m, sad, p
        pred = best_pred
        mode = best

        # transform
        resid = src - pred
        blocks = _mb_to_blocks(resid)  # (16,4,4) in block order
        coefs = tnp.fdct4x4(blocks)
        dc_raster = np.zeros((4, 4), dtype=np.int32)
        for blk in range(16):
            dc_raster[BLK_Y[blk], BLK_X[blk]] = coefs[blk, 0, 0]
        dc_levels = tnp.luma_dc_fwd_quant(dc_raster.reshape(1, 4, 4), qp)[0]
        ac = coefs.copy()
        ac_q = tnp.quant4x4(ac, qp, intra=True)
        ac_q[:, 0, 0] = 0
        ac_scan = tnp.zigzag_scan(ac_q)[:, 1:]  # (16,15)
        cbp_luma = 15 if np.any(ac_scan) else 0

        # chroma
        (cb_pred, cr_pred), cmode = self._choose_chroma_mode(mx, my)
        cdc_levels = []
        cac_scan = []
        for c, (plane_s, predc) in enumerate(((self.su, cb_pred), (self.sv, cr_pred))):
            cx0, cy0 = mx * 8, my * 8
            csrc = plane_s[cy0:cy0 + 8, cx0:cx0 + 8].astype(np.int32)
            cres = csrc - predc
            cblocks = _c8_to_blocks(cres)
            ccoef = tnp.fdct4x4(cblocks)
            cdc = np.array([[ccoef[0, 0, 0], ccoef[1, 0, 0]],
                            [ccoef[2, 0, 0], ccoef[3, 0, 0]]], dtype=np.int32)
            cdc_levels.append(tnp.chroma_dc_fwd_quant(cdc.reshape(1, 2, 2),
                                                      self.qpc, intra=True)[0])
            cq = tnp.quant4x4(ccoef, self.qpc, intra=True)
            cq[:, 0, 0] = 0
            cac_scan.append(tnp.zigzag_scan(cq)[:, 1:])
        has_cac = any(np.any(s) for s in cac_scan)
        has_cdc = any(np.any(d) for d in cdc_levels)
        cbp_chroma = 2 if has_cac else (1 if has_cdc else 0)

        # ---- write syntax ----
        if in_p_slice:
            if self.skip_run > 0 or True:
                w.ue(self.skip_run)
                self.skip_run = 0
        mbt = i16x16_mb_type(mode, cbp_chroma, cbp_luma != 0)
        w.ue(mbt + (5 if in_p_slice else 0))
        w.ue(cmode)
        w.se(0)  # mb_qp_delta
        self.mb_type[my, mx] = mbt  # mark decoded before nC reads? no: nC uses
        # neighbor blocks only, current-MB blocks handled via tc updates below.

        # luma DC
        nc = self._nc_luma(mx * 4, my * 4)
        dc_scan = tnp.zigzag_scan(dc_levels.reshape(1, 4, 4))[0]
        encode_residual_block(w, dc_scan, nc, 16)

        # luma AC
        if cbp_luma:
            for blk in range(16):
                gx, gy = mx * 4 + BLK_X[blk], my * 4 + BLK_Y[blk]
                nc = self._nc_luma(gx, gy)
                encode_residual_block(w, ac_scan[blk], nc, 15)
                self.tc_luma[gy, gx] = int(np.count_nonzero(ac_scan[blk]))
        else:
            self.tc_luma[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = 0

        self._write_chroma_residuals(mx, my, cbp_chroma, cdc_levels, cac_scan)

        # ---- reconstruct (decoder-exact) ----
        dc_rec = tnp.luma_dc_dequant(dc_levels.reshape(1, 4, 4), qp)[0]
        dq = tnp.dequant4x4(tnp.zigzag_unscan(
            np.concatenate([np.zeros((16, 1), np.int32), ac_scan], axis=1)), qp)
        for blk in range(16):
            dq[blk, 0, 0] = dc_rec[BLK_Y[blk], BLK_X[blk]]
        res = tnp.idct4x4_core(dq)
        rec = pred + _blocks_to_mb(res)
        self.ry[y0:y0 + 16, x0:x0 + 16] = np.clip(rec, 0, 255)
        self._recon_chroma(mx, my, (cb_pred, cr_pred), cdc_levels, cac_scan)

        gx, gy = mx * 4, my * 4
        self.mv[gy:gy + 4, gx:gx + 4] = 0
        self.ref[gy:gy + 4, gx:gx + 4] = -1
        self.blk_done[gy:gy + 4, gx:gx + 4] = True

    def _choose_chroma_mode(self, mx, my):
        cx0, cy0 = mx * 8, my * 8
        preds = {}
        cands = [ipred.IC_DC]
        availT = self.mb_avail(mx, my - 1)
        availL = self.mb_avail(mx - 1, my)
        availTL = self.mb_avail(mx - 1, my - 1)
        if availT:
            cands.append(ipred.IC_V)
        if availL:
            cands.append(ipred.IC_H)
        if availT and availL and availTL:
            cands.append(ipred.IC_P)
        best, best_sad = None, None
        for m in cands:
            tot = 0
            pair = []
            for plane_r, plane_s in ((self.ru, self.su), (self.rv, self.sv)):
                top = plane_r[cy0 - 1, cx0:cx0 + 8].copy() if availT else None
                left = plane_r[cy0:cy0 + 8, cx0 - 1].copy() if availL else None
                tl = int(plane_r[cy0 - 1, cx0 - 1]) if availTL else None
                p = ipred.pred_chroma8x8(m, top, left, tl)
                pair.append(p)
                tot += int(np.abs(plane_s[cy0:cy0 + 8, cx0:cx0 + 8].astype(np.int32) - p).sum())
            preds[m] = pair
            if best_sad is None or tot < best_sad:
                best, best_sad = m, tot
        return preds[best], best

    def _write_chroma_residuals(self, mx, my, cbp_chroma, cdc_levels, cac_scan):
        w = self.w
        if cbp_chroma:
            for c in range(2):
                encode_residual_block(w, cdc_levels[c].reshape(4), -1, 4)
        if cbp_chroma == 2:
            for c in range(2):
                for sb in range(4):
                    sbx, sby = sb & 1, sb >> 1
                    gx, gy = mx * 2 + sbx, my * 2 + sby
                    nc = self._nc_chroma(c, gx, gy)
                    encode_residual_block(w, cac_scan[c][sb], nc, 15)
                    self.tc_chroma[c, gy, gx] = int(np.count_nonzero(cac_scan[c][sb]))
        else:
            for c in range(2):
                self.tc_chroma[c, my * 2:my * 2 + 2, mx * 2:mx * 2 + 2] = 0

    def _recon_chroma(self, mx, my, preds, cdc_levels, cac_scan):
        cx0, cy0 = mx * 8, my * 8
        for c, plane in ((0, self.ru), (1, self.rv)):
            dc_rec = tnp.chroma_dc_dequant(cdc_levels[c].reshape(1, 2, 2), self.qpc)[0]
            dq = tnp.dequant4x4(tnp.zigzag_unscan(
                np.concatenate([np.zeros((4, 1), np.int32), cac_scan[c]], axis=1)),
                self.qpc)
            for sb in range(4):
                dq[sb, 0, 0] = dc_rec[sb >> 1, sb & 1]
            res = tnp.idct4x4_core(dq)
            rec = np.zeros((8, 8), dtype=np.int32)
            for sb in range(4):
                sbx, sby = sb & 1, sb >> 1
                rec[sby * 4:sby * 4 + 4, sbx * 4:sbx * 4 + 4] = (
                    preds[c][sby * 4:sby * 4 + 4, sbx * 4:sbx * 4 + 4] + res[sb])
            plane[cy0:cy0 + 8, cx0:cx0 + 8] = np.clip(rec, 0, 255)

    # -------------------------------------------------------------- inter
    def _mv_pred(self, mx, my, ref_idx):
        """16x16 median MV predictor (mirror of decoder logic)."""
        gx, gy = mx * 4, my * 4

        def nb(bx, by):
            if bx < 0 or by < 0 or bx >= self.mbw * 4 or by >= self.mbh * 4:
                return False, np.zeros(2, np.int32), -1
            if not self.blk_done[by, bx]:
                return False, np.zeros(2, np.int32), -1
            return True, self.mv[by, bx], int(self.ref[by, bx])

        availA, mvA, refA = nb(gx - 1, gy)
        availB, mvB, refB = nb(gx, gy - 1)
        availC, mvC, refC = nb(gx + 4, gy - 1)
        if not availC:
            availC, mvC, refC = nb(gx - 1, gy - 1)
        if availA and not availB and not availC:
            return mvA.copy()
        match = [(availA and refA == ref_idx), (availB and refB == ref_idx),
                 (availC and refC == ref_idx)]
        if sum(match) == 1:
            return [mvA, mvB, mvC][match.index(True)].copy()
        mvs = np.stack([mvA if availA else np.zeros(2, np.int32),
                        mvB if availB else np.zeros(2, np.int32),
                        mvC if availC else np.zeros(2, np.int32)])
        return np.median(mvs, axis=0).astype(np.int32)

    def _skip_mv(self, mx, my):
        gx, gy = mx * 4, my * 4

        def nb(bx, by):
            if bx < 0 or by < 0:
                return False, np.zeros(2, np.int32), -1
            if not self.blk_done[by, bx]:
                return False, np.zeros(2, np.int32), -1
            return True, self.mv[by, bx], int(self.ref[by, bx])

        availA, mvA, refA = nb(gx - 1, gy)
        availB, mvB, refB = nb(gx, gy - 1)
        if (not availA or not availB or
                (refA == 0 and mvA[0] == 0 and mvA[1] == 0) or
                (refB == 0 and mvB[0] == 0 and mvB[1] == 0)):
            return np.zeros(2, np.int32)
        return self._mv_pred(mx, my, 0)

    def _motion_search(self, mx, my):
        """Integer full search + optional subpel refine, single ref."""
        cfg = self.cfg
        ref = self.top.ref_frames[0]
        x0, y0 = mx * 16, my * 16
        src = self.sy[y0:y0 + 16, x0:x0 + 16].astype(np.int32)
        R = cfg.search_range
        H, W = self.ry.shape
        best = (1 << 60, 0, 0)
        for dy in range(-R, R + 1):
            for dx in range(-R, R + 1):
                xx, yy = x0 + dx, y0 + dy
                if xx < -16 or yy < -16 or xx > W or yy > H:
                    continue
                cand = luma_mc(ref["y"], x0, y0, dx * 4, dy * 4, 16, 16)
                sad = int(np.abs(src - cand).sum())
                if sad < best[0]:
                    best = (sad, dx * 4, dy * 4)
        _, mvx, mvy = best
        if cfg.subpel:
            best = (best[0], mvx, mvy)
            for _ in range(2):
                improved = False
                for ddx in (-1, 0, 1):
                    for ddy in (-1, 0, 1):
                        if ddx == 0 and ddy == 0:
                            continue
                        tx, ty = best[1] + ddx, best[2] + ddy
                        cand = luma_mc(ref["y"], x0, y0, tx, ty, 16, 16)
                        sad = int(np.abs(src - cand).sum())
                        if sad < best[0]:
                            best = (sad, tx, ty)
                            improved = True
                if not improved:
                    break
            mvx, mvy = best[1], best[2]
        return np.array([mvx, mvy], dtype=np.int32)

    def _encode_p_mb(self, mx, my):
        qp = self.qp
        w = self.w
        x0, y0 = mx * 16, my * 16
        src = self.sy[y0:y0 + 16, x0:x0 + 16].astype(np.int32)
        ref = self.top.ref_frames[0]

        mv = self._motion_search(mx, my)
        pred = luma_mc(ref["y"], x0, y0, int(mv[0]), int(mv[1]), 16, 16)
        cx0, cy0 = mx * 8, my * 8
        cb_pred = chroma_mc(ref["u"], cx0, cy0, int(mv[0]), int(mv[1]), 8, 8)
        cr_pred = chroma_mc(ref["v"], cx0, cy0, int(mv[0]), int(mv[1]), 8, 8)

        # residual coding
        resid = src - pred
        blocks = _mb_to_blocks(resid)
        q = tnp.quant4x4(tnp.fdct4x4(blocks), qp, intra=False)
        scan = tnp.zigzag_scan(q)  # (16,16)
        cbp_luma = 0
        for q8 in range(4):
            if np.any(scan[q8 * 4:(q8 + 1) * 4]):
                cbp_luma |= 1 << q8

        cdc_levels, cac_scan = [], []
        for plane_s, predc in ((self.su, cb_pred), (self.sv, cr_pred)):
            csrc = plane_s[cy0:cy0 + 8, cx0:cx0 + 8].astype(np.int32)
            cblocks = _c8_to_blocks(csrc - predc)
            ccoef = tnp.fdct4x4(cblocks)
            cdc = np.array([[ccoef[0, 0, 0], ccoef[1, 0, 0]],
                            [ccoef[2, 0, 0], ccoef[3, 0, 0]]], dtype=np.int32)
            cdc_levels.append(tnp.chroma_dc_fwd_quant(cdc.reshape(1, 2, 2),
                                                      self.qpc, intra=False)[0])
            cq = tnp.quant4x4(ccoef, self.qpc, intra=False)
            cq[:, 0, 0] = 0
            cac_scan.append(tnp.zigzag_scan(cq)[:, 1:])
        has_cac = any(np.any(s) for s in cac_scan)
        has_cdc = any(np.any(d) for d in cdc_levels)
        cbp_chroma = 2 if has_cac else (1 if has_cdc else 0)
        cbp = cbp_luma | (cbp_chroma << 4)

        # skip decision
        pmv_skip = self._skip_mv(mx, my)
        gx, gy = mx * 4, my * 4
        if cbp == 0 and np.array_equal(mv, pmv_skip):
            self.skip_run += 1
            self.mb_type[my, mx] = 1000
            self.mv[gy:gy + 4, gx:gx + 4] = mv
            self.ref[gy:gy + 4, gx:gx + 4] = 0
            self.blk_done[gy:gy + 4, gx:gx + 4] = True
            self.tc_luma[gy:gy + 4, gx:gx + 4] = 0
            self.tc_chroma[:, my * 2:my * 2 + 2, mx * 2:mx * 2 + 2] = 0
            # recon = prediction
            self.ry[y0:y0 + 16, x0:x0 + 16] = pred
            self.ru[cy0:cy0 + 8, cx0:cx0 + 8] = cb_pred
            self.rv[cy0:cy0 + 8, cx0:cx0 + 8] = cr_pred
            return

        # write: skip_run, mb_type P_L0_16x16, mvd, cbp, residual
        w.ue(self.skip_run)
        self.skip_run = 0
        w.ue(P_L0_16X16)
        pmv = self._mv_pred(mx, my, 0)
        mvd = mv - pmv
        w.se(int(mvd[0]))
        w.se(int(mvd[1]))
        self.mb_type[my, mx] = 100 + P_L0_16X16
        self.mv[gy:gy + 4, gx:gx + 4] = mv
        self.ref[gy:gy + 4, gx:gx + 4] = 0
        self.blk_done[gy:gy + 4, gx:gx + 4] = True

        w.ue(int(CBP_TO_CODE[0, cbp]))
        if cbp:
            w.se(0)  # mb_qp_delta

        # luma residual
        if cbp_luma:
            for blk in range(16):
                bgx, bgy = mx * 4 + BLK_X[blk], my * 4 + BLK_Y[blk]
                if cbp_luma & (1 << (blk // 4)):
                    nc = self._nc_luma(bgx, bgy)
                    encode_residual_block(w, scan[blk], nc, 16)
                    self.tc_luma[bgy, bgx] = int(np.count_nonzero(scan[blk]))
                else:
                    self.tc_luma[bgy, bgx] = 0
        else:
            self.tc_luma[gy:gy + 4, gx:gx + 4] = 0
        self._write_chroma_residuals(mx, my, cbp_chroma, cdc_levels, cac_scan)

        # recon
        dscan = scan.copy()
        if cbp_luma:
            keep = np.repeat([(cbp_luma >> q8) & 1 for q8 in range(4)], 4).astype(bool)
            dscan[~keep] = 0
        else:
            dscan[:] = 0
        dq = tnp.dequant4x4(tnp.zigzag_unscan(dscan), qp)
        res = tnp.idct4x4_core(dq)
        self.ry[y0:y0 + 16, x0:x0 + 16] = np.clip(pred + _blocks_to_mb(res), 0, 255)
        if cbp_chroma == 0:
            cdc_levels = [np.zeros((2, 2), np.int32)] * 2
            cac_scan = [np.zeros((4, 15), np.int32)] * 2
        elif cbp_chroma == 1:
            cac_scan = [np.zeros((4, 15), np.int32)] * 2
        self._recon_chroma(mx, my, (cb_pred, cr_pred), cdc_levels, cac_scan)


def _pad(a: np.ndarray, H: int, W: int) -> np.ndarray:
    a = np.asarray(a)
    return np.pad(a, ((0, H - a.shape[0]), (0, W - a.shape[1])), mode="edge")


def _mb_to_blocks(mb: np.ndarray) -> np.ndarray:
    """(16,16) -> (16,4,4) in block coding order."""
    out = np.zeros((16, 4, 4), dtype=mb.dtype)
    for blk in range(16):
        bx, by = BLK_X[blk], BLK_Y[blk]
        out[blk] = mb[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4]
    return out


def _blocks_to_mb(blocks: np.ndarray) -> np.ndarray:
    out = np.zeros((16, 16), dtype=blocks.dtype)
    for blk in range(16):
        bx, by = BLK_X[blk], BLK_Y[blk]
        out[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] = blocks[blk]
    return out


def _c8_to_blocks(c8: np.ndarray) -> np.ndarray:
    out = np.zeros((4, 4, 4), dtype=c8.dtype)
    for sb in range(4):
        sbx, sby = sb & 1, sb >> 1
        out[sb] = c8[sby * 4:sby * 4 + 4, sbx * 4:sbx * 4 + 4]
    return out
