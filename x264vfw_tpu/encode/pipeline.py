"""Batched session pipeline — the ONE hot path behind CompressSession.

The reference funnels every feature through a single per-frame hot call
(x264_encoder_encode, /root/reference/codec.c:1693).  The TPU-native
equivalent of "one hot path" is a *windowed batch*: the session buffers a
window of display-order frames, then drives the batched device programs
(device_finalize.encode_pgop_packed / encode_bgop_slots) that amortize
host<->device latency over the window, with:

  * rate control per frame (QP arrays into the batched scan),
  * scene-cut IDR promotion and keyint/min-keyint rules (host lookahead),
  * MB-tree per-MB QP offsets (qp_offs arrays),
  * B mini-GOPs (anchors batched with per-anchor recon/mv stacks, then
    every B of the window in one batched program),
  * explicit weightp (host analysis per frame; the rare weighted frame is
    encoded via the per-frame path, everything else stays batched),
  * CABAC via the native CAVLC->CABAC entropy transcode, parallelized
    over the window's AUs with a thread pool (the C passes release the
    GIL).

Output AUs are returned in decode order as (annexb, display_idx, is_idr),
the same contract as TpuEncoder.push_frame.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import jax.numpy as jnp
import numpy as np

from ..bitstream.mb_syntax import SLICE_B, SLICE_I, SLICE_P
from ..bitstream.nal import NAL_SLICE, NAL_SLICE_IDR, wrap_nal
from ..ops import transform_np as tnp
from . import device_finalize as F
from .tpu_encoder import TpuEncoder, _pad


class BatchPipeline:
    def __init__(self, enc: TpuEncoder, rc, mbtree=None, window: int = 12):
        self.enc = enc
        self.rc = rc
        self.mbtree = mbtree
        self.window = max(2, window)
        self.q: list = []          # ready (y, u, v, qp_off, display_idx)
        self._pool = ThreadPoolExecutor(max_workers=4)
        self._disp = 0
        self._pending_b: list = []

    # ------------------------------------------------------------- input
    def push(self, y, u, v) -> list:
        d = self._disp
        self._disp += 1
        ready = []
        if self.mbtree is not None:
            for ((fy, fu, fv), off) in self.mbtree.push((y, u, v), y):
                ready.append((fy, fu, fv, off))
        else:
            ready.append((y, u, v, None))
        for item in ready:
            self.q.append(item)
        if len(self.q) >= self.window:
            return self._run(final=False)
        return []

    def flush(self) -> list:
        if self.mbtree is not None:
            for ((fy, fu, fv), off) in self.mbtree.flush():
                self.q.append((fy, fu, fv, off))
        return self._run(final=True)

    # -------------------------------------------------------------- core
    def _run(self, final: bool) -> list:
        enc = self.enc
        cfg = enc.cfg
        out: list = []
        frames = self.q
        self.q = []
        if not frames:
            return out

        # host lookahead over the window: IDR decisions + weightp analysis
        plan = []  # (y, u, v, off, is_idr, wp)
        for (y, u, v, off) in frames:
            d = enc.display_idx
            enc.display_idx += 1
            cut = (enc._scenecut.is_cut(y)
                   if enc._scenecut is not None else False)
            since = (d - enc._last_idr_d
                     if enc._last_idr_d is not None else None)
            is_idr = (since is None or since >= cfg.keyint
                      or (cut and since >= max(cfg.min_keyint, 1)))
            if is_idr:
                enc._last_idr_d = d
            wp = enc._weight_analysis(y) if cfg.weightp > 0 else None
            plan.append((y, u, v, off, d, is_idr, wp))

        # split into segments at IDRs; encode each
        i = 0
        while i < len(plan):
            y, u, v, off, d, is_idr, wp = plan[i]
            if is_idr:
                out += self._drain_pending(final=False)
                enc.poc_base = d
                enc.poc = 0
                qp_i = self.rc.qp_for_type("I")
                au = enc.encode_frame(y, u, v, qp=qp_i, force_idr=True)
                self._feedback("I", qp_i, au)
                out.append((au, d, True, "I", qp_i))
                i += 1
                continue
            # collect the run of non-IDR frames
            j = i
            while j < len(plan) and not plan[j][5]:
                j += 1
            out += self._encode_run(plan[i:j], final and j == len(plan))
            i = j
        if final:
            out += self._drain_pending(final=True)
        return out

    def _feedback(self, ftype: str, qp: int, au: bytes) -> None:
        self.rc.update(ftype, qp, len(au) * 8)

    def _drain_pending(self, final: bool) -> list:
        """B frames still waiting for a forward anchor get a P chain."""
        enc = self.enc
        out = []
        for (py, pu, pv, off, pd) in getattr(self, "_pending_b", []):
            enc.poc = 2 * (pd - enc.poc_base)
            qp_p = self.rc.qp_for_type("P")
            au = enc.encode_frame(py, pu, pv, qp=qp_p, force_idr=False,
                                  qp_off=off)
            self._feedback("P", qp_p, au)
            out.append((au, pd, False, "P", qp_p))
        self._pending_b = []
        return out

    # ------------------------------------------------- P/B run encoding
    def _encode_run(self, run: list, is_tail: bool) -> list:
        """Encode a run of non-IDR display frames (P anchors + optional
        B in-betweens) with batched device programs."""
        enc = self.enc
        cfg = enc.cfg
        bf = cfg.bframes
        out: list = []
        pending = getattr(self, "_pending_b", [])
        self._pending_b = []

        if bf == 0:
            items = [(y, u, v, off, d) for (y, u, v, off, d, _, wp) in run]
            return self._p_batch_emit(items)

        # mini-GOP scheduling: anchor after every bf buffered B candidates
        groups = []      # (anchor_item, [b_items])
        for (y, u, v, off, d, _, wp) in run:
            if len(pending) < bf:
                pending.append((y, u, v, off, d))
            else:
                groups.append(((y, u, v, off, d), pending))
                pending = []
        self._pending_b = pending
        if not groups:
            if is_tail:
                out += self._drain_pending(final=True)
            return out

        anchors = [g[0] for g in groups]
        qp_p = self.rc.qp_for_type("P")
        qp_b = self.rc.qp_for_type("B")
        prev_ref = enc.ref                  # recon of the previous anchor
        aus_p, recons, mvs, fn_after = self._p_batch(
            anchors, [qp_p] * len(anchors), want_bextras=True)
        # B batch: all B frames of the window in one program
        b_items = []
        b_hdrs = []
        qpc_b = int(tnp.chroma_qp(qp_b, enc.pps.chroma_qp_index_offset))
        fn_final = enc.frame_num
        for gi, (anchor, bs) in enumerate(groups):
            r0 = (prev_ref if gi == 0 else
                  tuple(r[gi - 1] for r in recons))
            r1 = tuple(r[gi] for r in recons)
            for (by, bu, bv, boff, bd) in bs:
                enc.poc = 2 * (bd - enc.poc_base)
                enc.qp = qp_b
                # non-ref B: frame_num = PrevRefFrameNum + 1 == the counter
                # value right after its forward anchor advanced (§7.4.3)
                enc.frame_num = fn_after[gi]
                hw = enc._slice_header_codes(SLICE_B, NAL_SLICE,
                                             nal_ref_idc=0)
                hv, hl = hw.to_slots(pad_to=F.MAX_HDR)
                b_items.append((by, bu, bv, r0, r1, mvs[gi], bd))
                b_hdrs.append((hv, hl))
        enc.frame_num = fn_final
        aus_b = self._b_batch(b_items, b_hdrs, qp_b, qpc_b) if b_items else []
        # emit in decode order: anchor, then its B group
        bi = 0
        for gi, (anchor, bs) in enumerate(groups):
            au = aus_p[gi]
            self._feedback("P", qp_p, au)
            out.append((au, anchor[4], False, "P", qp_p))
            for (by, bu, bv, boff, bd) in bs:
                au = aus_b[bi]
                bi += 1
                self._feedback("B", qp_b, au)
                out.append((au, bd, False, "B", qp_b))
        if is_tail:
            out += self._drain_pending(final=True)
        return out

    def _p_batch_emit(self, items: list) -> list:
        """bframes=0: batch a P run and emit with RC feedback."""
        qp_p = self.rc.qp_for_type("P")
        aus, _, _ = self._p_batch(items, [qp_p] * len(items))
        out = []
        for (au, (y, u, v, off, d)) in zip(aus, items):
            self._feedback("P", qp_p, au)
            out.append((au, d, False, "P", qp_p))
        return out

    def _p_batch(self, items: list, qps: list, want_bextras: bool = False):
        """Encode a list of P display frames in batched dispatches.

        items: (y, u, v, qp_off, d).  Returns (aus, recon_stacks, mv_list)
        where recon_stacks/mv_list are per-frame device arrays (only when
        want_bextras)."""
        enc = self.enc
        cfg = enc.cfg
        H, W = enc.mbh * 16, enc.mbw * 16
        cap_words = (H * W * 3 // 2 + 4096) // 4
        aus: list = []
        recon_stacks = None
        mv_list: list = []
        fn_after: list = []

        # multi-ref warmup: encode per-frame while the DPB grows
        start = 0
        while (enc.nref > 1 and len(enc.dpb) < enc.nref
               and start < len(items)):
            y, u, v, off, d = items[start]
            enc.poc = 2 * (d - enc.poc_base)
            au = enc.encode_frame(y, u, v, qp=qps[start], force_idr=False,
                                  qp_off=off)
            aus.append(au)
            fn_after.append(enc.frame_num)
            if want_bextras:
                mv_list.append(enc.last_mv)
            start += 1
        if start == len(items):
            if want_bextras:
                return aus, recon_stacks, mv_list, fn_after
            return aus, recon_stacks, mv_list

        items = items[start:]
        qps = qps[start:]
        G = len(items)
        rows = jnp.asarray(enc.pack_batch_rows(
            [(y, u, v) for (y, u, v, off, d) in items]))
        hvs = np.zeros((G, F.MAX_HDR), np.uint32)
        hls = np.zeros((G, F.MAX_HDR), np.int32)
        hdr_bits = np.zeros(G, np.int64)
        n = enc.mbh * enc.mbw
        has_off = any(off is not None for (_, _, _, off, _) in items)
        qp_offs = (np.zeros((G, n), np.int32) if has_off else None)
        enc._cur_nref = min(len(enc.dpb), enc.nref) if enc.nref > 1 else 1
        for k, (y, u, v, off, d) in enumerate(items):
            enc.qp = int(min(max(qps[k], 0), 51))
            enc.poc = 2 * (d - enc.poc_base)
            hw = enc._slice_header_codes(SLICE_P, NAL_SLICE)
            hv, hl = hw.to_slots(pad_to=F.MAX_HDR)
            hvs[k] = hv.astype(np.uint32)
            hls[k] = hl.astype(np.int32)
            hdr_bits[k] = int(hl.sum())
            if off is not None:
                qp_offs[k] = np.asarray(off, np.int32).reshape(n)
            enc.frame_idx += 1
            enc.frame_num = (enc.frame_num + 1) % (
                1 << (enc.sps.log2_max_frame_num_minus4 + 4))
            fn_after.append(enc.frame_num)
        qpcs = np.array([int(tnp.chroma_qp(q, enc.pps.chroma_qp_index_offset))
                         for q in qps], np.int32)
        if enc.nref > 1:
            refs = tuple(jnp.stack([enc.dpb[i][pl]
                                    for i in range(enc._cur_nref)])
                         for pl in range(3))
        else:
            refs = enc.ref
        bucket = min(getattr(enc, "_bucket_words", 1 << 13), cap_words)
        while True:
            res = F.encode_pgop_packed(
                rows, *refs, jnp.asarray(np.asarray(qps, np.int32)),
                jnp.asarray(qpcs), jnp.asarray(hvs), jnp.asarray(hls),
                cfg.search_range, cfg.subpel, bucket, cfg.me_backend,
                cfg.deblock, cfg.deblock_alpha, cfg.deblock_beta,
                cfg.aq_strength, enc.pps.chroma_qp_index_offset,
                cfg.trellis, enc.partitions,
                None if qp_offs is None else jnp.asarray(qp_offs),
                want_mv=want_bextras, want_recons=want_bextras)
            datas, nbits = res[0], res[1]
            nb = np.asarray(nbits)
            need_words = (int(nb.max()) + 31) // 32 + 2
            if need_words <= bucket or bucket >= cap_words:
                break
            bucket = min(1 << need_words.bit_length(), cap_words)
        enc._bucket_words = bucket
        rfin = res[2:5]
        if enc.nref > 1:
            enc.dpb = [tuple(r[i] for r in rfin)
                       for i in range(rfin[0].shape[0])]
            enc.ref = enc.dpb[0]
        else:
            enc.ref = tuple(rfin)
        k = 5
        if want_bextras:
            mvs = res[k]
            recon_stacks = res[k + 1:k + 4]
            mv_list += [mvs[g] for g in range(G)]
        payload_bytes = np.asarray(datas)
        slices = []
        for g in range(G):
            nbytes = (int(nb[g]) + 7) // 8
            if nbytes > bucket * 4:
                raise RuntimeError("batch pack overflow")
            slices.append(payload_bytes[g, :nbytes])
        aus += self._wrap_all(slices, hdr_bits, "P", NAL_SLICE, qps, 3)
        if want_bextras:
            return aus, recon_stacks, mv_list, fn_after
        return aus, recon_stacks, mv_list

    def _b_batch(self, b_items: list, b_hdrs: list, qp_b: int,
                 qpc_b: int) -> list:
        """Encode every B frame of the window in one batched program."""
        enc = self.enc
        cfg = enc.cfg
        H, W = enc.mbh * 16, enc.mbw * 16
        cap_words = (H * W * 3 // 2 + 4096) // 4
        Gb = len(b_items)
        rows = jnp.asarray(enc.pack_batch_rows(
            [(y, u, v) for (y, u, v, _, _, _, _) in b_items]))
        r0y = jnp.stack([it[3][0] for it in b_items])
        r0u = jnp.stack([it[3][1] for it in b_items])
        r0v = jnp.stack([it[3][2] for it in b_items])
        r1y = jnp.stack([it[4][0] for it in b_items])
        r1u = jnp.stack([it[4][1] for it in b_items])
        r1v = jnp.stack([it[4][2] for it in b_items])
        mvc = jnp.stack([it[5] for it in b_items])
        hvs = np.stack([h[0].astype(np.uint32) for h in b_hdrs])
        hls = np.stack([h[1].astype(np.int32) for h in b_hdrs])
        hdr_bits = np.array([int(h[1].sum()) for h in b_hdrs], np.int64)
        qps = jnp.full((Gb,), qp_b, jnp.int32)
        qpcs = jnp.full((Gb,), qpc_b, jnp.int32)
        vs, ls = F.encode_bgop_slots(
            rows, r0y, r0u, r0v, r1y, r1u, r1v, mvc, qps, qpcs,
            jnp.asarray(hvs), jnp.asarray(hls),
            cfg.search_range, cfg.subpel, cfg.me_backend)
        bucket = min(getattr(enc, "_bucket_words", 1 << 13), cap_words)
        datas = []
        nbits = []
        for g in range(Gb):
            d, nbg = F.pack_phase(vs[g], ls[g], bucket)
            datas.append(d)
            nbits.append(nbg)
        # ONE stacked pull for the window's B payloads + bit counts: each
        # host<->device round-trip costs ~100ms of tunnel latency, so per-B
        # pulls dominated the window time (profiled round 4)
        alld = np.asarray(jnp.stack(datas))
        nbs = [int(x) for x in np.asarray(jnp.stack(nbits))]
        slices = []
        for g in range(Gb):
            need = (nbs[g] + 31) // 32 + 2
            if need > bucket:          # rare overflow: re-pack just this one
                big = min(1 << need.bit_length(), cap_words)
                d, nbg = F.pack_phase(vs[g], ls[g], big)
                nbs[g] = int(nbg)
                slices.append(np.asarray(d)[: (nbs[g] + 7) // 8])
            else:
                slices.append(alld[g, : (nbs[g] + 7) // 8])
        return self._wrap_all(slices, hdr_bits, "B", NAL_SLICE,
                              [qp_b] * Gb, 0)

    # ------------------------------------------------------- entropy out
    def _wrap_all(self, payloads: list, hdr_bits, slice_type: str,
                  nal_type: int, qps: list, nal_ref_idc: int) -> list:
        """Wrap payload slices into AUs; CABAC mode transcodes each slice
        in a worker pool (the native C passes release the GIL)."""
        enc = self.enc
        if not enc.cfg.cabac:
            return [wrap_nal(nal_ref_idc, nal_type, p) for p in payloads]
        from ..bitstream import cabac_transcode

        def tx(args):
            p, hb, qp = args
            body = cabac_transcode.transcode_slice(
                p, int(hb), slice_type, enc.mbh, enc.mbw, int(qp),
                nref=getattr(enc, "_cur_nref", 1))
            if body is None:
                raise RuntimeError(
                    f"CABAC transcode rejected an own {slice_type} slice")
            return body

        bodies = list(self._pool.map(
            tx, zip(payloads, hdr_bits, qps)))
        return [wrap_nal(nal_ref_idc, nal_type, b) for b in bodies]
