"""CAVLC -> CABAC entropy transcode (the CABAC hot path).

The batched device pipeline emits complete CAVLC slices with a
bitstream-sized host pull (encode/device_finalize.py).  CABAC's adaptive
arithmetic loop is inherently serial and must run on host (SURVEY §7
"entropy coding is inherently serial") — but its *input* is the same
syntax elements the CAVLC slice already carries.  So the CABAC product
path is: device CAVLC slice -> native C syntax parse
(tools/decparse/cavlc_parse.c, raw-syntax outputs) -> native C CABAC
coder (tools/cabac/cabac_ext.c).  Host work is two C passes over
~bitstream-sized data instead of a multi-MB syntax-tensor pull per frame
(the round-3 design, 0.42 fps at 1080p).

Capability replaced: libx264's CABAC entropy stage (x264 --cabac default,
/root/reference/codec.c:865-866) re-hosted as a transcode stage over the
TPU-resident pipeline.
"""

from __future__ import annotations

import numpy as np

from ..decode import native_parse
from . import cabac_native as cn


def available() -> bool:
    return native_parse.available() and cn.available()


def _header_bytes(payload: np.ndarray, hdr_bits: int) -> bytes:
    """First hdr_bits of the slice as bytes, with cabac_alignment_one_bit
    padding (§7.3.4: slice data starts byte-aligned when CABAC)."""
    nbytes = (hdr_bits + 7) // 8
    hdr = bytearray(payload[:nbytes].tobytes())
    pad = (-hdr_bits) % 8
    if pad:
        hdr[-1] |= (1 << pad) - 1
    return bytes(hdr)


def transcode_slice(payload: np.ndarray, hdr_bits: int, slice_type: str,
                    mbh: int, mbw: int, qp: int, nref: int = 1,
                    t8_mode: bool = False) -> bytes | None:
    """Re-code one CAVLC slice RBSP (header + data) as a CABAC slice.

    payload: uint8 RBSP (unescaped).  slice_type: "I"/"P"/"B".  qp: the
    slice QP (pic_init_qp + slice_qp_delta).  Returns the full CABAC
    slice RBSP (same header, aligned, re-coded data) or None when the
    slice uses syntax outside the transcoder's scope.
    """
    if not available():
        return None
    payload = np.ascontiguousarray(payload, np.uint8)
    n = mbh * mbw
    hdr = _header_bytes(payload, hdr_bits)

    if slice_type == "B":
        syn = native_parse.parse_b_slice(payload, hdr_bits, mbh, mbw, qp,
                                         transform_8x8=t8_mode)
        if syn is None:
            return None
        mode = syn["mode"].astype(np.int32)
        skip = (mode < 0).astype(np.uint8)
        body = cn.encode_b_slice(
            qp, 0, mbh, mbw, skip, np.maximum(mode, 0),
            syn["mvd0"].astype(np.int32), syn["mvd1"].astype(np.int32),
            syn["cbp_luma"], syn["cbp_chroma"],
            syn["lvl16"].astype(np.int32),
            syn["cdc"][:, 0].astype(np.int32),
            syn["cdc"][:, 1].astype(np.int32),
            syn["cac"][:, 0].astype(np.int32),
            syn["cac"][:, 1].astype(np.int32), t8_mode=t8_mode,
            t8=syn.get("t8"))
        return hdr + body

    st = 0 if slice_type == "P" else 2
    syn = native_parse.parse_slice(payload, hdr_bits, st, mbh, mbw, qp,
                                   nref, t8_mode, want_raw=True)
    if syn is None:
        return None
    kinds = syn["mb_kind"]
    if slice_type == "P":
        if (kinds >= 5).any():          # intra MBs in P: not re-codable yet
            return None
        if (syn["flags"] & 1).any():    # sub-8x8 partitions
            return None
        refq = syn["refq"]
        ref0 = refq[:, 0].astype(np.int32)
        if nref > 1 and (refq != refq[:, :1]).any():
            return None                 # per-partition refs: unsupported
        skip = (kinds == 0).astype(np.uint8)
        body = cn.encode_p_slice(
            qp, 0, mbh, mbw, skip,
            syn["mvdq"].astype(np.int32),
            syn["cbp_luma"], syn["cbp_chroma"],
            syn["lvl16"].astype(np.int32),
            syn["cdc"][:, 0].astype(np.int32),
            syn["cdc"][:, 1].astype(np.int32),
            syn["cac"][:, 0].astype(np.int32),
            syn["cac"][:, 1].astype(np.int32),
            qpd=syn["qpd"].astype(np.int32),
            part=np.maximum(syn["part"].astype(np.int32), 0),
            ref=ref0, nref=nref, t8=syn.get("t8"), t8_mode=t8_mode)
        return hdr + body

    # I slice (mixed I16 / I_NxN)
    if (syn["qpd"] != 0).any():
        return None                     # I-slice per-MB qp: not re-codable
    use_i4 = (kinds == 6).astype(np.uint8)
    acflag = (syn["cbp_luma"] != 0).astype(np.uint8)
    kw = {}
    if use_i4.any():
        kw = dict(use_i4=use_i4,
                  i4_prev=syn["i4prev"],
                  i4_rem=np.maximum(syn["i4rem"].astype(np.int32), 0),
                  cbp4=syn["cbp_luma"],
                  levels4=syn["lvl16"].astype(np.int32))
    body = cn.encode_i_slice(
        qp, mbh, mbw, syn["i16mode"], syn["cmode"], acflag,
        syn["cbp_chroma"], syn["dc16"].astype(np.int32),
        syn["ac15"].astype(np.int32),
        syn["cdc"][:, 0].astype(np.int32),
        syn["cdc"][:, 1].astype(np.int32),
        syn["cac"][:, 0].astype(np.int32),
        syn["cac"][:, 1].astype(np.int32), t8_mode=t8_mode, **kw)
    return hdr + body
