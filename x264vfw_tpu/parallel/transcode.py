"""Batch transcode pipeline: decode -> scale -> re-encode (BASELINE config 5).

Stages mirror the reference's decompress+swscale+compress composition but as
a pipeline over the native decoder, the MXU scaler (ops/scale.py) and the
TPU encoder.  GOP segments are independent (closed GOPs start with IDR), so
multi-chip scale-out shards GOPs over the device mesh — the DP mapping from
SURVEY.md §2d; see parallel/gop.py and __graft_entry__.dryrun_multichip for
the sharded dry run.
"""

from __future__ import annotations

import numpy as np

from ..api import CompressSession
from ..config.params import EncoderParams
from ..decode.decoder import H264Decoder
from ..ops.scale import scale_i420


def transcode(bitstream: bytes, dst_w: int, dst_h: int,
              params: EncoderParams | None = None,
              output=None, method: str = "bicubic") -> bytes:
    """H.264 Annex-B in -> decoded -> scaled -> re-encoded Annex-B out."""
    dec = H264Decoder()
    dec.decode(bitstream)
    frames = dec.display_order()
    if not frames:
        raise ValueError("no frames decoded from input")
    p = params.copy() if params else EncoderParams(rc_mode="cqp", qp=26)
    sess = CompressSession(p)
    sess.begin(dst_w, dst_h, output=output)
    out = b""
    for f in frames:
        y, u, v = scale_i420(f.y, f.u, f.v, dst_w, dst_h, method)
        out += sess.compress((np.asarray(y, np.uint8),
                              np.asarray(u, np.uint8),
                              np.asarray(v, np.uint8)))
    out += sess.end()["tail"]
    return out


def transcode_frames(frames_yuv, dst_w: int, dst_h: int,
                     params: EncoderParams | None = None) -> bytes:
    """Raw-frame variant (already-decoded input)."""
    p = params.copy() if params else EncoderParams(rc_mode="cqp", qp=26)
    sess = CompressSession(p)
    sess.begin(dst_w, dst_h)
    out = b""
    for (y, u, v) in frames_yuv:
        sy, su, sv = scale_i420(y, u, v, dst_w, dst_h)
        out += sess.compress((np.asarray(sy, np.uint8),
                              np.asarray(su, np.uint8),
                              np.asarray(sv, np.uint8)))
    out += sess.end()["tail"]
    return out
