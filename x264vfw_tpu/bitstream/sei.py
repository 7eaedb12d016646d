"""SEI message writing (§7.3.2.3): user-data-unregistered version string
(the x264-style SEI the reference's muxers carry in their headers payload,
e.g. raw.c header concatenation) and buffering-period placeholders.
"""

from __future__ import annotations

import numpy as np

from .. import __version__
from ..utils.bitstream import BitWriter
from .nal import NAL_SEI, wrap_nal

# fixed UUID for our user_data_unregistered payloads
UUID = bytes.fromhex("db3f8ca7a4f14c8b9d3e2a1b0c5d6e7f")

SEI_BUFFERING_PERIOD = 0
SEI_USER_DATA_UNREGISTERED = 5


def buffering_period_sei(sps) -> bytes:
    """Annex-B buffering-period SEI (§D.1.1) for a stream with NAL HRD
    signaled in the SPS VUI: initial CPB removal delay in 90 kHz units,
    90% buffer fill at stream start (x264's default initial fill)."""
    from .params import HRD_INIT_DELAY_LEN
    w = BitWriter()
    body = BitWriter()
    body.ue(sps.seq_parameter_set_id)
    delay90k = int(90000 * 0.9 * sps.hrd_cpb_size
                   / max(1, sps.hrd_bitrate))
    delay90k = min(delay90k, (1 << HRD_INIT_DELAY_LEN) - 1)
    body.u(HRD_INIT_DELAY_LEN, delay90k)
    body.u(HRD_INIT_DELAY_LEN, 0)  # initial_cpb_removal_delay_offset
    if body.bit_position % 8:      # sei payload byte-alignment (§D.1)
        body.u(1, 1)
        pad = (-body.bit_position) % 8
        if pad:
            body.u(pad, 0)
    payload = body.to_rbsp().tobytes()
    w.u(8, SEI_BUFFERING_PERIOD)
    w.u(8, len(payload))
    for b in payload:
        w.u(8, b)
    w.rbsp_trailing_bits()
    return wrap_nal(0, NAL_SEI, w.to_rbsp())


def version_sei(settings: str = "") -> bytes:
    """Annex-B SEI NAL with the encoder version string (x264-compatible
    consumer tooling parses this for encoder identification)."""
    text = (f"x264vfw_tpu (core {__version__}) - TPU-native H.264 encoder - "
            f"options: {settings}").encode()
    payload = UUID + text + b"\x00"
    w = BitWriter()
    w.u(8, SEI_USER_DATA_UNREGISTERED)  # payload type
    size = len(payload)
    while size >= 255:
        w.u(8, 255)
        size -= 255
    w.u(8, size)
    for b in payload:
        w.u(8, b)
    w.rbsp_trailing_bits()
    return wrap_nal(0, NAL_SEI, w.to_rbsp())


def parse_sei_messages(rbsp: np.ndarray) -> list[tuple[int, bytes]]:
    """-> [(payload_type, payload_bytes)] (decode-side SEI walk)."""
    data = bytes(rbsp.tobytes() if isinstance(rbsp, np.ndarray) else rbsp)
    out = []
    i = 0
    while i < len(data):
        if data[i] == 0x80:  # rbsp stop bit byte
            break
        ptype = 0
        while i < len(data) and data[i] == 255:
            ptype += 255
            i += 1
        if i >= len(data):
            break
        ptype += data[i]
        i += 1
        size = 0
        while i < len(data) and data[i] == 255:
            size += 255
            i += 1
        if i >= len(data):
            break
        size += data[i]
        i += 1
        out.append((ptype, data[i:i + size]))
        i += size
    return out
