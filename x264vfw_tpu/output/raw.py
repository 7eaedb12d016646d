"""Raw Annex-B elementary stream output (reference output/raw.c)."""

from __future__ import annotations

from .base import Muxer
from ..bitstream.nal import START_CODE_LONG


class RawMuxer(Muxer):
    name = "raw"
    needs_global_headers = False

    def write_headers(self, sps: bytes, pps: bytes, sei: bytes = b"") -> int:
        """sps/pps: complete NAL payloads (header byte + EBSP, no start code)."""
        out = START_CODE_LONG + sps + START_CODE_LONG + pps + sei
        return self._w(out)

    def write_frame(self, nalus: bytes, pts: int, dts: int,
                    keyframe: bool) -> int:
        return self._w(nalus)
