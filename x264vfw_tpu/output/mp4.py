"""MP4 (ISO-BMFF) muxer — native minimal writer.

Covers the slice of L-SMASH the reference actually uses for muxing
(SURVEY.md §2b note): ftyp/mdat/moov with full sample tables (stts, stss,
ctts for reordering, stsc/stsz/stco), avc1+avcC sample description, SAR via
pasp, and an edit list expressing initial decode delay
(reference mp4_lsmash.c:146-169, 408-421).
"""

from __future__ import annotations

import struct

from .base import Muxer, MuxParams
from ..bitstream.avcc import build_avcc
from ..bitstream.nal import annexb_to_avcc


def box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def fullbox(btype: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return box(btype, bytes([version]) + flags.to_bytes(3, "big") + payload)


class Mp4Muxer(Muxer):
    name = "mp4"

    def set_param(self, params: MuxParams) -> None:
        super().set_param(params)
        self._samples: list[tuple[int, int, int, bool]] = []  # (off,size,pts,key)
        self._dts: list[int] = []
        self._avcc = b""

    def write_headers(self, sps: bytes, pps: bytes, sei: bytes = b"") -> int:
        self._avcc = build_avcc(sps, pps)
        n = self._w(box(b"ftyp", b"mp42" + struct.pack(">I", 0)
                        + b"mp42" + b"mp41" + b"isom"))
        self._mdat_pos = self.f.tell()
        n += self._w(struct.pack(">I", 8) + b"mdat")
        return n

    def write_frame(self, nalus: bytes, pts: int, dts: int,
                    keyframe: bool) -> int:
        data = annexb_to_avcc(nalus)
        off = self.f.tell()
        n = self._w(data)
        self._samples.append((off, len(data), pts, keyframe))
        self._dts.append(dts)
        return n

    def close_file(self, largest_pts: int = 0, second_largest_pts: int = 0) -> None:
        if self.f is None:
            return
        p = self.params
        timescale = p.timebase_den
        delta = p.timebase_num
        ns = len(self._samples)
        dur_media = (2 * largest_pts - second_largest_pts) * delta if ns else 0
        if ns and not largest_pts:
            dur_media = ns * delta

        # ---- sample tables ----
        stts = fullbox(b"stts", 0, 0, struct.pack(">I", 1)
                       + struct.pack(">II", ns, delta))
        keys = [i + 1 for i, s in enumerate(self._samples) if s[3]]
        stss = fullbox(b"stss", 0, 0, struct.pack(">I", len(keys))
                       + b"".join(struct.pack(">I", k) for k in keys))
        # composition offsets: decode time is implicitly k*delta (stts), so
        # offset_k = (pts_k - k + delay)*delta with delay = max(k - pts_k)
        # >= 0; the edit list below skips the initial `delay` of media time
        # (the L-SMASH layout, mp4_lsmash.c:146-169,408-421)
        ctts = b""
        delay = max((k - s[2] for k, s in enumerate(self._samples)),
                    default=0)
        offs = [(s[2] - k + delay) * delta
                for k, s in enumerate(self._samples)]
        if any(o != 0 for o in offs):
            runs = []
            for o in offs:
                if runs and runs[-1][1] == o:
                    runs[-1][0] += 1
                else:
                    runs.append([1, o])
            ctts = fullbox(b"ctts", 0, 0, struct.pack(">I", len(runs))
                           + b"".join(struct.pack(">Ii", c, o) for c, o in runs))
        stsc = fullbox(b"stsc", 0, 0, struct.pack(">I", 1)
                       + struct.pack(">III", 1, 1, 1))
        stsz = fullbox(b"stsz", 0, 0, struct.pack(">II", 0, ns)
                       + b"".join(struct.pack(">I", s[1]) for s in self._samples))
        stco = fullbox(b"stco", 0, 0, struct.pack(">I", ns)
                       + b"".join(struct.pack(">I", s[0]) for s in self._samples))

        # ---- sample description ----
        avc1_body = (b"\x00" * 6 + struct.pack(">H", 1)       # reserved+dri
                     + b"\x00" * 16
                     + struct.pack(">HH", p.width, p.height)
                     + struct.pack(">II", 0x480000, 0x480000)  # dpi
                     + struct.pack(">I", 0)
                     + struct.pack(">H", 1)                   # frame count
                     + b"\x00" * 32                           # compressor
                     + struct.pack(">H", 0x18)                # depth
                     + struct.pack(">h", -1))
        avc1_body += box(b"avcC", self._avcc)
        if p.sar_width and p.sar_height:
            avc1_body += box(b"pasp", struct.pack(">II", p.sar_width,
                                                  p.sar_height))
        stsd = fullbox(b"stsd", 0, 0, struct.pack(">I", 1)
                       + box(b"avc1", avc1_body))
        stbl = box(b"stbl", stsd + stts + (ctts or b"") + stss + stsc
                   + stsz + stco)
        vmhd = fullbox(b"vmhd", 0, 1, b"\x00" * 8)
        dinf = box(b"dinf", fullbox(b"dref", 0, 0, struct.pack(">I", 1)
                                    + fullbox(b"url ", 0, 1, b"")))
        minf = box(b"minf", vmhd + dinf + stbl)
        hdlr = fullbox(b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide"
                       + b"\x00" * 12 + b"x264vfw_tpu video\x00")
        mdhd = fullbox(b"mdhd", 0, 0, struct.pack(">IIII", 0, 0, timescale,
                                                  max(0, dur_media))
                       + struct.pack(">HH", 0x55C4, 0))  # und language
        mdia = box(b"mdia", mdhd + hdlr + minf)

        mtx = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        movie_ts = 600
        dur_movie = dur_media * movie_ts // timescale if timescale else 0
        tkhd = fullbox(b"tkhd", 0, 7, struct.pack(">IIIII", 0, 0, 1, 0,
                                                  max(0, dur_movie))
                       + b"\x00" * 8 + struct.pack(">hhhh", 0, 0, 0, 0)
                       + mtx
                       + struct.pack(">II", p.width << 16, p.height << 16))
        # edit list skipping the initial reorder delay (mp4_lsmash.c:146-169)
        edts = b""
        if any(o for o in offs):
            media_time = (delay + min((s[2] for s in self._samples),
                                      default=0)) * delta
            elst = fullbox(b"elst", 0, 0, struct.pack(">I", 1)
                           + struct.pack(">IiHH", max(0, dur_movie),
                                         media_time, 1, 0))
            edts = box(b"edts", elst)
        trak = box(b"trak", tkhd + edts + mdia)
        mvhd = fullbox(b"mvhd", 0, 0, struct.pack(">IIII", 0, 0, movie_ts,
                                                  max(0, dur_movie))
                       + struct.pack(">I", 0x10000) + struct.pack(">H", 0x100)
                       + b"\x00" * 10 + mtx + b"\x00" * 24
                       + struct.pack(">I", 2))
        moov = box(b"moov", mvhd + trak)
        end = self.f.tell()
        self._w(moov)
        # backpatch mdat size
        if self.f.seekable():
            self.f.seek(self._mdat_pos)
            self.f.write(struct.pack(">I", end - self._mdat_pos))
            self.f.seek(0, 2)
        super().close_file(largest_pts, second_largest_pts)
