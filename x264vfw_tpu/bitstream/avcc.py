"""AVCDecoderConfigurationRecord (avcC) construction (ISO 14496-15 §5.2.4).

Built by the reference in each container muxer (matroska.c:137-158,
mp4_lsmash via lsmash_setup_h264_specific_parameters, flv.c:190-219).
"""

from __future__ import annotations


def build_avcc(sps: bytes, pps: bytes, nal_length_size: int = 4) -> bytes:
    """sps/pps: raw NAL payloads including the NAL header byte."""
    profile_idc = sps[1]
    profile_compat = sps[2]
    level_idc = sps[3]
    out = bytearray()
    out.append(1)  # configurationVersion
    out.append(profile_idc)
    out.append(profile_compat)
    out.append(level_idc)
    out.append(0xFC | (nal_length_size - 1))
    out.append(0xE0 | 1)  # numOfSequenceParameterSets
    out += len(sps).to_bytes(2, "big")
    out += sps
    out.append(1)  # numOfPictureParameterSets
    out += len(pps).to_bytes(2, "big")
    out += pps
    return bytes(out)
