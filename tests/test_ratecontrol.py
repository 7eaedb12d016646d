"""Rate control: ABR convergence, 2-pass stats roundtrip, CRF mapping."""

import numpy as np
import pytest

import oracle
from x264vfw_tpu.api import CompressSession
from x264vfw_tpu.config.params import EncoderParams


def _run(params, clip, w, h):
    sess = CompressSession(params)
    sess.begin(w, h)
    fsz, csz = w * h, w * h // 4
    total_bits = 0
    for i in range(clip.shape[0]):
        au = sess.compress((clip[i, :fsz].reshape(h, w),
                            clip[i, fsz:fsz + csz].reshape(h // 2, w // 2),
                            clip[i, fsz + csz:].reshape(h // 2, w // 2)))
        total_bits += len(au) * 8
    total_bits += len(sess.end()["tail"]) * 8  # lookahead/B delay drains here
    fps = params.fps_num / params.fps_den
    kbps = total_bits * fps / clip.shape[0] / 1000.0
    return kbps, sess


def test_abr_tracks_target():
    w, h, n = 64, 64, 24
    clip = oracle.make_test_clip(w, h, n, seed=1)
    for target in (150, 500):
        p = EncoderParams(rc_mode="abr", bitrate=target, keyint=100,
                          fps_num=25, merange=4, log_level=-1)
        kbps, _ = _run(p, clip, w, h)
        assert 0.5 * target < kbps < 2.0 * target, (target, kbps)


def test_crf_monotone_rate():
    w, h, n = 64, 64, 6
    clip = oracle.make_test_clip(w, h, n, seed=2)
    rates = []
    for crf in (20, 30, 40):
        p = EncoderParams(rc_mode="crf", crf=crf, merange=4, log_level=-1)
        kbps, _ = _run(p, clip, w, h)
        rates.append(kbps)
    assert rates[0] > rates[1] > rates[2]


def test_two_pass(tmp_path):
    w, h, n = 64, 64, 12
    clip = oracle.make_test_clip(w, h, n, seed=3)
    stats = str(tmp_path / "s.stats")
    p1 = EncoderParams(rc_mode="pass1", crf=26.0, stats_file=stats,
                       merange=4, log_level=-1)
    _run(p1, clip, w, h)
    import os
    assert os.path.exists(stats)
    target = 400
    p2 = EncoderParams(rc_mode="pass2", bitrate=target, stats_file=stats,
                       merange=4, log_level=-1)
    kbps, _ = _run(p2, clip, w, h)
    assert 0.4 * target < kbps < 2.5 * target, kbps


def test_pass2_without_stats_raises(tmp_path):
    p = EncoderParams(rc_mode="pass2", bitrate=300,
                      stats_file=str(tmp_path / "none.stats"))
    with pytest.raises(FileNotFoundError):
        CompressSession(p).begin(64, 64)


def test_vbv_biases_qp_under_pressure():
    from x264vfw_tpu.config.params import EncoderParams
    from x264vfw_tpu.encode.ratecontrol import RateController
    p = EncoderParams(rc_mode="abr", bitrate=500, vbv_maxrate=500,
                      vbv_bufsize=250, fps_num=25, fps_den=1,
                      width=320, height=240)
    rc = RateController(p)
    base = rc.qp_for_frame(False)
    # feed frames 3x over the vbv input rate: buffer drains, QP must rise
    per_frame_in = 500 * 1000 / 25
    for _ in range(12):
        rc.update("P", rc.qp_for_frame(False), int(per_frame_in * 3))
    assert rc.qp_for_frame(False) > base
    assert rc._vbv_fill >= 0
    # light frames afterwards: buffer refills, bias decays
    for _ in range(40):
        rc.update("P", rc.qp_for_frame(False), int(per_frame_in * 0.2))
    assert rc._vbv_adj <= 1
