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


def _simulate(rc, cplx_seq, fps=25.0):
    """Virtual encoder: bits = complexity / qscale, exact rate model."""
    from x264vfw_tpu.encode.ratecontrol import qp2qscale
    bits = []
    for i, cplx in enumerate(cplx_seq):
        ftype = "I" if i == 0 else "P"
        qp = rc.qp_for_type(ftype)
        b = int(cplx / qp2qscale(qp))
        rc.update(ftype, qp, b)
        bits.append(b)
    return bits


def test_abr_model_converges_within_5pct():
    """Against an ideal bits=cplx/qscale encoder the ABR loop must land
    within 5% of the target on varied-complexity content."""
    from x264vfw_tpu.config.params import EncoderParams
    from x264vfw_tpu.encode.ratecontrol import RateController
    rng = np.random.default_rng(0)
    for target, seed in ((400, 1), (1200, 2), (250, 3)):
        p = EncoderParams(rc_mode="abr", bitrate=target, fps_num=25,
                          fps_den=1, width=320, height=240)
        rc = RateController(p)
        n = 600
        cplx = 3.0e4 * np.exp(rng.normal(0, 0.5, n)).cumsum() / \
            np.arange(1, n + 1)  # slowly drifting complexity
        bits = _simulate(rc, cplx.tolist())
        kbps = sum(bits[n // 4:]) * 25 / (n - n // 4) / 1000.0
        assert abs(kbps - target) / target < 0.05, (target, kbps)


def test_vbv_preemptive_clamp_bounds_frames():
    """With VBV on, the model must never schedule a frame larger than the
    buffer and must keep the model fill above zero on a complexity spike."""
    from x264vfw_tpu.config.params import EncoderParams
    from x264vfw_tpu.encode.ratecontrol import RateController, qp2qscale
    p = EncoderParams(rc_mode="abr", bitrate=400, vbv_maxrate=400,
                      vbv_bufsize=160, fps_num=25, fps_den=1,
                      width=320, height=240)
    rc = RateController(p)
    cap = 160 * 1000
    rng = np.random.default_rng(4)
    cplx = 2.0e4 * np.ones(300)
    cplx[100:140] *= 12.0      # complexity spike
    fills = []
    for i, c in enumerate(cplx):
        ftype = "I" if i == 0 else "P"
        qp = rc.qp_for_type(ftype)
        b = int(c / qp2qscale(qp) * float(rng.uniform(0.9, 1.1)))
        rc.update(ftype, qp, b)
        fills.append(rc._vbv_fill)
    fills = np.asarray(fills)
    # the pre-emptive clamp limits underflow to the spike ONSET (the bits
    # predictor lags one frame on a step change — x264 has the same limit);
    # in steady state the buffer must hold the guard level and recover
    low = fills[10:] < 0.02 * cap
    assert low.sum() <= 3, low.sum()
    # after the spike the ABR catch-up legitimately rides the buffer low;
    # the clamp must keep it near the 10% underflow guard (+-10% predictor
    # noise), not at some comfortable fill level
    assert fills[150:].min() > 0.08 * cap, fills[150:].min()


def test_crf_bits_track_complexity():
    """CRF must spend more bits on busier content at a similar QP spread
    (bits ~ complexity^qcomp, not constant-QP)."""
    from x264vfw_tpu.config.params import EncoderParams
    from x264vfw_tpu.encode.ratecontrol import RateController
    p = EncoderParams(rc_mode="crf", crf=26, fps_num=25, fps_den=1,
                      width=320, height=240)
    rc = RateController(p)
    easy = _simulate(rc, [1.0e4] * 100)
    rc2 = RateController(p)
    hard = _simulate(rc2, [8.0e4] * 100)
    r = sum(hard[50:]) / max(sum(easy[50:]), 1)
    # qcomp 0.6: an 8x complexity step should cost ~8^0.6 ~ 3.5x the bits,
    # NOT 8x (constant QP) and NOT 1x (constant bitrate)
    assert 2.0 < r < 6.0, r
