"""Benchmark: the five BASELINE.json configs, measured on the product API.

Every number is produced by the same code paths a user runs
(CompressSession / H264Decoder / transcode_clip), each labeled with its
true feature set — plus `device_fps`, the compute-limited capacity of the
batched CAVLC device pipeline (frames pre-staged on device, dispatches
chained through the recon so the measurement cannot overlap itself).

Output: ONE JSON line.
  value / vs_baseline : 1080p session throughput at the DEFAULT config
      (CABAC + B-frames + 8x8dct + ref 3 anchors + mbtree lookahead)
      against the 300 fps/chip north star (BASELINE.md).
  configs             : per-config {name, fps, kbps, config} entries.
"""

from __future__ import annotations

import json
import os
import tempfile
import time

import numpy as np


def make_clip(w, h, n, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = 64 + 64 * np.sin(xx / 31.0) + 48 * np.cos(yy / 23.0)
    tex = rng.integers(-10, 11, size=(h, w))
    frames = []
    for f in range(n):
        y = np.clip(base + np.roll(tex, f * 2, axis=1), 0, 255).astype(np.uint8)
        u = np.clip(128 + 24 * np.sin((xx[::2, ::2] + f) / 37.0), 0, 255).astype(np.uint8)
        v = np.clip(128 + 24 * np.cos((yy[::2, ::2] - f) / 41.0), 0, 255).astype(np.uint8)
        frames.append((y, u, v))
    return frames


def session_run(w, h, frames, n, params=None, cmdline="", output=None,
                container=None, warm=None):
    """Encode n frames through CompressSession; returns (fps, kbps, bytes).
    warm: frames encoded before timing (compile + pipeline fill)."""
    from x264vfw_tpu.api import CompressSession
    from x264vfw_tpu.config.params import EncoderParams

    p = params.copy() if params is not None else EncoderParams()
    sess = CompressSession(p, extra_cmdline=cmdline)
    sess.begin(w, h, output=output, container=container)
    nf = len(frames)
    # steady state needs the mbtree lookahead (40) AND both batch windows
    # (2x12) filled before timing starts
    warm = warm if warm is not None else 84
    total = 0
    for i in range(warm):
        total += len(sess.compress(frames[i % nf], "i420"))
    t0 = time.perf_counter()
    for i in range(n):
        total += len(sess.compress(frames[(warm + i) % nf], "i420"))
    dt = time.perf_counter() - t0
    stats = sess.end()
    total += len(stats.get("tail", b""))
    fps = n / dt
    kbps = total * 8 * 25 / (warm + n) / 1000.0
    return fps, kbps, total


def main():
    from x264vfw_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    # tunnel watchdog: a dead TPU tunnel hangs inside device init with no
    # exception (observed rounds 1-2); probe on a side thread for an
    # honest error JSON instead of a silent driver timeout.
    import threading
    probe_ok = threading.Event()

    def _probe():
        try:
            if float(jnp.ones((8, 8)).sum()) == 64.0:
                probe_ok.set()
        except Exception:
            pass

    th = threading.Thread(target=_probe, daemon=True)
    th.start()
    th.join(timeout=600)
    if not probe_ok.is_set():
        print(json.dumps({
            "metric": "1080p_encode_fps_per_chip", "value": 0.0,
            "unit": "fps", "vs_baseline": 0.0,
            "error": "TPU tunnel unresponsive (device probe hung >600s)"}),
            flush=True)
        # the probe thread is wedged inside the device client; normal
        # interpreter teardown aborts on it (r4: rc 134 after the JSON was
        # already printed) — skip destructors entirely
        os._exit(0)

    from x264vfw_tpu.config.params import EncoderParams

    configs = []

    # ---- config 1: 720p ultrafast, CRF 23, CAVLC + P only, raw .264 ----
    fr720 = make_clip(1280, 720, 4, seed=1)
    with tempfile.TemporaryDirectory() as td:
        fps, kbps, _ = session_run(
            1280, 720, fr720, 96,
            cmdline="--preset ultrafast --crf 23",
            output=os.path.join(td, "c1.264"))
    configs.append({"name": "720p_ultrafast_crf23_raw",
                    "fps": round(fps, 2), "kbps": round(kbps),
                    "config": "preset ultrafast (CAVLC, P-only, no deblock),"
                              " CRF 23, raw Annex-B"})

    # ---- config 2: 720p CABAC + B + deblock, MKV mux ----
    with tempfile.TemporaryDirectory() as td:
        fps, kbps, _ = session_run(
            1280, 720, fr720, 96, cmdline="--crf 23",
            output=os.path.join(td, "c2.mkv"))
    configs.append({"name": "720p_cabac_b_deblock_mkv",
                    "fps": round(fps, 2), "kbps": round(kbps),
                    "config": "default params: CABAC + B-frames + 8x8dct "
                              "+ deblock + mbtree (P anchors ref 3, B one "
                              "per list), CRF 23, MKV"})

    # ---- config 3: 1080p medium two-pass (subpel ME + trellis + AQ) ----
    fr1080 = make_clip(1920, 1080, 4)
    with tempfile.TemporaryDirectory() as td:
        stats = os.path.join(td, "x264vfw.stats")
        p1 = EncoderParams()
        # pass 1 must cover every frame pass 2 will encode (84 warm + 48)
        session_run(1920, 1080, fr1080, 132,
                    params=p1, cmdline=f"--pass 1 --bitrate 6000 "
                    f"--stats {stats}", warm=0)
        fps, kbps, _ = session_run(
            1920, 1080, fr1080, 48,
            cmdline=f"--pass 2 --bitrate 6000 --stats {stats}")
    configs.append({"name": "1080p_default_2pass",
                    "fps": round(fps, 2), "kbps": round(kbps),
                    "config": "default (CABAC+B+8x8dct+trellis+AQ+mbtree,"
                              " ref-3 P anchors), ABR 6000kbps "
                              "closed-loop pass 2"})
    pass2_fps = fps

    # ---- headline: 1080p default config, one-pass CRF ----
    fps, kbps, _ = session_run(1920, 1080, fr1080, 48, cmdline="--crf 23")
    headline = fps
    configs.append({"name": "1080p_default_crf",
                    "fps": round(fps, 2), "kbps": round(kbps),
                    "config": "default params (CABAC + B + 8x8dct + "
                              "mbtree, ref-3 P anchors), CRF 23, "
                              "session API"})

    # ---- device capacity: batched CAVLC device pipeline (no ingest) ----
    from x264vfw_tpu.encode.ref_encoder import EncoderConfig
    from x264vfw_tpu.encode.tpu_encoder import TpuEncoder
    from x264vfw_tpu.encode import device_finalize as F
    G = 12
    cfg = EncoderConfig(width=1920, height=1080, qp=26, keyint=250,
                        search_range=8, deblock=True, aq_strength=1.0,
                        trellis=True, partitions=True)
    enc = TpuEncoder(cfg)
    enc.encode_gop_batch([fr1080[i % 4] for i in range(G + 1)])
    rows_dev = jnp.asarray(enc.pack_batch_rows([fr1080[k % 4] for k in range(G)]))
    hvs = np.zeros((G, F.MAX_HDR), np.uint32)
    hls = np.zeros((G, F.MAX_HDR), np.int32)
    hvs[:, 0], hls[:, 0] = 1, 8
    args = (jnp.asarray(hvs), jnp.asarray(hls))
    bucket = getattr(enc, "_bucket_words", 1 << 13)

    def run_batch(ref):
        return F.encode_pgop_packed(
            rows_dev, *ref, enc.qp, enc.qpc, *args, cfg.search_range,
            cfg.subpel, bucket, cfg.me_backend, cfg.deblock,
            cfg.deblock_alpha, cfg.deblock_beta, cfg.aq_strength,
            enc.pps.chroma_qp_index_offset, cfg.trellis, enc.partitions)

    out = run_batch(enc.ref)
    np.asarray(out[1])
    acc = out[2:5]
    t0 = time.perf_counter()
    for _ in range(4):
        out = run_batch(acc)
        acc = out[2:5]
    np.asarray(out[1])
    device_fps = 4 * G / (time.perf_counter() - t0)

    # ---- config 4: 1080p decode (device fast path) ----
    from x264vfw_tpu.decode.decoder import H264Decoder
    cfg_d = EncoderConfig(width=1920, height=1080, qp=26, keyint=250,
                          search_range=8, deblock=True)
    enc_d = TpuEncoder(cfg_d)
    annexb = enc_d.headers()
    for i in range(12):
        annexb += enc_d.encode_frame(*fr1080[i % 4])
    H264Decoder(use_device=True).decode(annexb)   # warm (compile)
    t0 = time.perf_counter()
    dec = H264Decoder(use_device=True)
    out_frames = dec.decode(annexb)
    decode_fps = len(out_frames) / (time.perf_counter() - t0)
    configs.append({"name": "1080p_decode_device",
                    "fps": round(decode_fps, 2),
                    "config": "CAVLC P stream, native C entropy parse + "
                              "device recon (decode/device_decode.py)"})

    # ---- config 5: 4K batch transcode (decode -> scale -> re-encode) ----
    from x264vfw_tpu.parallel.transcode import transcode
    fr4k = make_clip(3840, 2160, 2, seed=3)
    cfg_4k = EncoderConfig(width=3840, height=2160, qp=30, keyint=250,
                           search_range=8)
    enc4k = TpuEncoder(cfg_4k)
    src = enc4k.headers()
    n4k = 8
    for i in range(n4k):
        src += enc4k.encode_frame(*fr4k[i % 2])
    try:
        transcode(src[:len(src)], 1920, 1080)          # warm (compile)
        t0 = time.perf_counter()
        transcode(src, 1920, 1080)
        tc_fps = n4k / (time.perf_counter() - t0)
        configs.append({"name": "4k_transcode_to_1080p",
                        "fps": round(tc_fps, 2),
                        "config": "4K CAVLC decode -> MXU scaler -> 1080p "
                                  "re-encode (parallel/transcode.py)"})
    except Exception as e:  # pragma: no cover - keep the bench honest
        configs.append({"name": "4k_transcode_to_1080p", "fps": 0.0,
                        "error": str(e)[:120]})

    print(json.dumps({
        "metric": "1080p_encode_fps_per_chip",
        "value": round(headline, 2),
        "unit": "fps",
        "vs_baseline": round(headline / 300.0, 4),
        "device_fps": round(device_fps, 2),
        "device_fps_config": "batched CAVLC device pipeline, deblock+aq+"
                             "trellis+partitions qp26 merange8 G12, frames "
                             "pre-staged on device (capacity, not product "
                             "path)",
        "pass2_fps": round(pass2_fps, 2),
        "configs": configs,
    }))


if __name__ == "__main__":
    try:
        main()
    except BaseException as e:  # always leave ONE parseable JSON line
        import traceback
        traceback.print_exc()
        print(json.dumps({
            "metric": "1080p_encode_fps_per_chip", "value": 0.0,
            "unit": "fps", "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}"[:200]}), flush=True)
        os._exit(0)
    # a wedged tunnel can also leave background threads that abort normal
    # teardown — flush and exit hard on success too
    import sys
    sys.stdout.flush()
    os._exit(0)
