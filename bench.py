"""Benchmark: 1080p encode throughput per TPU chip (BASELINE.json config).

Runs the full encoder (device pipeline + host entropy + bitstream assembly)
on the real TPU and prints one JSON line.  vs_baseline is measured fps over
the 300 fps/chip north-star target from BASELINE.md.
"""

from __future__ import annotations

import json
import sys
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


def main():
    import jax
    import os
    # per-host cache dir: XLA AOT artifacts are machine-specific (SIGILL
    # risk when another host's cache is loaded)
    import hashlib
    import platform
    host = hashlib.sha1((platform.processor() + platform.machine()
                         + platform.node()).encode()).hexdigest()[:10]
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache", f"tpu-{host}"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from x264vfw_tpu.encode.ref_encoder import EncoderConfig
    from x264vfw_tpu.encode.tpu_encoder import TpuEncoder

    W, H = 1920, 1080
    n_frames = 48
    frames = make_clip(W, H, 4)
    G = 12  # frames per device dispatch (batch mode amortizes host latency)

    enc = TpuEncoder(EncoderConfig(width=W, height=H, qp=26, keyint=250,
                                   search_range=8))
    # warmup: compile the I pipeline and the batched P pipeline at the exact
    # timed shapes (incl. the adapted pack bucket)
    enc.encode_gop_batch([frames[i % len(frames)] for i in range(G + 1)])
    enc.encode_gop_batch([frames[i % len(frames)] for i in range(G)])

    t0 = time.perf_counter()
    total_bytes = 0
    for i in range(0, n_frames, G):
        batch = [frames[(i + k) % len(frames)] for k in range(min(G, n_frames - i))]
        total_bytes += sum(len(a) for a in enc.encode_gop_batch(batch))
    dt = time.perf_counter() - t0
    fps = n_frames / dt

    # context: the harness feeds the chip over a tunnel whose host->device
    # bandwidth fluctuates and bounds end-to-end fps (raw 1080p ingest is
    # 3.11 MB/frame); measure it so the fps number can be interpreted
    import numpy as _np
    import jax.numpy as _jnp
    probe = _np.zeros(16 << 20, _np.uint8)
    tb = time.perf_counter()
    _jnp.asarray(probe).block_until_ready()
    link_mbps = 16.0 / (time.perf_counter() - tb)

    print(json.dumps({
        "metric": "1080p_encode_fps_per_chip",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 300.0, 4),
        "ingest_link_MBps": round(link_mbps, 1),
        "ingest_bound_fps": round(link_mbps / 3.11, 1),
        "kbps": round(total_bytes * 8 * 25 / n_frames / 1000.0, 0),
    }))


if __name__ == "__main__":
    main()
