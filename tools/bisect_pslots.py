"""Time one encode_p_slots config (args: deblock aq trellis pack rng)."""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from tools.tputime import timeit
from x264vfw_tpu.encode import device_finalize as F


def main():
    db = sys.argv[1] == "1"
    aq = float(sys.argv[2])
    tr = sys.argv[3] == "1"
    pk = sys.argv[4] == "1"
    rng = int(sys.argv[5]) if len(sys.argv) > 5 else 8
    W, H = 1920, 1088
    r = np.random.default_rng(0)
    base = (64 + 64 * np.sin(np.arange(W) / 31.0))[None, :] \
        + (48 * np.cos(np.arange(H) / 23.0))[:, None]
    sy = np.clip(base + r.integers(-10, 11, (H, W)), 0, 255).astype(np.uint8)
    ry = np.clip(base + r.integers(-10, 11, (H, W)), 0, 255).astype(np.int32)
    su8 = np.full((H // 2, W // 2), 128, np.uint8)
    src_row = jnp.asarray(np.concatenate([sy.ravel(), su8.ravel(), su8.ravel()]))
    ry_d = jnp.asarray(ry)
    ru_d = jnp.asarray(su8.astype(np.int32))
    hv = jnp.zeros((F.MAX_HDR,), jnp.uint32)
    hl = jnp.zeros((F.MAX_HDR,), jnp.int32)
    qp, qpc = 26, 26

    @jax.jit
    def step(c):
        s = src_row + (c * 0).astype(jnp.uint8)
        v, l, nb, ryo, ruo, rvo, mv = F.encode_p_slots(
            s, ry_d, ru_d, ru_d, qp, qpc, hv, hl, rng, True, "auto",
            db, 0, 0, aq, 0, tr)
        if pk:
            d, nb2 = F.pack_phase(v, l, 1 << 14)
            return d.astype(jnp.int32).sum() + nb2
        return l.sum() + nb

    ms = timeit(lambda: (step, jnp.int32(0)))
    print(f"db={db} aq={aq} tr={tr} pack={pk} rng={rng}: "
          f"{ms:8.2f} ms ({1000/ms:6.1f} fps)", flush=True)


if __name__ == "__main__":
    main()
