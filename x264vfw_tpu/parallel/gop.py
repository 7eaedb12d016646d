"""GOP-parallel device encoding over a mesh (multi-chip scale-out).

Closed GOPs (IDR-led) are independent, so a batch of GOP segments shards
over the device mesh with pure data parallelism — the analogue of x264's
frame threading (SURVEY.md §2d).  Each device runs the full per-frame
pipeline as a lax.scan over its GOP (carrying reference planes), and a
psum'd bit-budget statistic crosses the mesh so a global rate controller
can react (the distributed-RC collective).

Tested on the virtual CPU mesh (tests/test_multichip.py) and exercised by
__graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..encode.device import encode_i_frame_core, encode_p_frame_core


def encode_gop_device(frames_yuv: jnp.ndarray, qp, qpc, H: int, W: int,
                      rng: int = 4):
    """Encode one GOP on device: frame 0 as I, rest as P (scan).

    frames_yuv: (G, H*W*3//2) uint8 packed I420.
    Returns dict of per-frame syntax tensors (stacked over G) + final recon.
    """
    G = frames_yuv.shape[0]
    ys = H * W
    cs = ys // 4

    def unpack(row):
        sy = row[:ys].reshape(H, W).astype(jnp.int32)
        su = row[ys:ys + cs].reshape(H // 2, W // 2).astype(jnp.int32)
        sv = row[ys + cs:].reshape(H // 2, W // 2).astype(jnp.int32)
        return sy, su, sv

    sy0, su0, sv0 = unpack(frames_yuv[0])
    i_out = encode_i_frame_core(sy0, su0, sv0, qp, qpc)
    ref0 = (i_out["recon_y"], i_out["recon_u"], i_out["recon_v"])

    def step(ref, row):
        sy, su, sv = unpack(row)
        out = encode_p_frame_core(sy, su, sv, *ref, qp, qpc, rng)
        new_ref = (out["recon_y"], out["recon_u"], out["recon_v"])
        syntax = {k: v for k, v in out.items()
                  if k not in ("recon_y", "recon_u", "recon_v")}
        bits_proxy = jnp.abs(out["levels"]).sum()
        return new_ref, (syntax, bits_proxy)

    ref_fin, (p_syntax, bits) = jax.lax.scan(step, ref0, frames_yuv[1:])
    return {
        "i": {k: v for k, v in i_out.items()
              if k not in ("recon_y", "recon_u", "recon_v")},
        "p": p_syntax,
        "bits_proxy": bits.sum(),
        "final_recon_y": ref_fin[0],
    }


def encode_gops_sharded(gops: np.ndarray, qp: int, qpc: int, H: int, W: int,
                        mesh: Mesh | None = None, rng: int = 4):
    """Shard a (n_gops, G, H*W*3//2) uint8 batch over the mesh 'dp' axis.

    Returns (per-GOP syntax pytree, global bits_proxy psum) — syntax stays
    device-sharded; only the scalar rate statistic is replicated (ICI
    allreduce).
    """
    if mesh is None:
        devs = np.array(jax.devices())
        mesh = Mesh(devs, axis_names=("dp",))
    sharding = NamedSharding(mesh, P("dp"))
    gops = jax.device_put(jnp.asarray(gops), sharding)

    def per_gop(g):
        out = encode_gop_device(g, qp, qpc, H, W, rng)
        return out

    fn = jax.jit(jax.vmap(per_gop),
                 in_shardings=(sharding,),
                 out_shardings=None)
    out = fn(gops)
    total_bits = jnp.sum(out["bits_proxy"])  # global allreduce statistic
    return out, total_bits
