"""x264vfw_tpu — a TPU-native H.264 video codec framework.

Built from scratch with the capability surface of the x264vfw reference
(VfW wrapper + x264 encoder + FFmpeg decoder + muxers), re-designed
TPU-first: JAX/XLA/Pallas device pipeline for the per-macroblock compute,
numpy-vectorized host finalization for entropy coding, native muxers.

Blueprint: /root/repo/SURVEY.md
"""

__version__ = "0.1.0"
