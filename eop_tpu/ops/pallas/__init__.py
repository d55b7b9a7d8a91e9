"""Pallas TPU kernels for the small-channel conv stages.

XLA's conv emitters reach only ~1-2 TFLOP/s on the early backbone stages
(C=32/64 at 640->160 px — channels underfill the 128-lane MXU tile; see
BASELINE.md round-2 attribution).  These kernels re-express those convs as
space-to-depth phase matmuls that keep the MXU lanes full.
"""

from .conv_small_c import phase_conv, PHASE_CONV_SUPPORTED  # noqa: F401
