"""System-model-1 frontend: a JAX re-design of the reference's Sionna
OFDM chain (esn_ofdm_mimo_via_cdl.py / esn_via_cdl_all_model.py /
system_model_01.ipynb) so the classifier zoo trains at the reference's
exact operating point.

Components (reference file:line in each module's docstring):
  grid  — 5G-style resource grid (guards, DC null, kronecker pilots),
          grid mapper, Eb/N0 -> noise-variance conversion
  cdl   — TR 38.901 CDL-B *spatial* channel (clustered rays, dual-pol
          cross arrays, 38.901 element pattern, Doppler) + frequency-
          domain channel evaluation
  rx    — LS channel estimation with nearest-neighbour interpolation and
          per-RE unbiased LMMSE MIMO equalization
"""
from . import cdl, grid, rx  # noqa: F401
