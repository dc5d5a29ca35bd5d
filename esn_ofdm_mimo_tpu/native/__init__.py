"""Native (C++) host-side components, built lazily with g++ and loaded via
ctypes. TPU compute stays in XLA/Pallas; these are CPU-side oracles and
baselines (the reference's own native layer is third-party BLAS/pocketfft —
SURVEY.md §2 'Implementation language')."""

from .ldpc_ref import ldpc_bp_decode_ref, native_available  # noqa: F401
