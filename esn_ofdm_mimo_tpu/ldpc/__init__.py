"""LDPC codes: regular Gallager + quasi-cyclic construction, encoder,
batched BP decoder (XLA flooding / fused Pallas kernel for QC codes)."""

from .code import (LdpcCode, make_regular_ldpc, make_qc_ldpc,  # noqa: F401
                   make_pyldpc_ldpc, make_code)
from .encode import ldpc_encode  # noqa: F401
from .decode import (ldpc_decode_bp, ldpc_decode_bp_counts,  # noqa: F401
                     llr_from_yobs)
