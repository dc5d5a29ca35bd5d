"""LDPC codes: regular Gallager + quasi-cyclic + 38.212 NR construction,
encoders (incl. NR rate matching), batched BP decoders (XLA flooding /
fused Pallas kernel for QC codes / irregular lifted-graph BP for NR)."""

from .code import (LdpcCode, make_regular_ldpc, make_qc_ldpc,  # noqa: F401
                   make_pyldpc_ldpc, make_code)
from .encode import ldpc_encode  # noqa: F401
from .decode import (ldpc_decode_bp, ldpc_decode_bp_counts,  # noqa: F401
                     llr_from_yobs)
from .nr import (make_nr_ldpc, nr_encode, nr_decode_bp,  # noqa: F401
                 nr_derate_llrs, nr_lifted_H)
