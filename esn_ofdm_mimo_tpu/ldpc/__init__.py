"""LDPC codes: regular Gallager + quasi-cyclic + 38.212 NR construction,
encoders (incl. NR rate matching), batched BP decoders (XLA flooding /
fused Pallas kernel for QC codes / irregular lifted-graph BP for NR).

NR caveat (ADVICE r04 #1): `make_nr_ldpc`/`nr_encode` use a
STRUCTURE-EXACT SURROGATE base graph — spec-exact 38.212 machinery over
deterministic surrogate shift coefficients (Tables 5.3.2-2/-3 are not
available in this offline build). Codewords are valid for the surrogate
code but NOT interoperable with a standards 38.212 codec; see the
ldpc/nr.py module docstring and `NR_SURROGATE_CAVEAT`."""

from .code import (LdpcCode, make_regular_ldpc, make_qc_ldpc,  # noqa: F401
                   make_pyldpc_ldpc, make_code)
from .encode import ldpc_encode  # noqa: F401
from .decode import (ldpc_decode_bp, ldpc_decode_bp_counts,  # noqa: F401
                     llr_from_yobs)
from .nr import (make_nr_ldpc, nr_encode, nr_decode_bp,  # noqa: F401
                 nr_derate_llrs, nr_lifted_H,
                 NR_SURROGATE_CAVEAT, BG_TABLES_SOURCE,
                 basegraph_fingerprint)
