"""Regular Gallager LDPC code: construction, encoder, batched BP decoder."""

from .code import LdpcCode, make_regular_ldpc  # noqa: F401
from .encode import ldpc_encode  # noqa: F401
from .decode import ldpc_decode_bp, llr_from_yobs  # noqa: F401
