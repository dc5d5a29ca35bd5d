"""L1 modem primitives and L2 channel models — pure jnp, vmap/jit friendly."""

from .qam import (  # noqa: F401
    qam_constellation,
    qam_bit_labels,
    bits_to_symbols,
    symbols_to_bits_hard,
    hard_demap_index,
)
from .ofdm import ofdm_modulate, ofdm_demodulate, add_cp, remove_cp  # noqa: F401
from .pa import rapp_pa  # noqa: F401
from .channel import (  # noqa: F401
    exp_pdp,
    draw_exp_pdp_taps,
    draw_cdlb_taps,
    draw_tdl_taps,
    draw_flat_awgn_tap,
    apply_fir_channel,
    taps_to_freq_response,
    awgn,
)
from .chanest import ls_comb_estimate, mmse_refine_td, estimate_channel  # noqa: F401
from .equalize import equalize_zf, equalize_mmse, equalize_persc  # noqa: F401
from .llr import qam_llrs_maxlog, est_sigma2_from_decision  # noqa: F401
from .analytics import channel_svd_metrics  # noqa: F401
