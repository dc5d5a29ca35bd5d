"""L3 learners: ESN engine, ELM, and the small deep-model zoo."""

from .esn import (  # noqa: F401
    EsnReservoir,
    EsnScale,
    init_reservoir,
    esn_fit,
    esn_predict,
    esn_states,
)
from .esn_mimo import (  # noqa: F401
    build_esn_io,
    train_mimo_esn,
    esn_detect_symbols,
)
