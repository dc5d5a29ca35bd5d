from .mesh import trials_mesh, device_count  # noqa: F401
from .montecarlo import run_nbf_curve, CurveResult  # noqa: F401
from .seqshard import sharded_fir, overlap_save_scan  # noqa: F401
