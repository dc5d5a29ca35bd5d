from .mesh import trials_mesh, device_count  # noqa: F401
from .montecarlo import run_nbf_curve, CurveResult  # noqa: F401
