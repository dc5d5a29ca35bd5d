from .presets import PRESETS, get_preset  # noqa: F401
