from .rng import fold_key, block_keys  # noqa: F401
