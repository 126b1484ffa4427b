from musicvae_tpu.utils.debug import debug_mode  # noqa: F401
from musicvae_tpu.utils.logging import MetricsLogger  # noqa: F401
