"""VAE model family (SURVEY §2.1 components 4–9)."""

from musicvae_tpu.models.latent import reparameterize, slerp  # noqa: F401
from musicvae_tpu.models.vae import (  # noqa: F401
    BarDecoder, PianoRollVAE, build_model, init_params,
)
