"""musicvae_tpu — a TPU-native (JAX/XLA/Pallas/pjit) music-VAE framework.

A ground-up rebuild of the capabilities of the PyTorch research repo
``KMU-AELAB-MusicProject/MusicGeneration_VAE-torch`` (see SURVEY.md):

- MIDI → piano-roll tensorization (SMF parse on host, jit-able on-device
  quantize/chunk/crop stage) — :mod:`musicvae_tpu.midi`
- piano-roll VAE model family (conv bar-VAE, GRU sequence-VAE, hierarchical
  bar→phrase VAE, chord/key-conditional VAE) — :mod:`musicvae_tpu.models`
- masked piano-roll BCE + KL-annealed ELBO, with a fused Pallas TPU kernel —
  :mod:`musicvae_tpu.ops`
- jitted/donated train step with mesh sharding — :mod:`musicvae_tpu.train`,
  :mod:`musicvae_tpu.parallel`
- fully on-device bar-by-bar autoregressive generation via ``lax.scan``
  (prev-bar conditioning → latent sample → decode → binarize), latent
  interpolation sweeps — :mod:`musicvae_tpu.generate`
- Orbax checkpointing + torch state-dict converter —
  :mod:`musicvae_tpu.checkpoints`

The reference tree at /root/reference was unreadable (empty mount, SURVEY.md
§0.1); behavior follows the BASELINE.json contract, cross-checked against a
torch-CPU oracle in tests/oracle/.
"""

__version__ = "0.1.0"

from musicvae_tpu.config import (  # noqa: F401
    Config,
    C1_CONV_BAR,
    C2_GRU_4BAR,
    C3_HIER_16BAR,
    C4_COND,
    C5_GEN_SWEEP,
    get_config,
)
