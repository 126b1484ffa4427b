from musicvae_tpu.generate.sampler import (  # noqa: F401
    bars_to_midi, latent_path, make_generate_fn, reconstruct_fn,
)
