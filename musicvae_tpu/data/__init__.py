from musicvae_tpu.data.dataset import PianoRollDataset  # noqa: F401
from musicvae_tpu.data.synthetic import synth_corpus, synth_midi  # noqa: F401
