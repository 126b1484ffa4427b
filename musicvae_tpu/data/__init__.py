from musicvae_tpu.data.dataset import (HostLocalBatches,  # noqa: F401
                                       PianoRollDataset)
from musicvae_tpu.data.synthetic import synth_corpus, synth_midi  # noqa: F401
