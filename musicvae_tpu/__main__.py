import sys

from musicvae_tpu.cli import main

sys.exit(main())
