"""``python -m hmm_layer_tpu`` — see :mod:`hmm_layer_tpu.cli`."""

import sys

from .cli import main

sys.exit(main())
