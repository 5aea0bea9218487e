"""allophant-tpu: a TPU-native (JAX/XLA/Pallas) multilingual phoneme recognition framework.

Re-designed from scratch with the capabilities of the PyTorch/Rust reference
``kgnlp/allophant`` (multilingual phoneme recognition with articulatory attribute
classifiers and zero-shot inventory transfer; see /root/reference). The compute path is
JAX (jit/pjit/Pallas); the runtime around it (IPA segmentation, edit-distance scoring)
is native C++.
"""

import logging

__version__ = "0.1.0"

MAIN_LOGGER = logging.getLogger("allophant_tpu")
MAIN_LOGGER.setLevel(logging.ERROR)
