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

_LAZY_EXPORTS = {
    # Library inference surface (reference README.md:70-127).
    "Estimator": ("allophant_tpu.training.estimator", "Estimator"),
    "Batch": ("allophant_tpu.data.batch", "Batch"),
    "PhoneticAttributeIndexer": ("allophant_tpu.phonetics.features", "PhoneticAttributeIndexer"),
    "feature_decoders": ("allophant_tpu.predictions", "feature_decoders"),
    "Config": ("allophant_tpu.config", "Config"),
    "DatasetManager": ("allophant_tpu.training.run", "DatasetManager"),
}


def __getattr__(name):
    """Lazy top-level re-exports (keeps `import allophant_tpu` light for CLIs)."""
    target = _LAZY_EXPORTS.get(name)
    if target is None:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    import importlib

    return getattr(importlib.import_module(target[0]), target[1])
