"""Bundled data files (dialect preferences, G2P replacement tables, default config)."""

from importlib import resources

from allophant_tpu import package_data

RESOURCES = resources.files(package_data)

DEFAULT_CONFIG_FILE = "default_config.toml"
DEFAULT_CONFIG_PATH = str(RESOURCES / DEFAULT_CONFIG_FILE)
# The Allophoible database is not bundled (it is large and released checkpoints embed
# their own copy); fresh preprocessing expects a downloaded copy at this path.
ALLOPHOIBLE_PATH = RESOURCES / "allophoible.csv"
DEFAULT_DIALECTS_PATH = RESOURCES / "default_dialects.json"
PHONEME_REPLACEMENTS_PATH = RESOURCES / "espeakng_phoneme_replacements.json"
