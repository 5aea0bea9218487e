"""Bundled data files (dialect preferences, G2P replacement tables, default config)."""

from importlib import resources


def _resource(name: str):
    return resources.files(__name__) / name


DEFAULT_CONFIG_FILE = "default_config.toml"
DEFAULT_CONFIG_PATH = str(_resource(DEFAULT_CONFIG_FILE))
DEFAULT_DIALECTS_PATH = _resource("default_dialects.json")
PHONEME_REPLACEMENTS_PATH = _resource("espeakng_phoneme_replacements.json")
# The Allophoible database is not bundled (it is large and released checkpoints embed
# their own copy); fresh preprocessing expects a downloaded copy at this path.
ALLOPHOIBLE_PATH = _resource("allophoible.csv")
